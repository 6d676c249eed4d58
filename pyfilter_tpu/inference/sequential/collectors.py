"""Collector callbacks appending derived series to the algorithm state.

Re-design of the reference's ``pyfilter/inference/sequential/collectors.py``.
Collected series live in ``state.collected[name]`` (host lists of per-step
arrays) instead of tensor-tuple deques.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ...distributions import TransformedDistribution
from ..state import SequentialAlgorithmState

__all__ = ["Collector", "MeanCollector", "Standardizer", "ParameterPosterior"]


class Collector:
    """Callback registered on :meth:`SequentialParticleAlgorithm.step`
    (reference collectors.py:14-45)."""

    def __init__(self, name: str, f: Callable):
        self._name = name
        self._f = f

    @property
    def name(self) -> str:
        return self._name

    def __call__(self, algorithm, y, state: SequentialAlgorithmState):
        store = getattr(state, "collected", None)
        if store is None:
            store = {}
            state.collected = store
        store.setdefault(self._name, []).append(self._f(algorithm, y, state))


class MeanCollector(Collector):
    """Parameter-weighted filter means (reference collectors.py:48-60)."""

    @staticmethod
    def _mean(algorithm, y, state: SequentialAlgorithmState):
        latest_means = state.filter_state.latest_state.mean
        w = state.normalized_weights()
        return jnp.tensordot(w, latest_means, axes=([0], [0]))

    def __init__(self):
        super().__init__(name="filter_means", f=self._mean)


class Standardizer(Collector):
    """Inverse-transform residuals of the observation density
    (reference collectors.py:63-89); requires a ``TransformedDistribution``
    observation."""

    def _fun(self, algorithm, y, state: SequentialAlgorithmState):
        latest = state.filter_state.latest_state
        dist = algorithm.filter.model.build_density(latest.x)
        if not isinstance(dist, TransformedDistribution):
            raise NotImplementedError(
                f"Can't standardize for '{type(dist).__name__}'"
            )
        y_std = dist.bijector.inverse(jnp.asarray(y))

        # collapse particles then lanes by their respective weights
        w_p = latest.normalized_weights()
        resid = jnp.sum(w_p * y_std, axis=0)
        return jnp.tensordot(state.normalized_weights(), resid, axes=([0], [0]))

    def __init__(self):
        super().__init__(name="standardized", f=self._fun)


class ParameterPosterior(Collector):
    """Weighted first moment of the parameter posterior
    (reference collectors.py:92-111)."""

    def _fun(self, algorithm, y, state: SequentialAlgorithmState):
        ctx = algorithm.context
        stacked = ctx.stack_parameters(constrained=self._constrained)
        return state.normalized_weights() @ stacked

    def __init__(self, constrained: bool = True):
        super().__init__(name="parameter_means", f=self._fun)
        self._constrained = constrained
