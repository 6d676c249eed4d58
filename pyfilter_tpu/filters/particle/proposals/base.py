"""Proposal distribution base class.

JAX re-design of the reference's ``pyfilter/filters/particle/proposals/base.py``.
Proposals here are *stateless, hashable config objects* — they never hold a
model reference (the reference's ``set_model`` mutability, base.py:32-42, is
gone); the model is passed explicitly to every call so proposals ride through
``jit``/``vmap``/``scan`` as static aux data.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax

from ....timeseries import AffineProcess, TimeseriesState
from ...state import ParticleFilterPrediction


def _affine_pre_weight_state(hidden, state: TimeseriesState) -> TimeseriesState:
    """Propagate to the conditional mean (reference pre_weight_funcs.py:10-12)."""
    loc, _ = hidden.mean_scale(state)
    return state.propagate_from(values=loc)


def get_pre_weight_func(func, hidden) -> Callable:
    """Resolve the APF pre-weighting state function (reference
    pre_weight_funcs.py:19-33): explicit override, else affine default."""
    if func is not None:
        return func
    if isinstance(hidden, AffineProcess) or hasattr(hidden, "mean_scale"):
        return _affine_pre_weight_state
    raise TypeError(
        "no pre-defined pre-weight function for this process; pass pre_weight_func"
    )


@dataclasses.dataclass(frozen=True)
class Proposal:
    """Base proposal. Subclasses implement :meth:`sample_and_weight`.

    ``pre_weight_func(hidden, state) -> TimeseriesState`` customizes the APF
    pre-weighting state (reference base.py:68-84).
    """

    pre_weight_func: Optional[Callable] = dataclasses.field(default=None, kw_only=True)

    def sample_and_weight(
        self, key: jax.Array, model, y: jax.Array, prediction: ParticleFilterPrediction
    ) -> Tuple[TimeseriesState, jax.Array]:
        """Sample new particles and their incremental log-weights."""
        raise NotImplementedError

    def pre_weight(self, model, y: jax.Array, x: TimeseriesState) -> jax.Array:
        """APF pre-weights :math:`\\log p(y_t | E[x_t | x_{t-1}])`
        (reference base.py:68-84)."""
        func = get_pre_weight_func(self.pre_weight_func, model.hidden)
        new_state = func(model.hidden, x)
        return model.build_density(new_state).log_prob(y)

    def _weight_with_kernel(self, model, y, x_dist, x_new: TimeseriesState, kernel) -> jax.Array:
        """Importance weight ``log p(y|x') + log p(x'|x) - log q(x')``
        (reference base.py:45-50)."""
        y_dist = model.build_density(x_new)
        return y_dist.log_prob(y) + x_dist.log_prob(x_new.value) - kernel.log_prob(x_new.value)

    def copy(self) -> "Proposal":
        return self
