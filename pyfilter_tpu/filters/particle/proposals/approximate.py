"""Gaussian-approximate proposals for the Gaussian particle filter.

Reference: pyfilter/filters/particle/proposals/approximate.py — the GPF variants
collapse the particle cloud into a moment-matched Gaussian predictive before
proposing.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ....utils import get_mean_and_variance
from .base import Proposal
from .linear import LinearGaussianObservations, _check_linear_model
from .linearized import Linearized
from .utils import find_mode, find_optimal_density


@dataclasses.dataclass(frozen=True)
class GaussianProposal(Proposal):
    """Sample from the moment-matched Gaussian approximation of the predictive
    density; weight by the observation density (reference approximate.py:12-34)."""

    def sample_and_weight(self, key, model, y, prediction):
        k_prop, k_sample = jax.random.split(key)
        predictive = prediction.get_predictive_density(model, key=k_prop, approximate=True)

        x = prediction.get_timeseries_state()
        x_vals = predictive.expand(x.batch_shape).sample(k_sample)
        x_result = x.propagate_from(values=x_vals)

        w = model.build_density(x_result).log_prob(y)
        return x_result, w


def _collapsed_mean_state(prediction, event_ndim):
    """Weighted cloud moments as a single pseudo-particle with a leading axis of
    1 (reference approximate.py:43-50)."""
    x = prediction.get_timeseries_state()
    mean, var = get_mean_and_variance(
        x.value, prediction.normalized_weights, event_ndim=event_ndim
    )
    return x.copy(values=mean[None]), var[None]


@dataclasses.dataclass(frozen=True)
class GaussianLinearized(Linearized):
    """:class:`Linearized` on the collapsed (moment-matched) predictive
    (reference approximate.py:37-66)."""

    def sample_and_weight(self, key, model, y, prediction):
        k_prop, k_sample = jax.random.split(key)
        ev = model.hidden.event_ndim

        mean_state, predictive_variance = _collapsed_mean_state(prediction, ev)
        mean, std = model.hidden.mean_scale(mean_state)
        std = jnp.sqrt(predictive_variance + jnp.asarray(std) ** 2.0)

        predictive = prediction.get_predictive_density(model, key=k_prop, approximate=True)

        kernel = find_mode(
            model,
            mean_state,
            y,
            init_x=mean,
            init_std=std,
            num_steps=self.n_steps,
            alpha=self.alpha,
            use_hessian=self.use_second_order,
            x_dist=predictive,
        )

        x = prediction.get_timeseries_state()
        x_result = x.propagate_from(values=kernel.expand(x.batch_shape).sample(k_sample))
        return x_result, self._weight_with_kernel(model, y, predictive, x_result, kernel)


@dataclasses.dataclass(frozen=True)
class GaussianLinear(LinearGaussianObservations):
    """:class:`LinearGaussianObservations` on the collapsed predictive
    (reference approximate.py:70-104)."""

    def sample_and_weight(self, key, model, y, prediction):
        _check_linear_model(model)
        k_prop, k_sample = jax.random.split(key)
        ev = model.hidden.event_ndim

        mean_state, predictive_variance = _collapsed_mean_state(prediction, ev)
        mean, scale = model.hidden.mean_scale(mean_state)
        h_var_inv = (jnp.asarray(scale) ** 2.0 + predictive_variance) ** -1.0

        a, b, s = model.parameters
        o_var_inv = jnp.asarray(s) ** -2.0

        kernel = find_optimal_density(
            y - b,
            mean,
            h_var_inv,
            o_var_inv,
            a,
            model.hidden.event_ndim,
            len(model.event_shape),
        )

        x = prediction.get_timeseries_state()
        kernel = kernel.expand(x.batch_shape)
        x_result = x.propagate_from(values=kernel.sample(k_sample))

        predictive = prediction.get_predictive_density(model, key=k_prop, approximate=True)
        return x_result, self._weight_with_kernel(model, y, predictive, x_result, kernel)
