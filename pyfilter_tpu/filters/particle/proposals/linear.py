"""Optimal proposal for linear-Gaussian observations.

Reference: pyfilter/filters/particle/proposals/linear.py — closed-form optimal
proposal when ``Y = b + A X + s V`` over an affine hidden process.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .base import Proposal
from .utils import find_optimal_density, linear_marginal_density


def _check_linear_model(model):
    if not hasattr(model.hidden, "mean_scale"):
        raise ValueError("LinearGaussianObservations requires an affine hidden process")
    if len(model.parameters) != 3:
        raise ValueError(
            "LinearGaussianObservations requires a LinearStateSpaceModel with (a, b, s) parameters"
        )


@dataclasses.dataclass(frozen=True)
class LinearGaussianObservations(Proposal):
    """Exact conditionally-optimal proposal (reference linear.py:38-55):

    propagate mean/scale of the affine hidden step, combine with the linear
    observation in precision form, sample the posterior kernel, and weight with
    ``log p(y|x') + log p(x'|x) - log q(x')``.
    """

    def sample_and_weight(self, key, model, y, prediction):
        _check_linear_model(model)
        x = prediction.get_timeseries_state()

        mean, scale = model.hidden.mean_scale(x)
        x_dist = model.hidden.build_density(x)

        h_var_inv = jnp.asarray(scale) ** -2.0

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
        x_result = x.propagate_from(values=kernel.sample(key))
        return x_result, self._weight_with_kernel(model, y, x_dist, x_result, kernel)

    def pre_weight(self, model, y, x):
        """Analytic APF pre-weight: the exact marginal ``p(y_t | x_{t-1})``
        (reference linear.py:57-89)."""
        _check_linear_model(model)
        _, h_scale = model.hidden.mean_scale(x)
        h_var = jnp.asarray(h_scale) ** 2.0

        a, b, s = model.parameters
        o_var = jnp.asarray(s) ** 2.0

        kernel = linear_marginal_density(
            x.value,
            h_var,
            o_var,
            a,
            b,
            model.hidden.event_ndim,
            len(model.event_shape),
        )
        return kernel.log_prob(y)
