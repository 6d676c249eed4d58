"""Local linearization of a nonlinear observation mean.

Re-design of the reference's ``local_linearization.py`` — which is permanently
disabled (``raise NotImplementedError`` in ``__init__``,
local_linearization.py:40; SURVEY.md §8). This implementation works, and the
derivative of the observation mean is optional: when omitted it is computed by
forward-mode autodiff (per-particle JVP columns — no user-supplied
``linearized_f`` needed).

Model contract: observation ``Y_t = f(X_t, *params) + s V_t`` with Gaussian
noise, where ``s = model.parameters[s_index]``; the hidden process is affine.
The observation mean is linearized around the propagated hidden mean
:math:`\\mu_t`:

.. math::
    f(x) \\approx f(\\mu) + f'(\\mu) (x - \\mu) = b + A x,

which reduces to the closed-form optimal proposal of
:class:`LinearGaussianObservations`. The importance weight uses the *exact*
(nonlinear) observation density, so the filter stays unbiased.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .base import Proposal
from .utils import find_optimal_density, linear_marginal_density


def _per_particle_jacobian(fn: Callable, x: jax.Array, hidden_ev: int, obs_ev: int) -> jax.Array:
    """d f / d x per particle via ``d_h`` forward-mode JVPs (valid because the
    observation mean of particle ``i`` depends only on ``x_i``)."""
    if hidden_ev == 0:
        _, jvp = jax.jvp(fn, (x,), (jnp.ones_like(x),))
        return jvp  # scalar->scalar (or scalar->vector) derivative per particle

    d = x.shape[-1]
    cols = []
    for j in range(d):
        tangent = jnp.zeros_like(x).at[..., j].set(1.0)
        _, jvp = jax.jvp(fn, (x,), (tangent,))
        cols.append(jvp)
    return jnp.stack(cols, axis=-1)  # (..., [d_o,] d_h)


@dataclasses.dataclass(frozen=True)
class LocalLinearization(Proposal):
    """First-order linearization of the observation mean ``f`` around the
    propagated hidden mean, reusing the optimal linear-Gaussian proposal."""

    f: Callable = None
    linearized_f: Optional[Callable] = None
    s_index: int = -1

    def __post_init__(self):
        if self.f is None:
            raise ValueError("LocalLinearization requires the observation mean function f")

    def _linearize(self, model, x):
        """Returns ``(mean, scale, a, offset)`` — hidden step moments plus the
        per-particle linearization ``y ~ N(offset + a x, s)``."""
        mean, scale = model.hidden.mean_scale(x)
        mu_state = x.propagate_from(values=mean)
        params = model.parameters

        if self.linearized_f is not None:
            a = self.linearized_f(mu_state, *params)
        else:
            a = _per_particle_jacobian(
                lambda v: self.f(mu_state.copy(values=v), *params),
                mean,
                model.hidden.event_ndim,
                len(model.event_shape),
            )

        hidden_1d = model.hidden.event_ndim == 0
        if hidden_1d:
            prod = a * mean
        else:
            prod = jnp.einsum("...ij,...j->...i", jnp.atleast_2d(a), mean) if jnp.ndim(a) >= 2 else a * mean
        offset = self.f(mu_state, *params) - prod
        return mean, scale, a, offset

    def sample_and_weight(self, key, model, y, prediction):
        x = prediction.get_timeseries_state()
        mean, scale, a, offset = self._linearize(model, x)
        x_dist = model.hidden.build_density(x)

        s = jnp.asarray(model.parameters[self.s_index])
        kernel = find_optimal_density(
            y - offset,
            mean,
            jnp.asarray(scale) ** -2.0,
            s**-2.0,
            a,
            model.hidden.event_ndim,
            len(model.event_shape),
        )
        x_result = x.propagate_from(values=kernel.sample(key))
        # exact nonlinear observation density in the weight
        return x_result, self._weight_with_kernel(model, y, x_dist, x_result, kernel)

    def pre_weight(self, model, y, x):
        mean, scale, a, offset = self._linearize(model, x)
        s = jnp.asarray(model.parameters[self.s_index])
        kernel = linear_marginal_density(
            mean,
            jnp.asarray(scale) ** 2.0,
            s**2.0,
            a,
            offset,
            model.hidden.event_ndim,
            len(model.event_shape),
        )
        return kernel.log_prob(y)
