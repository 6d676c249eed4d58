"""Multivariate normal distribution.

Equivalent of ``torch.distributions.MultivariateNormal`` as consumed by the
reference (proposals/utils.py:219-267, inference/utils.py:42-76). Canonical
parameterization is ``(loc, scale_tril)``; covariance or precision inputs are
converted once at construction via Cholesky.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import constraints
from .base import Distribution

_LOG_2PI = math.log(2.0 * math.pi)


def robust_cholesky(cov: jax.Array, jitter: float | None = None) -> jax.Array:
    """Cholesky with a diagonal-sqrt fallback for non-PD inputs.

    Mirrors the reference's ``cholesky_ex`` + fallback-to-diagonal behavior
    (inference/utils.py:50-55) in a branchless, jit-safe way.
    """
    d = cov.shape[-1]
    if jitter is None:
        jitter = 1e-6 * float(jnp.finfo(cov.dtype).eps) ** 0  # small absolute jitter
        jitter = 1e-9
    eye = jnp.eye(d, dtype=cov.dtype)
    chol = jnp.linalg.cholesky(cov + jitter * eye)
    bad = jnp.any(jnp.isnan(chol), axis=(-2, -1), keepdims=True)
    diag_fallback = jnp.sqrt(jnp.maximum(cov * eye, 0.0) * eye + jitter * eye)
    return jnp.where(bad, diag_fallback, chol)


class MultivariateNormal(Distribution):
    arg_names = ("loc", "scale_tril")
    arg_constraints = {"loc": constraints.real_vector, "scale_tril": constraints.lower_cholesky}

    def __init__(self, loc, scale_tril=None, covariance_matrix=None, precision_matrix=None):
        given = sum(x is not None for x in (scale_tril, covariance_matrix, precision_matrix))
        if given != 1:
            raise ValueError("exactly one of scale_tril / covariance_matrix / precision_matrix")
        loc = jnp.asarray(loc)
        if covariance_matrix is not None:
            scale_tril = jnp.linalg.cholesky(covariance_matrix)
        elif precision_matrix is not None:
            prec_chol = jnp.linalg.cholesky(precision_matrix)
            d = prec_chol.shape[-1]
            eye = jnp.eye(d, dtype=prec_chol.dtype)
            # cov = P^{-1}; scale_tril = chol(cov)
            cov = jax.scipy.linalg.cho_solve((prec_chol, True), jnp.broadcast_to(eye, prec_chol.shape))
            scale_tril = jnp.linalg.cholesky(cov)
        self.loc = loc
        self.scale_tril = jnp.asarray(scale_tril)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.loc)[:-1], jnp.shape(self.scale_tril)[:-2])

    @property
    def event_shape(self):
        return jnp.shape(self.loc)[-1:]

    @property
    def support(self):
        return constraints.real_vector

    @property
    def covariance_matrix(self):
        return self.scale_tril @ jnp.swapaxes(self.scale_tril, -1, -2)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        dtype = jnp.result_type(self.loc, self.scale_tril, 0.0)
        eps = jax.random.normal(key, shape, dtype=dtype)
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)

    def log_prob(self, value):
        d = self.event_shape[0]
        diff = value - self.loc
        # Solve L z = diff  (lower triangular)
        z = jax.scipy.linalg.solve_triangular(
            jnp.broadcast_to(self.scale_tril, jnp.shape(diff)[:-1] + self.scale_tril.shape[-2:]),
            diff[..., None],
            lower=True,
        )[..., 0]
        maha = jnp.sum(jnp.square(z), axis=-1)
        log_det = jnp.sum(jnp.log(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)), axis=-1)
        return -0.5 * (maha + d * _LOG_2PI) - log_det

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape + self.event_shape)

    @property
    def variance(self):
        var = jnp.sum(jnp.square(self.scale_tril), axis=-1)
        return jnp.broadcast_to(var, self.batch_shape + self.event_shape)

    def entropy(self):
        d = self.event_shape[0]
        log_det = jnp.sum(jnp.log(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)), axis=-1)
        return 0.5 * d * (1.0 + _LOG_2PI) + log_det
