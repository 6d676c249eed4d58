"""Inference utilities: weighted MVN fitting and quasi-random MVN sampling.

Re-design of the reference's ``pyfilter/inference/utils.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..distributions import MultivariateNormal, Normal, robust_cholesky
from .qmc import EngineContainer


def calc_mean_chol(x: jax.Array, w: jax.Array) -> tuple:
    """Weighted mean and Cholesky factor of the covariance of samples ``x``
    ``(B, D)`` with normalized weights ``w`` ``(B,)``; falls back to the
    diagonal sqrt when the covariance is not PD (reference utils.py:42-55)."""
    mean = w @ x
    centered = x - mean
    cov = (w[:, None] * centered).T @ centered
    return mean, robust_cholesky(cov)


class QuasiMultivariateNormal(MultivariateNormal):
    """MVN sampled by inversion of scrambled-Sobol uniforms
    (reference utils.py:16-38). The engine lives host-side; ``key`` is ignored."""

    def __init__(self, quasi_engine: EngineContainer, loc, scale_tril=None, **kwargs):
        super().__init__(loc, scale_tril=scale_tril, **kwargs)
        self.quasi_engine = quasi_engine

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        probs = self.quasi_engine.sample(shape[:-1]).astype(self.loc.dtype)
        eps = Normal(jnp.zeros(shape, self.loc.dtype), 1.0).icdf(probs)
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)


def construct_mvn(
    x: jax.Array, w: jax.Array, scale: float = 1.0, quasi_engine: EngineContainer = None
) -> MultivariateNormal:
    """MVN fitted to weighted samples with a Cholesky scaling factor
    (reference utils.py:58-76)."""
    mean, chol = calc_mean_chol(x, w)
    scale_tril = scale * chol
    if quasi_engine is None:
        return MultivariateNormal(mean, scale_tril=scale_tril)
    return QuasiMultivariateNormal(quasi_engine, mean, scale_tril=scale_tril)
