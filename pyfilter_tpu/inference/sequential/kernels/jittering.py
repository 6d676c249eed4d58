"""KDE jittering kernels for online parameter rejuvenation.

Re-design of the reference's ``pyfilter/inference/sequential/kernels/jittering.py``
— Gaussian KDE moves on the stacked unconstrained parameters, with the
bandwidth ``1.59 * ESS^{-1/3}`` and the IQR-robust variance floor
(jittering.py:49-83).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ....constants import EPS
from ....utils import get_ess


def silverman(n: int, ess) -> jax.Array:
    """Silverman's KDE factor (reference jittering.py:26-36)."""
    return (ess * (n + 2) / 4.0) ** (-1.0 / (n + 4))


def scott(n: int, ess) -> jax.Array:
    """Scott's KDE factor (reference jittering.py:39-47)."""
    return 1.059 * ess ** (-1.0 / (n + 4))


def robust_var(x: jax.Array, w: jax.Array, mean: jax.Array = None) -> jax.Array:
    """Robust variance ``min(IQR/1.349, sigma)^2`` per column
    (reference jittering.py:50-83).

    ``x``: samples ``(B, D)``; ``w``: normalized weights ``(B,)``.
    """
    sort_idx = jnp.argsort(x, axis=0)
    sorted_x = jnp.take_along_axis(x, sort_idx, axis=0)
    cum_w = jnp.cumsum(w[sort_idx], axis=0)

    low = jnp.argmin(jnp.abs(cum_w - 0.25), axis=0)
    high = jnp.argmin(jnp.abs(cum_w - 0.75), axis=0)

    cols = jnp.arange(x.shape[-1])
    iqr = (sorted_x[high, cols] - sorted_x[low, cols]) / 1.349
    iqr2 = jnp.square(iqr)

    if mean is None:
        mean = jnp.sum(w[:, None] * x, axis=0)
    var = jnp.sum(w[:, None] * jnp.square(x - mean), axis=0)

    return jnp.where(iqr2 <= var, iqr2, var)


def _bandwidth_factor(w: jax.Array) -> jax.Array:
    ess = get_ess(w, normalized=True)
    return jnp.clip(1.59 * ess ** (-1.0 / 3), EPS, 1.0 - EPS)


@dataclasses.dataclass(frozen=True)
class JitterKernel:
    """Base jittering kernel: subclasses implement :meth:`fit` returning the
    kernel ``(mean, scale)`` for the resampled particles."""

    std_threshold: float = EPS

    def fit(self, x: jax.Array, w: jax.Array, indices: jax.Array) -> tuple:
        raise NotImplementedError

    def jitter(self, key, x: jax.Array, w: jax.Array, indices: jax.Array) -> jax.Array:
        """Draw jittered values ``mean + std * eps`` (reference jittering.py:117-134)."""
        if indices.shape[0] != x.shape[0]:
            raise ValueError(
                f"Shape of `indices` is not congruent with `x`: {indices.shape[0]} != {x.shape[0]}"
            )
        mean, scale = self.fit(x, w, indices)
        std = jnp.clip(scale, self.std_threshold, None)
        return mean + std * jax.random.normal(key, jnp.shape(mean), dtype=x.dtype)


@dataclasses.dataclass(frozen=True)
class ShrinkingKernel(JitterKernel):
    """Flury-Shephard shrinking kernel: means shrunk toward the weighted mean
    by ``beta = sqrt(1 - bw^2)`` (reference jittering.py:137-158)."""

    def fit(self, x, w, indices):
        bw = _bandwidth_factor(w)
        mean = jnp.sum(w[:, None] * x, axis=0)
        var = robust_var(x, w, mean)
        beta = jnp.sqrt(1.0 - jnp.square(bw))
        means = (mean + beta * (x - mean))[indices]
        return means, bw * jnp.sqrt(var)


@dataclasses.dataclass(frozen=True)
class NonShrinkingKernel(ShrinkingKernel):
    """Non-shrinking variant (reference jittering.py:161-173)."""

    def fit(self, x, w, indices):
        bw = _bandwidth_factor(w)
        var = robust_var(x, w)
        return x[indices], bw * jnp.sqrt(var)


@dataclasses.dataclass(frozen=True)
class LiuWestShrinkage(ShrinkingKernel):
    """Liu-West shrinkage with ``a=0.98`` (reference jittering.py:176-203)."""

    a: float = 0.98

    def fit(self, x, w, indices):
        mean = jnp.sum(w[:, None] * x, axis=0)
        var = robust_var(x, w, mean)
        values = (x * self.a + (1.0 - self.a) * mean)[indices]
        bw = math.sqrt(1.0 - self.a**2.0)
        return values, bw * jnp.sqrt(var)


@dataclasses.dataclass(frozen=True)
class ConstantKernel(ShrinkingKernel):
    """Constant-bandwidth kernel from the original NESS paper
    (reference jittering.py:206-225)."""

    scale: float = 1e-2

    def fit(self, x, w, indices):
        return x[indices], jnp.asarray(self.scale, x.dtype)
