"""Core weight numerics for sequential Monte Carlo.

Functional JAX re-design of the reference's ``pyfilter/utils.py`` and
``pyfilter/filters/particle/utils.py``:

- ``normalize``           (reference utils.py:49-64)   — log-weights -> normalized probs
- ``normalize_log``                                   — log-weights -> normalized log-probs
- ``get_ess``             (reference utils.py:8-20)    — effective sample size 1 / sum(w^2)
- ``log_likelihood``      (reference filters/particle/utils.py:7-22)
- ``get_mean_and_variance`` (reference filters/particle/utils.py:26-65)
- ``construct_diag_from_flat`` (reference utils.py:23-46)

Conventions (identical everywhere in this package):
- the PARTICLE axis is axis 0; any batch (lane) axes follow; event axes come last.
- every function is pure, jit-safe, and fixed-shape.

Behavioral parity notes (reference quirks preserved deliberately, SURVEY.md §8):
- ``normalize`` scrubs NaN and +inf log-weights to -inf before the softmax, and
  backfills lanes whose weights are ALL -inf (zero total mass) with uniform 1/N
  (reference utils.py:57-62).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp


def _scrub(log_weights: jax.Array) -> jax.Array:
    """NaN / +inf log-weights -> -inf (reference utils.py:57-58)."""
    bad = jnp.isnan(log_weights) | jnp.isposinf(log_weights)
    return jnp.where(bad, -jnp.inf, log_weights)


def normalize_log(log_weights: jax.Array, axis: int = 0) -> jax.Array:
    """Normalized log-probabilities over ``axis``; degenerate lanes -> uniform log(1/N)."""
    lw = _scrub(log_weights)
    n = lw.shape[axis]
    norm = logsumexp(lw, axis=axis, keepdims=True)
    out = lw - norm
    all_dead = jnp.isneginf(norm)
    return jnp.where(all_dead, -jnp.log(jnp.asarray(n, lw.dtype)), out)


def normalize(log_weights: jax.Array, axis: int = 0) -> jax.Array:
    """Log-weights -> normalized probabilities over ``axis`` (reference utils.py:49-64).

    NaN/+inf are treated as zero-mass; lanes with zero total mass are backfilled
    with the uniform distribution 1/N.
    """
    return jnp.exp(normalize_log(log_weights, axis=axis))


def get_ess(log_weights: jax.Array, normalized: bool = False, axis: int = 0) -> jax.Array:
    """Effective sample size ``1 / sum_i w_i^2`` over ``axis`` (reference utils.py:8-20).

    ``log_weights`` are unnormalized log-weights unless ``normalized`` is True, in
    which case they are probabilities already.
    """
    w = jnp.asarray(log_weights)
    if not normalized:
        w = normalize(w, axis=axis)
    return 1.0 / jnp.sum(jnp.square(w), axis=axis)


def log_likelihood(
    inc_weights: jax.Array,
    weights: jax.Array | None = None,
    axis: int = 0,
) -> jax.Array:
    """Per-step log-likelihood estimate from incremental particle weights.

    Computes ``log sum_i w_i exp(v_i)`` in a max-stabilized way, where ``v`` are the
    incremental log-weights and ``w`` the previous *normalized* probabilities
    (uniform 1/N if omitted) — reference filters/particle/utils.py:7-22.
    """
    v = jnp.asarray(inc_weights)
    if weights is None:
        n = v.shape[axis]
        return logsumexp(v, axis=axis) - jnp.log(jnp.asarray(n, v.dtype))
    return logsumexp(v + jnp.log(weights), axis=axis)


def get_mean_and_variance(
    x: jax.Array,
    probs: jax.Array,
    event_ndim: int = 0,
    covariance: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Weighted mean and variance (or covariance) of a particle cloud.

    ``x`` has shape ``(N, *batch, *event)`` with ``event_ndim`` trailing event axes
    (0 or 1); ``probs`` are normalized probabilities of shape ``(N, *batch)``.
    Reference: filters/particle/utils.py:26-65 (1-D states treated as scalar event).

    Returns ``(mean, var)`` with shapes ``(*batch, *event)`` each, or — when
    ``covariance=True`` and ``event_ndim == 1`` — covariance ``(*batch, d, d)``.
    """
    if event_ndim > 1:
        raise ValueError("event_ndim must be 0 or 1")
    if event_ndim == 0:
        mean = jnp.sum(probs * x, axis=0)
        var = jnp.sum(probs * jnp.square(x - mean), axis=0)
        return mean, var

    w = probs[..., None]  # (N, *batch, 1)
    mean = jnp.sum(w * x, axis=0)  # (*batch, d)
    centered = x - mean
    if not covariance:
        var = jnp.sum(w * jnp.square(centered), axis=0)
        return mean, var
    cov = jnp.einsum("n...i,n...j->...ij", w * centered, centered)
    return mean, cov


def construct_diag_from_flat(x: jax.Array, event_ndim: int = 1) -> jax.Array:
    """Batched diagonal matrix from a flat scale vector (reference utils.py:23-46).

    ``event_ndim`` 0: scalar scale -> (..., 1, 1); 1: (..., d) -> (..., d, d).
    """
    if event_ndim == 0:
        return x[..., None, None]
    if event_ndim == 1:
        if x.shape[-1] == 1:
            return x[..., None]
        eye = jnp.eye(x.shape[-1], dtype=x.dtype)
        return x[..., None] * eye
    raise ValueError("event rank must be <= 1")


def batched_gather(x: jax.Array, indices: jax.Array, event_ndim: int = 0) -> jax.Array:
    """Gather along the particle axis (axis 0), broadcasting over trailing event axes.

    ``x`` has shape ``(N, *batch, *event)``; ``indices`` has shape ``(N, *batch)``
    (or broadcastable to it). Re-design of reference filters/utils.py:4-21 — here a
    take-along-axis with trailing-dim expansion.
    """
    idx = indices
    while idx.ndim < x.ndim:
        idx = idx[..., None]
    idx = jnp.broadcast_to(idx, idx.shape[: indices.ndim] + x.shape[indices.ndim:])
    return jnp.take_along_axis(x, idx, axis=0)


def is_documented_by(original):
    """Docstring-copying decorator (reference utils.py:67-83)."""

    def wrapper(target):
        target.__doc__ = original.__doc__
        return target

    return wrapper
