"""Resampling schemes for particle filters — branchless, fixed-shape, jit-safe.

Functional JAX re-design of the reference's ``pyfilter/resampling.py``:

- ``systematic``  (reference resampling.py:24-52) — one shared uniform per lane,
  positions ``(arange(N)+u)/N``, cumulative weights with the final entry forced to
  1.0 to absorb float drift (resampling.py:49), then a vectorized ``searchsorted``.
- ``stratified``  — like systematic but an independent uniform per stratum (new;
  the standard companion scheme, not in the reference).
- ``multinomial`` (reference resampling.py:55-65) — i.i.d. categorical draws.
- ``residual``    (reference resampling.py:68-105) — deterministic integer-part
  replication + multinomial on the residuals. The reference is 1-D only; here
  batched input is supported too (fixed-shape construction, no host sync).

Conventions:
- inputs are **unnormalized log-weights** of shape ``(N, *batch)`` with the particle
  axis first (pass ``normalized=True`` for probabilities);
- randomness comes from an explicit ``jax.random`` key; the uniforms are injectable
  via ``u=`` for cross-implementation tests (reference resampling.py:25,41 keeps
  ``u`` injectable for exactly this purpose);
- output is an int32 index array of shape ``(N, *batch)`` suitable for
  ``utils.batched_gather`` / ``jnp.take_along_axis`` along axis 0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .utils import normalize

__all__ = ["systematic", "stratified", "multinomial", "residual"]


def _as_probs(weights: jax.Array, normalized: bool) -> jax.Array:
    w = jnp.asarray(weights)
    if not normalized:
        w = normalize(w, axis=0)
    return w


def _batched_searchsorted(cumw: jax.Array, positions: jax.Array) -> jax.Array:
    """``searchsorted`` along axis 0 for every batch lane.

    ``cumw``/``positions``: shape ``(N, *batch)``, each lane sorted along axis 0.

    Uses ``method="sort"``: the default binary-search lowering costs ~20 rounds
    of random 1e6-element gathers on TPU (~133 ms at N=1e6); the sort-based
    rank computation is one vectorized sort (~0.5 ms — measured 277x faster).
    """
    # side="right" == the textbook loop's strict `position < cumsum[j]` test; it
    # also never selects a zero-weight particle on an exact tie.
    if cumw.ndim == 1:
        idx = jnp.searchsorted(cumw, positions, side="right", method="sort")
    else:
        n = cumw.shape[0]
        batch_shape = cumw.shape[1:]
        cw = cumw.reshape(n, -1).T  # (B, N)
        pos = positions.reshape(n, -1).T
        find = jax.vmap(partial(jnp.searchsorted, side="right", method="sort"))
        idx = find(cw, pos).T.reshape((n, *batch_shape))
    return jnp.minimum(idx, cumw.shape[0] - 1).astype(jnp.int32)


def _cumulative(probs: jax.Array) -> jax.Array:
    cumw = jnp.cumsum(probs, axis=0)
    # Force the total mass to exactly 1.0 so the last stratum always lands
    # inside the support (reference resampling.py:49).
    return cumw.at[-1].set(1.0)


def systematic(
    key: jax.Array | None,
    weights: jax.Array,
    normalized: bool = False,
    u: jax.Array | None = None,
) -> jax.Array:
    """Systematic resampling (reference resampling.py:24-52).

    ``u`` (optional): uniform(s) in [0,1) of shape ``batch_shape`` — injectable for
    deterministic cross-checks; drawn from ``key`` otherwise.
    """
    probs = _as_probs(weights, normalized)
    n = probs.shape[0]
    batch_shape = probs.shape[1:]
    if u is None:
        if key is None:
            raise ValueError("either key or u must be provided")
        u = jax.random.uniform(key, batch_shape, dtype=probs.dtype)
    u = jnp.broadcast_to(jnp.asarray(u, probs.dtype), batch_shape)

    offsets = jnp.arange(n, dtype=probs.dtype).reshape((n,) + (1,) * len(batch_shape))
    positions = (offsets + u) / n
    positions = jnp.broadcast_to(positions, probs.shape)
    return _batched_searchsorted(_cumulative(probs), positions)


def stratified(
    key: jax.Array | None,
    weights: jax.Array,
    normalized: bool = False,
    u: jax.Array | None = None,
) -> jax.Array:
    """Stratified resampling: an independent uniform per stratum."""
    probs = _as_probs(weights, normalized)
    n = probs.shape[0]
    if u is None:
        if key is None:
            raise ValueError("either key or u must be provided")
        u = jax.random.uniform(key, probs.shape, dtype=probs.dtype)
    u = jnp.broadcast_to(jnp.asarray(u, probs.dtype), probs.shape)

    offsets = jnp.arange(n, dtype=probs.dtype).reshape((n,) + (1,) * (probs.ndim - 1))
    positions = (offsets + u) / n
    return _batched_searchsorted(_cumulative(probs), positions)


def multinomial(key: jax.Array, weights: jax.Array, normalized: bool = False) -> jax.Array:
    """Multinomial resampling: N i.i.d. categorical draws per lane
    (reference resampling.py:55-65)."""
    probs = _as_probs(weights, normalized)
    n = probs.shape[0]
    logits = jnp.log(probs)  # -inf where zero mass: fine for categorical
    # categorical wants the category axis last and batch axes leading.
    logits_bn = jnp.moveaxis(logits, 0, -1)  # (*batch, N)
    out_shape = (n, *probs.shape[1:])
    return jax.random.categorical(key, logits_bn, axis=-1, shape=out_shape).astype(jnp.int32)


def _residual_1d(key: jax.Array, probs: jax.Array) -> jax.Array:
    n = probs.shape[0]
    counts = jnp.floor(n * probs).astype(jnp.int32)
    n_det = jnp.sum(counts)
    # Deterministic replication without dynamic shapes: position j gets the particle
    # whose cumulative count first exceeds j.
    cum_counts = jnp.cumsum(counts)
    slots = jnp.arange(n, dtype=cum_counts.dtype)
    det_idx = jnp.searchsorted(cum_counts, slots, side="right").astype(jnp.int32)
    det_idx = jnp.minimum(det_idx, n - 1)

    residual = probs - counts.astype(probs.dtype) / n
    res_sum = jnp.sum(residual)
    res_probs = jnp.where(res_sum > 0, residual / jnp.maximum(res_sum, 1e-38), 1.0 / n)
    mult_idx = jax.random.categorical(key, jnp.log(res_probs), shape=(n,)).astype(jnp.int32)

    return jnp.where(slots < n_det, det_idx, mult_idx)


def residual(key: jax.Array, weights: jax.Array, normalized: bool = False) -> jax.Array:
    """Residual resampling (reference resampling.py:68-105).

    The reference raises on batched input (resampling.py:80-81); here batched lanes
    are supported via an internal ``vmap`` (SURVEY.md §8 — conscious fix).
    """
    probs = _as_probs(weights, normalized)
    if probs.ndim == 1:
        return _residual_1d(key, probs)
    batch_shape = probs.shape[1:]
    flat = probs.reshape(probs.shape[0], -1).T  # (B, N)
    keys = jax.random.split(key, flat.shape[0])
    idx = jax.vmap(_residual_1d)(keys, flat)  # (B, N)
    return idx.T.reshape(probs.shape)
