"""Explicit collective weight ops and distributed resampling (shard_map).

The GSPMD path (`parallel.sharding`) lets XLA insert collectives from sharding
annotations — correct and usually optimal. This module is the explicit
formulation for users composing their own `shard_map` programs (SURVEY.md
§5.8): weight normalization / ESS / loglik become ``psum``/``pmax`` over the
particle axis, and systematic resampling uses the all-gather strategy (global
cumulative weights assembled from per-shard partial sums — appropriate to
~1e7 particles; the per-shard payload is N floats).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import normalize


def _scrub(lw):
    bad = jnp.isnan(lw) | jnp.isposinf(lw)
    return jnp.where(bad, -jnp.inf, lw)


def psum_normalize(log_weights: jax.Array, axis_name: str) -> jax.Array:
    """Normalized probabilities of a particle-sharded log-weight vector:
    ``pmax``-stabilized softmax with a ``psum`` total (replaces the dim-0
    reductions of utils.normalize in the sharded setting)."""
    lw = _scrub(log_weights)
    m = jax.lax.pmax(jnp.max(lw, initial=-jnp.inf), axis_name)
    e = jnp.exp(lw - m)
    total = jax.lax.psum(jnp.sum(e), axis_name)
    n = lw.shape[0] * jax.lax.axis_size(axis_name)
    probs = e / total
    # degenerate (all -inf) -> uniform backfill, as utils.normalize
    return jnp.where(total > 0, probs, 1.0 / n)


def distributed_ess(log_weights: jax.Array, axis_name: str) -> jax.Array:
    """Global effective sample size of a sharded weight vector."""
    probs = psum_normalize(log_weights, axis_name)
    return 1.0 / jax.lax.psum(jnp.sum(jnp.square(probs)), axis_name)


def distributed_log_likelihood(
    inc_weights: jax.Array, prev_log_weights: jax.Array, axis_name: str
) -> jax.Array:
    """Per-step loglik increment ``log sum w_prev exp(inc)`` across shards."""
    v = _scrub(inc_weights) + jnp.log(psum_normalize(prev_log_weights, axis_name))
    m = jax.lax.pmax(jnp.max(v, initial=-jnp.inf), axis_name)
    s = jax.lax.psum(jnp.sum(jnp.exp(v - m)), axis_name)
    return m + jnp.log(s)


def allgather_systematic(key: jax.Array, log_weights: jax.Array, axis_name: str) -> jax.Array:
    """Distributed systematic resampling, all-gather strategy.

    ``log_weights`` is the local shard ``(N/P,)``; every device draws the SAME
    shared uniform (fold the axis index out of the key — the stratified grid is
    global), assembles the global cumulative weights, and computes only ITS
    OWN slice of ancestor indices via counts inversion. Returns local global
    ancestor indices ``(N/P,)`` — gather values with
    :func:`allgather_take`.
    """
    p = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    n_local = log_weights.shape[0]
    n = n_local * p

    probs_local = psum_normalize(log_weights, axis_name)  # (N/P,) global probs
    local_cum = jnp.cumsum(probs_local)
    shard_totals = jax.lax.all_gather(local_cum[-1], axis_name)  # (P,)
    offset = jnp.sum(jnp.where(jnp.arange(p) < my, shard_totals, 0.0))
    cumw_local = local_cum + offset

    # same u everywhere: the stratified position grid is global
    u = jax.random.uniform(key, ())

    # global counts for my particles; previous count at my shard boundary
    counts = jnp.clip(jnp.ceil(n * cumw_local - u), 0, n).astype(jnp.int32)
    boundary = jnp.clip(jnp.ceil(n * offset - u), 0, n).astype(jnp.int32)
    n_prev = jnp.concatenate([boundary[None], counts[:-1]])

    # my output slots are [my*n_local, (my+1)*n_local); invert the monotone
    # global counts restricted to my slots: scatter my particles' start slots
    # (global id = my*n_local + local id) into a gathered dense table
    start_slots = n_prev  # global output slot where my particle j starts
    my_ids = my * n_local + jnp.arange(n_local, dtype=jnp.int32)

    # dense global (slot -> is a start) via all_gather of (slots, ids):
    all_slots = jax.lax.all_gather(start_slots, axis_name).reshape(-1)  # (N,)
    all_valid = jax.lax.all_gather(n_prev < n, axis_name).reshape(-1)
    scat = (
        jnp.zeros(n, jnp.int32)
        .at[jnp.minimum(all_slots, n - 1)]
        .add(jnp.where(all_valid, 1, 0).astype(jnp.int32))
    )
    idx_global = jnp.cumsum(scat) - 1  # (N,) ancestor ids for every slot
    lo = my * n_local
    return jax.lax.dynamic_slice(idx_global, (lo,), (n_local,))


def allgather_take(values: jax.Array, global_indices: jax.Array, axis_name: str) -> jax.Array:
    """Gather sharded ``values`` at global ancestor indices: all-gather the
    value shards (N floats over ICI) and take locally."""
    gathered = jax.lax.all_gather(values, axis_name)  # (P, N/P, ...)
    flat = gathered.reshape((-1,) + gathered.shape[2:])
    return jnp.take(flat, global_indices, axis=0)
