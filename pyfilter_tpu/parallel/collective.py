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


# ---------------------------------------------------------------------------
# halo-exchange systematic resampling — the scaling tier (SURVEY §5.8)
#
# ``allgather_take`` ships the ENTIRE global cloud over ICI on every fire:
# O(N) floats per device — fine at 1e6 particles, not a story at 1e8. But
# systematic-resampling ancestor indices are MONOTONE: device d's output
# slots [d*N/P, (d+1)*N/P) draw from one contiguous ancestor range, and with
# psum-normalized weights that range lies within a few neighboring shards
# unless the weights are extremely degenerate (a shard must carry ~(halo+1)x
# its fair share of total weight to push ancestors further). So each device
# ``ppermute``s only its ``halo`` ring neighbors' shards — a fixed
# O(halo * N/P) payload — computes its own slots' ancestors locally with the
# same counts-inversion the single-device resampler uses
# (ops/resample.py:_counts_invert_1d), and takes from the exchanged window.
# A psum'd fit check detects the rare fat-tailed fire where the window is
# too small, and the resample falls back to the all-gather strategy (the
# single-device hot path this replaces at scale is the reference's
# resampling.py:24-52 global cumsum + searchsorted).
# ---------------------------------------------------------------------------


def ring_window(x: jax.Array, axis_name: str, halo: int) -> jax.Array:
    """Concatenate the ring neighborhood ``[my-halo, my+halo]`` of a sharded
    axis-0 array: ``2*halo`` ``ppermute`` shifts of O(N/P) each. Blocks that
    wrap past the global ends carry garbage — callers mask them by source id."""
    p = jax.lax.axis_size(axis_name)
    parts = []
    for h in range(halo, 0, -1):  # shard my-h travels +h around the ring
        parts.append(
            jax.lax.ppermute(x, axis_name, perm=[(i, (i + h) % p) for i in range(p)])
        )
    parts.append(x)
    for h in range(1, halo + 1):  # shard my+h travels -h
        parts.append(
            jax.lax.ppermute(x, axis_name, perm=[(i, (i - h) % p) for i in range(p)])
        )
    return jnp.concatenate(parts, axis=0)


def halo_systematic(key: jax.Array, log_weights: jax.Array, axis_name: str, halo: int = 1):
    """Distributed systematic resampling with an O(halo * N/P) exchange.

    Returns ``(global_indices, window_indices, fits)``: the local output
    slots' global ancestor ids ``(N/P,)``, the same ancestors as positions
    into the :func:`ring_window` of a value shard (``halo_take``), and a
    REPLICATED boolean that is True when every device's ancestors landed
    inside its halo window (use :func:`distributed_systematic` for the
    composed resample with the all-gather fallback).

    Bit-identical to :func:`allgather_systematic` whenever ``fits`` is True:
    both build per-shard cumulative weights plus all-gathered shard offsets,
    draw the same shared uniform, and invert the same copy-count boundaries.
    """
    p = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    n_local = log_weights.shape[0]
    n = n_local * p
    base = my * n_local  # my first global output slot

    probs_local = psum_normalize(log_weights, axis_name)
    local_cum = jnp.cumsum(probs_local)
    shard_totals = jax.lax.all_gather(local_cum[-1], axis_name)  # (P,) floats

    # global cumulative weight before shard s — the EXACT masked-sum
    # formulation allgather_systematic uses, so the two strategies' count
    # boundaries are bit-identical (a cumsum-of-totals variant reorders the
    # float accumulation and flips ULP-tie indices at large N)
    def _offset(s):
        return jnp.sum(jnp.where(jnp.arange(p) < s, shard_totals, 0.0))

    cum_global = local_cum + _offset(my)

    u = jax.random.uniform(key, ())  # shared: the stratified grid is global

    # window cumulative weights; wrapped blocks are overridden so they act as
    # (front) zero-weight particles before global slot 0 / (back) sentinels
    src = (my - halo) + jnp.repeat(jnp.arange(2 * halo + 1), n_local)
    wcum = ring_window(cum_global, axis_name, halo)
    front = src < 0
    back = src >= p
    wcum = jnp.where(front, 0.0, jnp.where(back, jnp.inf, wcum))

    counts = jnp.clip(jnp.ceil(n * wcum - u), 0, n).astype(jnp.int32)
    # count boundary BEFORE the window's first entry: 0 when the window
    # reaches (or wraps past) shard 0, else the global count at that shard's
    # lower edge
    s0 = jnp.clip(my - halo, 0, p - 1)
    boundary0 = jnp.where(
        my - halo <= 0,
        jnp.int32(0),
        jnp.clip(jnp.ceil(n * _offset(s0) - u), 0, n).astype(jnp.int32),
    )
    starts = jnp.concatenate([boundary0[None], counts[:-1]])

    # fit: my first slot's owner is inside the window (pre-window particles
    # consumed at most `base` slots) and my last slot is covered (the last
    # REAL window particle's count reaches past it — unless the window
    # already includes the global end, where tail slots inherit the last
    # particle exactly as the single-device inversion does)
    last_valid = (jnp.minimum(my + halo, p - 1) - (my - halo) + 1) * n_local - 1
    bottom_ok = (my - halo <= 0) | (boundary0 <= base)
    top_ok = (my + halo >= p - 1) | (counts[last_valid] >= base + n_local)
    fits = jax.lax.psum(jnp.int32(~(bottom_ok & top_ok)), axis_name) == 0

    # counts inversion restricted to my slots (ops/resample.py math): scatter
    # a 1 at each window particle's first owned local slot — front-wrapped
    # fillers deliberately count (they offset window positions by exactly
    # their block size) while back-wrapped sentinels never do
    start_local = jnp.clip(starts - base, 0, n_local)
    hit = (start_local < n_local) & ~back
    scat = (
        jnp.zeros(n_local, jnp.int32)
        .at[jnp.minimum(start_local, n_local - 1)]
        .add(hit.astype(jnp.int32))
    )
    window_indices = jnp.cumsum(scat) - 1
    global_indices = (my - halo) * n_local + window_indices
    return global_indices, window_indices, fits


def halo_take(values: jax.Array, window_indices: jax.Array, axis_name: str, halo: int = 1) -> jax.Array:
    """Gather sharded ``values`` at :func:`halo_systematic` window positions:
    ``2*halo`` ppermutes (O(halo * N/P) payload) and a local take."""
    window = ring_window(values, axis_name, halo)
    return jnp.take(window, window_indices, axis=0)


def distributed_systematic(
    key: jax.Array, log_weights: jax.Array, values, axis_name: str, halo: int = 1
):
    """Resample a pytree of particle-sharded ``values`` (axis 0 = local
    particle shard) with the scaling strategy: halo exchange when the
    ancestors fit the ``halo`` ring window, all-gather fallback otherwise
    (same law — both inversions consume the same shared uniform).

    Returns ``(resampled_values, global_indices)``. Per-device payload is
    O(halo * N/P) value rows in the (overwhelmingly common) fitting regime
    vs the fallback's O(N).
    """
    g_idx, w_idx, fits = halo_systematic(key, log_weights, axis_name, halo)

    def halo_path(vals):
        taken = jax.tree_util.tree_map(
            lambda v: halo_take(v, w_idx, axis_name, halo), vals
        )
        return taken, g_idx

    def gather_path(vals):
        idx = allgather_systematic(key, log_weights, axis_name)
        taken = jax.tree_util.tree_map(
            lambda v: allgather_take(v, idx, axis_name), vals
        )
        return taken, idx

    return jax.lax.cond(fits, halo_path, gather_path, values)


# ---------------------------------------------------------------------------
# communication-local Metropolis resampling — the collective-free tier
# (PAPERS.md: Murray, Lee & Jacob, arXiv:1202.6163; SURVEY §5.8's third option)
#
# The systematic strategies above need a GLOBAL cumulative weight — at minimum
# an all-gather of P shard totals plus psum-normalized weights. The Metropolis
# resampler needs only weight RATIOS: each output slot runs an n_iter-step
# independent-Metropolis chain over ancestor candidates, accepting j over k
# with prob min(1, w_j/w_k). Restricting each device's candidate pool to its
# ring window of 2*halo+1 neighboring shards makes the whole resample
# 2*halo ppermutes + local arithmetic — NO reductions, NO all-gather, and no
# shared uniform. Two approximations, both measured in tests/test_parallel.py:
#   * chain bias: the slot law converges geometrically in n_iter to the
#     window-restricted multinomial law (single-device `resampling.metropolis`
#     has the same knob);
#   * window bias: ancestors come from the window, re-weighted by the
#     window-local weights. Exact when weights are i.i.d.-exchangeable across
#     shards (each window is then an unbiased bootstrap of the cloud); biased
#     when weight mass concentrates on few shards — there the systematic
#     halo/all-gather strategies are the right tool. This is the documented
#     trade of the communication-local family, not an implementation defect.
# ---------------------------------------------------------------------------


def local_metropolis(
    key: jax.Array,
    log_weights: jax.Array,
    axis_name: str,
    halo: int = 1,
    n_iter: int = 32,
):
    """Window-restricted Metropolis ancestor selection for a particle-sharded
    cloud. Returns ``(global_indices, window_indices)``: each local output
    slot's ancestor as a global particle id and as a position into the
    :func:`ring_window` of a value shard (for :func:`halo_take` with the same
    ``halo``). Per-device communication: ``2*halo`` ppermutes of the weight
    shard — no reductions of any kind."""
    p = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    n_local = log_weights.shape[0]
    n_win = (2 * halo + 1) * n_local

    lw_win = _scrub(ring_window(log_weights, axis_name, halo))
    # when the ring window wraps a full lap (2*halo+1 > p) the later blocks
    # are DUPLICATES of earlier residues; unmasked they would double those
    # shards' selection probability (p=2, halo=1: the neighbor shard fills 2
    # of 3 blocks). Mask every block past the first lap so each shard appears
    # exactly once in the candidate pool.
    block = jnp.repeat(jnp.arange(2 * halo + 1), n_local)
    dup = block >= p
    lw_win = jnp.where(dup, -jnp.inf, lw_win)
    # all-dead window -> uniform over the VALID blocks (the utils.normalize
    # backfill, made local; duplicate blocks must stay -inf)
    lw_win = jnp.where(~dup & jnp.all(jnp.isneginf(lw_win)), 0.0, lw_win)

    # decorrelate the per-device chains: distinct key per device
    dev_key = jax.random.fold_in(key, my)
    # start at self — block `halo` normally, its first-lap copy `halo % p`
    # once the window wraps; pcast marks the (replicated) start state
    # device-varying so the scan carry types line up under shard_map's
    # varying-axes check
    k0 = jax.lax.pcast(
        (halo % p) * n_local + jnp.arange(n_local, dtype=jnp.int32),
        (axis_name,),
        to="varying",
    )

    def body(k, it_key):
        kj, ku = jax.random.split(it_key)
        j = jax.random.randint(kj, (n_local,), 0, n_win, dtype=jnp.int32)
        log_u = jnp.log(jax.random.uniform(ku, (n_local,), dtype=lw_win.dtype))
        accept = log_u <= lw_win[j] - lw_win[k]
        return jnp.where(accept, j, k), None

    window_indices, _ = jax.lax.scan(body, k0, jax.random.split(dev_key, n_iter))
    src_shard = jnp.mod(my - halo + window_indices // n_local, p)
    global_indices = src_shard * n_local + window_indices % n_local
    return global_indices, window_indices


def distributed_categorical(key: jax.Array, logits: jax.Array, axis_name: str) -> jax.Array:
    """Categorical draws over a particle-sharded category axis via the
    Gumbel-max trick: ``argmax_i (logits_i + G_i)`` with i.i.d. Gumbel noise
    is an exact categorical sample, and a sharded argmax is just a local
    argmax + two ``pmax``/``psum`` scalars per row — O(rows) communication,
    never O(N).

    ``logits``: ``(rows, N/P)`` — the LOCAL shard of each row's global
    category axis (unnormalized log-probabilities; normalization cancels in
    the argmax). NaN/+inf logits are scrubbed to -inf (a NaN would poison the
    pmax and return the -1 sentinel, which ``distributed_take_rows`` turns
    into a silent zero row). Returns ``(rows,)`` GLOBAL category indices,
    replicated.
    """
    my = jax.lax.axis_index(axis_name)
    n_local = logits.shape[-1]
    logits = _scrub(logits)

    # distinct noise per (row, global category): fold the device id in
    g = jax.random.gumbel(
        jax.random.fold_in(key, my), logits.shape, dtype=logits.dtype
    )
    z = logits + g
    local_best = jnp.max(z, axis=-1)  # (rows,)
    local_arg = my * n_local + jnp.argmax(z, axis=-1).astype(jnp.int32)

    best = jax.lax.pmax(local_best, axis_name)
    # exactly one device holds the max (iid continuous noise); others vote -1
    winner = jax.lax.pmax(
        jnp.where(local_best == best, local_arg, -1), axis_name
    )
    return winner


def distributed_take_rows(
    values: jax.Array, global_indices: jax.Array, axis_name: str
) -> jax.Array:
    """Gather ``values[global_indices]`` from a particle-sharded axis-0 array
    without an all-gather: the owning device contributes its row, the rest
    contribute zeros, and a ``psum`` merges — O(rows * event) communication.
    ``global_indices`` must be replicated; the result is replicated."""
    my = jax.lax.axis_index(axis_name)
    n_local = values.shape[0]
    local_idx = global_indices - my * n_local
    mine = (local_idx >= 0) & (local_idx < n_local)
    picked = jnp.take(values, jnp.clip(local_idx, 0, n_local - 1), axis=0)
    ev_dims = (1,) * (picked.ndim - 1)
    contrib = jnp.where(mine.reshape(mine.shape + ev_dims), picked, 0.0)
    return jax.lax.psum(contrib, axis_name)


def distributed_metropolis(
    key: jax.Array,
    log_weights: jax.Array,
    values,
    axis_name: str,
    halo: int = 1,
    n_iter: int = 32,
):
    """Resample a pytree of particle-sharded ``values`` with the
    communication-local Metropolis strategy: ``2*halo`` ppermutes for the
    weight window, ``2*halo`` per value leaf, zero reductions. Returns
    ``(resampled_values, global_indices)`` — same contract as
    :func:`distributed_systematic`, different (approximate) law; see the
    module comment for when the approximation is sound."""
    g_idx, w_idx = local_metropolis(key, log_weights, axis_name, halo, n_iter)
    taken = jax.tree_util.tree_map(
        lambda v: halo_take(v, w_idx, axis_name, halo), values
    )
    return taken, g_idx
