"""Fused systematic resample + particle gather as a Pallas TPU kernel.

The ~19 ms cost of a resample fire at N=1e6 (PERF.md) is two XLA random-access
ops: the int scatter inside counts inversion (~8 ms) and the value gather
``x[idx]`` (~8 ms). Both are unnecessary: systematic-resampling indices are
**monotone non-decreasing**, so resampling is a *streaming expansion* — output
block ``[kB, (k+1)B)`` only reads source particles in a narrow window around
``idx[kB]``. This module exploits that:

1.  XLA side: cumulative weights -> integer copy-count boundaries
    ``counts[j] = #positions below cumw[j]`` (exactly as
    :mod:`pyfilter_tpu.ops.resample`), plus a binary search of the ``n/B``
    block-boundary positions to find each output block's source window start.
2.  Pallas side: for each output block, compare the window's count
    boundaries against the block's output positions — a ``(window, B)``
    one-hot selection matrix ``1{cshift[j] <= i < counts[j]}`` built on the
    VPU — and contract it with the window's particle values on the MXU
    (``Precision.HIGHEST`` keeps the full f32 mantissa). The one-hot
    contraction reproduces the gather **bit-exactly** (each output row sums
    exactly one value times 1.0), and the ancestor index comes free as a
    row-sum of the step matrix.

Streaming reads replace random access entirely; the only random-ish op left
is a contiguous-rows pre-gather of the per-group windows, which runs at copy
speed. Window spans grow with weight degeneracy (zero-copy runs): measured
max spans at N=1e6 are ~136 at ESS 0.998·N (the SISR gate regime), ~184 at
ESS 0.37·N, ~298 at ESS 0.014·N. Scalar checks pick the narrow window, the
wide window, or the XLA counts-inversion fallback via nested ``lax.cond`` —
untaken branches are free on TPU (measured).

Reference hot path this replaces: pyfilter/resampling.py:24-52 plus the
``x[idx]`` gathers at pyfilter/filters/particle/sisr.py:29-43 and
apf.py:25-46.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import normalize

__all__ = ["systematic_expand", "systematic_expand_lanes"]

# Output block of B positions reads a window of `window` sources; work scales
# as n * window, so the narrow window runs unless its span check fails. GROUP
# output blocks share one grid step (one VMEM-resident region) to amortize
# dispatch; DRIFT_BLOCKS of slack absorb the random-walk drift of window
# starts across a group. Window starts are STRIDE-aligned lower bounds — a
# coarser stride shrinks the start-finding merge (the dominant prep cost at
# N=1e6: an 8-stride merge sorted ~141k keys for 2.0 ms/fire; 64-stride
# sorts ~23k) at the price of up to 2*(STRIDE-8) rows of window slack,
# absorbed by widening the windows.
_B = 128
_GROUP = 32
_STRIDE = 64
# window tiers, narrowest first (rows, multiples of 8): gate-regime spans at
# N=1e6 measure ~136 + up to 2*(STRIDE-8) rank slack < 256, so the 256 tier
# carries the common case; 320/640 absorb degenerate weight profiles before
# the XLA fallback
_WINDOWS = (256, 320, 640)
_DRIFT_BLOCKS = 5
# lane chunk of the in-kernel region transpose; regions round up to it
_TCHUNK = 1024
# rank-finding strategy gate: compare-reduce up to this many (block, sub)
# pairs (covers N=1e6 with 8x headroom), sort-based merge beyond
_RANK_CMP_MAX_PRODUCT = 1 << 28
# past this many groups the whole-table SMEM layout would overflow the 1 MB
# SMEM; larger runs swap (8, GROUP) table blocks (tests shrink it to cover
# the blocked path at interpret-mode-friendly sizes)
_BLOCKED_MIN_GROUPS = 1024

# The lane-BLOCKED kernel (small n per lane, many lanes) keeps everything in
# the package-native (N, lanes) layout: lanes ride the hardware lane axis.
_LANE = 128


def _counts_from_probs(probs: jax.Array, u: jax.Array) -> jax.Array:
    """Copy-count boundaries: counts[j] = #{i : (i+u)/n < cumw[j]} (see
    ops/resample.py — identical arithmetic, so indices match bit-for-bit).

    The final boundary is pinned to ``n``: ``jax.random.uniform`` can round
    to exactly 1.0 in f32, which would leave the last boundary at ``n - 1``
    and the last output position selecting NOTHING in the expansion (the
    counts-inversion resampler self-clamps to the same last-source copy)."""
    from .resample import prob_cumsum

    n = probs.shape[0]
    cumw = prob_cumsum(probs)
    cumw = cumw.at[-1].set(1.0)
    counts = jnp.clip(jnp.ceil(n * cumw - u), 0, n).astype(jnp.int32)
    return counts.at[-1].set(n)


def _invert_counts(counts: jax.Array) -> jax.Array:
    """Counts -> ancestor indices via scatter-add inversion (the XLA fallback;
    same algorithm as ops/resample._counts_invert_1d)."""
    n = counts.shape[0]
    n_prev = jnp.concatenate([jnp.zeros(1, jnp.int32), counts[:-1]])
    scat = jnp.zeros(n, jnp.int32).at[jnp.minimum(n_prev, n - 1)].add(
        jnp.where(n_prev < n, 1, 0).astype(jnp.int32)
    )
    return jnp.cumsum(scat) - 1


def _expand_kernel(
    rstart_ref,
    rel_ref,
    s_ref,
    c0_ref,
    win_ref,
    *refs,
    n_cols: int,
    window: int,
    region: int,
    blocked_tables: bool,
):
    """One grid step: GROUP output blocks expanded from one pipelined region.

    rstart_ref: the scalar-prefetch operand — (n_groups,) int32 absolute
    region starts, consumed by the region input's ELEMENT-OFFSET index map:
    the pipeline itself DMAs each group's region out of the DENSE
    plane-major source table, double-buffered behind the compute. Layout is
    the whole game here (all measured at N=1e6): an XLA ``vmap`` of 245
    ``dynamic_slice`` ops paid ~5.5 us fixed cost per slice (~0.94 ms); a
    row-major (n, 1 + D) pallas operand gets forced into Mosaic's 128-lane
    tiling, which costs a ~0.78 ms relayout copy of a 32x-padded buffer
    AND 32x the region DMA traffic. The (1 + D, n) plane-major operand is
    dense in both HBM and the pipeline fetch.

    win_ref: the fetched (1 + D, region) block with rows [counts,
    values...] — NO cshift row: since ``cshift[j] = counts[j-1]``, the
    lower boundaries are the counts column shifted down one row with ``c0``
    filling row 0. The kernel first transposes the block chunk-wise into a
    (region, 1 + D) VMEM scratch (measured ~0.25 ms/fire) because the
    window math wants sources on SUBLANES; thereafter each output block
    reads its (window, 1 + D) slice from scratch.

    rel_ref/s_ref/c0_ref: SMEM (n_groups, GROUP) int32 — window start
    relative to the region / absolute / the boundary just below the window
    (``counts[start - 1]``, 0 at start 0).

    out_refs: D + 1 separate FLAT (GROUP * B,) planes — the payloads plus
    the ancestor-index plane, written as 128-lane rows at 128-aligned
    offsets. Flat planes match the caller's particle vector layout exactly:
    a columns-of-(GROUP*B, D+1) layout measured ~1.5 ms of extra slicing
    per fire at N=1e6, and (GROUP, B) row planes showed a ~0.94 ms
    post-kernel relayout copy in the device trace (the end-to-end fire
    measured the same either way — the copy cost moves, it does not vanish
    — so flat stays for being the caller's own layout).
    """
    out_refs = refs[:-1]
    scratch = refs[-1]
    g = pl.program_id(0)
    # blocked mode: the SMEM tables ride in (8, GROUP) blocks shared by 8
    # groups; whole-table mode (small n_groups) indexes by g directly
    gr = (g % 8) if blocked_tables else g
    d = n_cols - 1
    base = (g * _GROUP * _B).astype(jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, _B), 1).astype(jnp.float32)

    # per-group chunked transpose of the dense block into sublane-major form
    for t in range(region // _TCHUNK):
        scratch[pl.ds(t * _TCHUNK, _TCHUNK), :] = win_ref[
            :, pl.ds(t * _TCHUNK, _TCHUNK)
        ].T

    for b in range(_GROUP):
        rel = pl.multiple_of(rel_ref[gr, b], 8)
        w = scratch[pl.ds(rel, window), :]  # (window, 1 + D)
        i_row = base + (b * _B) + iota  # (1, B) output positions

        # one-hot[j, i] = 1{cshift[j] <= i < counts[j]} — difference of steps.
        # Select + sublane-reduce on the VPU: exactly one row is selected per
        # output lane, so the sum IS the gathered value (bit-exact; also
        # measured faster than per-block MXU dots, whose tiny-N latency
        # dominates at 7812 matmuls per resample).
        ccol = w[:, 0:1]  # (window, 1) counts boundaries
        clo_col = jnp.concatenate(
            [jnp.full((1, 1), c0_ref[gr, b], ccol.dtype), ccol[:-1]], axis=0
        )
        c_lo = clo_col <= i_row  # (window, B) bool
        c_hi = ccol <= i_row
        hot = c_lo & (~c_hi)
        for col in range(d):
            v = jnp.where(hot, w[:, 1 + col : 2 + col], 0.0)
            out_refs[col][pl.ds(b * _B, _B)] = jnp.sum(v, axis=0)

        # ancestor index: idx[i] = S + #{j in window : counts[j] <= i}
        out_refs[d][pl.ds(b * _B, _B)] = s_ref[gr, b].astype(jnp.float32) + jnp.sum(
            c_hi.astype(jnp.float32), axis=0
        )


def _expand_pallas(
    counts, v2d, rel, s_groups, r_starts, n_out_pad, region, window, interpret
):
    # v2d is PLANE-MAJOR (d, n): dense minor dim for the pipeline fetch
    d, n = v2d.shape
    n_src_pad = n + region

    counts_f = counts.astype(jnp.float32)
    win = jnp.concatenate([counts_f[None, :], v2d], axis=0)  # (1 + d, n)
    pad = jnp.concatenate(
        [
            jnp.full((1, n_src_pad - n), float(n), jnp.float32),
            jnp.zeros((d, n_src_pad - n), jnp.float32),
        ],
        axis=0,
    )
    win = jnp.concatenate([win, pad], axis=1)  # (1 + d, n_src_pad)

    # the boundary just below each window (cshift[start] = counts[start-1]):
    # one tiny gather of n_blocks scalars replaces the region table's whole
    # cshift column (the kernel re-derives rows 1.. by shifting counts)
    starts_flat = s_groups.reshape(-1)
    c0_groups = jnp.where(
        starts_flat > 0, counts[jnp.maximum(starts_flat - 1, 0)], 0
    ).reshape(s_groups.shape)

    n_groups = n_out_pad // (_GROUP * _B)
    # whole tables in SMEM while they fit (fastest); past ~1024 groups the
    # 1 MB SMEM would overflow (observed at a 6.4M-particle doubled run), so
    # large runs swap (8, GROUP) table blocks shared by 8 consecutive groups
    # (the block shape satisfies the (8, .) tiling rule; the kernel picks the
    # row with program_id % 8)
    blocked_tables = n_groups > _BLOCKED_MIN_GROUPS
    if blocked_tables:
        g_pad = ((n_groups + 7) // 8) * 8
        if g_pad != n_groups:
            rel = jnp.pad(rel, ((0, g_pad - n_groups), (0, 0)))
            s_groups = jnp.pad(s_groups, ((0, g_pad - n_groups), (0, 0)))
            c0_groups = jnp.pad(c0_groups, ((0, g_pad - n_groups), (0, 0)))
        table_specs = [
            pl.BlockSpec(
                (8, _GROUP), lambda g, rs: (g // 8, 0), memory_space=pltpu.SMEM
            )
            for _ in range(3)
        ]
    else:
        table_specs = [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(3)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        # r_starts rides as the scalar-prefetch operand: the region input's
        # ELEMENT-offset index map reads it, so the pipeline DMAs each
        # group's region straight out of the dense source table —
        # double-buffered behind the compute, no XLA pre-gather
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=table_specs
        + [
            pl.BlockSpec(
                (pl.Element(d + 1), pl.Element(region)),
                # starts are floored to 128; the hint proves the lane-tiling
                # divisibility Mosaic requires for element offsets
                lambda g, rs: (0, pl.multiple_of(rs[g], 128)),
            ),
        ],
        # 1-D output planes in the caller's own layout (the (n_groups*GROUP,
        # B) row-plane form traced a ~0.94 ms/fire relayout copy at N=1e6;
        # flat planes measured end-to-end neutral but skip the reshape)
        out_specs=[
            pl.BlockSpec((_GROUP * _B,), lambda g, rs: (g,), memory_space=pltpu.VMEM)
            for _ in range(d + 1)
        ],
        scratch_shapes=[pltpu.VMEM((region, d + 1), jnp.float32)],
    )
    outs = pl.pallas_call(
        functools.partial(
            _expand_kernel,
            n_cols=d + 1,
            window=window,
            region=region,
            blocked_tables=blocked_tables,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_out_pad,), jnp.float32) for _ in range(d + 1)
        ],
        grid_spec=grid_spec,
        # XLA likes to pin the separated output planes in VMEM (they fit);
        # allow it — the default 16 MB scoped limit rejects the N=1e6
        # combination even though the chip has plenty. 48 MB, not higher: at
        # very large n (e.g. a particle-doubled 6.4M-cloud run) a generous
        # limit lets XLA pin ~75 MB of output planes and the compile OOMs.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(r_starts, rel, s_groups, c0_groups, win)

    planes = [o[:n] for o in outs[:d]]
    idx = outs[d][:n].astype(jnp.int32)
    return planes, idx


def systematic_expand(
    key: jax.Array | None,
    weights: jax.Array,
    values,
    normalized: bool = False,
    u: jax.Array | None = None,
    interpret: bool | None = None,
):
    """Systematic resample + gather in one fused pass (single lane).

    ``weights``: (N,) log-weights (or probabilities with ``normalized=True``).
    ``values``: one array or a tuple of arrays, each of shape ``(N, ...)`` —
    everything that must be gathered with the ancestor indices (state values,
    APF pre-weights, ...). float32 only.

    Returns ``(resampled_values, indices)`` with ``resampled_values``
    matching the structure of ``values`` and ``indices`` the int32 ancestor
    vector — bit-identical to ``ops.systematic_counts`` + gather.
    """
    w = jnp.asarray(weights)
    if w.ndim != 1:
        raise ValueError("systematic_expand supports a single lane; got batched weights")
    probs = w if normalized else normalize(w, axis=0)
    probs = probs.astype(jnp.float32)
    n = probs.shape[0]
    if n >= 1 << 24:
        raise ValueError("particle count must stay below 2**24 for exact f32 indexing")

    single = not isinstance(values, (tuple, list))
    vals_in = (values,) if single else tuple(values)
    shapes = [v.shape for v in vals_in]
    # plane-major (d, n): free for scalar-event values, and the dense minor
    # dim keeps the pallas operand out of Mosaic's 128-lane padding
    v2d = jnp.concatenate(
        [jnp.asarray(v, jnp.float32).reshape(n, -1).T for v in vals_in], axis=0
    )

    if u is None:
        if key is None:
            raise ValueError("either key or u must be provided")
        u = jax.random.uniform(key, (), dtype=probs.dtype)
    u = jnp.asarray(u, probs.dtype).reshape(())

    counts = _counts_from_probs(probs, u)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    planes, idx = _expand_from_counts(counts, v2d, interpret)

    outs = []
    col = 0
    for v, shape in zip(vals_in, shapes):
        width = 1
        for dim in shape[1:]:
            width *= int(dim)
        block = (
            planes[col]
            if width == 1
            else jnp.stack(planes[col : col + width], axis=-1)
        )
        outs.append(block.reshape(shape).astype(v.dtype))
        col += width
    return (outs[0] if single else tuple(outs)), idx


def _expand_from_counts(counts: jax.Array, v2d: jax.Array, interpret: bool):
    """The expansion core, shared by the single-lane and lane-flattened entry
    points: ``counts`` is any monotone copy-count boundary array over ``n``
    sources and ``n`` output positions. Returns ``(planes, idx)`` with
    ``planes`` PLANE-major, shape ``(d, n)``."""
    n = counts.shape[0]
    gb = _GROUP * _B
    n_out_pad = max(gb, ((n + gb - 1) // gb) * gb)
    n_blocks = n_out_pad // _B

    bounds = jnp.arange(n_blocks + 1, dtype=jnp.int32) * _B
    # Window starts from a STRIDE-strided subsample of count boundaries: with
    # M = #{m : counts[STRIDE*m + STRIDE-1] <= q}, the exact rank
    # r = #{j : counts[j] <= q} satisfies STRIDE*M <= r < STRIDE*M + STRIDE,
    # so STRIDE*M is a STRIDE-aligned window start. One sort-based merge over
    # ~n/STRIDE + n/B keys replaces binary searches over n (20 sequential
    # gather rounds each). The extra bound at n_blocks*B serves double duty:
    # ranks are monotone, so block b's last source is bounded above by the
    # NEXT block's start plus the stride — no second query set needed.
    sub = counts[_STRIDE - 1 :: _STRIDE]
    if sub.shape[0] * bounds.shape[0] <= _RANK_CMP_MAX_PRODUCT:
        # fused compare+reduce beats the sort-based merge until the O(n^2)
        # compare count catches up with O(n log n) sort work (in-scan A/B at
        # N=1e6: merge 0.29 ms vs compare-reduce 0.05 ms; XLA fuses the
        # (n_blocks, n_sub) compare into the reduction without materializing)
        ranks = jnp.sum(
            (sub[None, :] <= bounds[:, None]).astype(jnp.int32), axis=1
        )
    else:
        ranks = jnp.searchsorted(
            sub, bounds, side="right", method="sort"
        ).astype(jnp.int32)
    starts_ext = _STRIDE * ranks
    starts = starts_ext[:n_blocks]
    last_src = jnp.minimum(starts_ext[1:] + _STRIDE, n)
    s_groups = starts.reshape(-1, _GROUP)
    # floor region starts to 128 for the dense lane-dim element offset; the
    # <=64 extra relative offset rides inside the DRIFT slack
    r_starts = (s_groups[:, 0] // 128) * 128
    rel0 = s_groups - r_starts[:, None]
    valid = bounds[:n_blocks] < n

    def make_branch(window: int):
        region0 = (_GROUP - 1 + _DRIFT_BLOCKS) * _B + window
        # round the region up to the transpose chunk
        region = ((region0 + _TCHUNK - 1) // _TCHUNK) * _TCHUNK
        fits = (last_src <= starts + window) & (
            (rel0 + window <= region).reshape(-1)
        )
        ok = jnp.all(fits | ~valid)
        rel = jnp.minimum(rel0, region - window)

        def run(_):
            return _expand_pallas(
                counts, v2d, rel, s_groups, r_starts, n_out_pad, region, window, interpret
            )

        return ok, run

    def fallback(_):
        idx = _invert_counts(counts)
        taken = jnp.take(v2d, idx, axis=1)  # v2d plane-major (d, n)
        return [taken[i] for i in range(v2d.shape[0])], idx

    # narrowest passing tier wins; untaken branches measured free on TPU
    chain = fallback
    for window in reversed(_WINDOWS):
        ok, run = make_branch(window)

        def tier(op, ok=ok, run=run, below=chain):
            return jax.lax.cond(ok, run, below, op)

        chain = tier
    return chain(None)


def _expand_lane_block_kernel(cshift_ref, counts_ref, vals_ref, out_ref, *, d: int):
    """One grid step: ALL outputs for a block of 128 lanes (small-n regime).

    Layout is the package-native one — lanes on the hardware lane axis, the
    particle index on sublanes — so no transposes or flattening feed this
    kernel. Exactness comes from the monotone-counts identities: with
    ``M_j(i) = (counts[j] <= i)`` (per lane),

        ancestor index  idx[i] = sum_j M_j(i)                  (exact f32 ints)
        one-hot         hot_j(i) = (cshift[j] <= i) & ~M_j(i)  (cshift[j] = counts[j-1])

    — and the selected value is copied bit-exactly (select+add, exactly one
    hot row per output position). Accumulation goes straight into the output
    refs: Mosaic cannot legalize fori_loop with wide vector carries.

    cshift_ref/counts_ref: (n_pad, LANE) int32 VMEM — per-lane boundaries,
    ascending; rows >= n are padded with the final boundary n (whose ``M``
    and ``hot`` are identically 0, so the padding contributes nothing).
    vals_ref: (d, n_pad, LANE) f32 VMEM — value planes.
    out_ref: (d + 1, n_pad, LANE) f32 VMEM — expanded planes + idx plane.
    """
    n_pad = counts_ref.shape[0]
    i_grid = jax.lax.broadcasted_iota(jnp.int32, (n_pad, _LANE), 0)
    ones = jnp.ones((n_pad, _LANE), jnp.float32)
    zeros = jnp.zeros((n_pad, _LANE), jnp.float32)

    for dd in range(d + 1):
        out_ref[dd] = zeros

    def chunk(c, _):
        tile_hi = counts_ref[pl.ds(c * 8, 8), :]  # aligned (8, LANE) tiles
        vtiles = [vals_ref[dd, pl.ds(c * 8, 8), :] for dd in range(d)]
        # hot_j = (cshift[j] <= i) & ~(counts[j] <= i) and cshift[j] =
        # counts[j-1], so hot_j = M_{j-1} & ~M_j: the previous row's mask
        # carries through the unrolled loop and only the chunk's FIRST
        # boundary needs a cshift load+compare (the fori_loop body cannot
        # carry the (n_pad, LANE) mask across chunks — wide vector carries
        # don't legalize — so the boundary row re-derives it)
        m_prev = cshift_ref[pl.ds(c * 8, 1), :] <= i_grid  # (n_pad, LANE)
        for k in range(8):
            m = tile_hi[k : k + 1, :] <= i_grid  # (n_pad, LANE)
            hot = m_prev & (~m)
            out_ref[d] += jnp.where(m, ones, zeros)
            for dd in range(d):
                out_ref[dd] += jnp.where(hot, vtiles[dd][k : k + 1, :], zeros)
            m_prev = m
        return 0

    jax.lax.fori_loop(0, n_pad // 8, chunk, 0)


def _expand_lane_band_kernel(
    cshift_ref, counts_ref, vals_ref, lo_ref, out_ref, *, d: int, w_rows: int
):
    """Banded variant of the lane-blocked kernel: each 8-output-row tile
    scans only a ``w_rows`` source window instead of all ``n_pad`` rows.

    The window start ``lo`` (SMEM, per tile x lane-block, 8-aligned) is a
    lower bound valid for EVERY lane in the block (see :func:`_band_tables`):
    all sources below ``lo`` have ``counts <= i`` for every output ``i`` in
    the tile, so the ancestor index is ``lo + #{j in window : counts[j] <= i}``
    and the one-hot row for each output is inside the window. Work drops
    from ``n_pad^2`` to ``n_pad * w_rows`` compare rows per lane block.
    Same exactness argument as :func:`_expand_lane_block_kernel` (one hot
    row per output, select + add).
    """
    n_pad = counts_ref.shape[0]
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 0)
    ones = jnp.ones((8, _LANE), jnp.float32)
    zeros = jnp.zeros((8, _LANE), jnp.float32)

    g = pl.program_id(0)

    def tile(o, _):
        lo = pl.multiple_of(lo_ref[o, g], 8)
        i_tile = 8 * o + iota8  # (8, LANE) output positions
        cwin = counts_ref[pl.ds(lo, w_rows), :]  # (w, LANE)
        vwins = [vals_ref[dd, pl.ds(lo, w_rows), :] for dd in range(d)]
        m_prev = cshift_ref[pl.ds(lo, 1), :] <= i_tile  # counts[lo-1] <= i
        idx_acc = zeros
        val_accs = [zeros] * d
        for k in range(w_rows):
            m = cwin[k : k + 1, :] <= i_tile  # (8, LANE)
            hot = m_prev & (~m)
            idx_acc = idx_acc + jnp.where(m, ones, zeros)
            for dd in range(d):
                val_accs[dd] = val_accs[dd] + jnp.where(
                    hot, vwins[dd][k : k + 1, :], zeros
                )
            m_prev = m
        out_ref[d, pl.ds(pl.multiple_of(o * 8, 8), 8), :] = (
            lo.astype(jnp.float32) + idx_acc
        )
        for dd in range(d):
            out_ref[dd, pl.ds(pl.multiple_of(o * 8, 8), 8), :] = val_accs[dd]
        return 0

    jax.lax.fori_loop(0, n_pad // 8, tile, 0)


def _band_tables(counts_f: jax.Array, n: int, w_rows: int):
    """Source-window starts for the banded kernel + a global fit flag.

    ``counts_f``: (n_pad, l_pad) int32 boundaries, lane-padded by EDGE
    replication (zero-padded lanes would poison the per-block minima).
    For output tile ``o`` (rows ``8o..8o+7``) and 128-lane block ``g``:

    - start: ``lo = 8 * #{m : cmax[8m+7, g] <= 8o}`` where ``cmax`` is the
      per-block lane max — every row below ``lo`` has ``counts <= 8o`` in
      every lane (the STRIDE-subsample rank bound, per-lane-block).
    - fit: every row at/after ``lo + w`` must exceed ``min(8o+7, n-1)`` in
      every lane — checked on the per-block lane min with an ``n+1``
      sentinel row (rows past ``n_pad`` do not exist).

    ``lo`` is clamped to ``n_pad - w`` so the kernel's window load stays in
    bounds; the clamp only moves the window DOWN (rows below the original
    ``lo`` already satisfy ``counts <= i``), and it can only fire when
    ``lo + w`` would overrun ``n_pad``, where no excluded upper rows exist.
    Returns ``(lo (n_tiles, n_blocks) int32, ok scalar bool)``."""
    n_pad, l_pad = counts_f.shape
    nb = l_pad // _LANE
    cb = counts_f.reshape(n_pad, nb, _LANE)
    cmax = cb.max(axis=2)  # (n_pad, nb)
    cmin = cb.min(axis=2)
    n_tiles = n_pad // 8

    q = 8 * jnp.arange(n_tiles, dtype=jnp.int32)  # tile-min output positions
    sub = cmax[7::8]  # (n_tiles, nb) stride-8 subsample of block maxima
    lo = 8 * jnp.sum(
        (sub[None, :, :] <= q[:, None, None]).astype(jnp.int32), axis=1
    )  # (n_tiles, nb)

    sentinel = jnp.full((1, nb), n + 1, cmin.dtype)
    cmin_s = jnp.concatenate([cmin, sentinel], axis=0)
    probe = jnp.take_along_axis(cmin_s, jnp.minimum(lo + w_rows, n_pad), axis=0)
    qmax = jnp.minimum(q + 7, n - 1)[:, None]
    ok = jnp.all(probe > qmax)

    lo = jnp.minimum(lo, n_pad - w_rows)
    return lo, ok


# Source-window tiers for the banded lane kernel (rows; multiples of 8).
_BAND_WINDOWS = (64, 128)
# Banded tiers ON by default: hardware A/B at (N=400, L=1000) measured
# 0.63 -> 0.22 ms/fire (d=1) and 0.56 -> 0.25 (d=2) in-scan, bit-exact vs
# the full-scan kernel; the full-scan kernel remains the fallback whenever
# the window-fit checks fail. Disable per call with ``banded=False``.
_BANDED_LANES_DEFAULT = True


def _expand_lanes_blocked(
    counts_nl: jax.Array, planes: jax.Array, interpret: bool, banded: bool = None
):
    """Lane-blocked expansion: ``counts_nl`` (n, L) per-lane copy-count
    boundaries, ``planes`` (d, n, L) value planes. Returns ((d, n, L)
    expanded planes, (n, L) int32 ancestor indices).

    ``banded``: route through the windowed-source tiers when their span
    checks pass (default: :data:`_BANDED_LANES_DEFAULT`); the full-scan
    kernel remains the universal fallback."""
    d, n, n_lanes = planes.shape
    n_pad = ((n + 7) // 8) * 8
    l_pad = ((n_lanes + _LANE - 1) // _LANE) * _LANE
    if banded is None:
        banded = _BANDED_LANES_DEFAULT

    counts_f = counts_nl.astype(jnp.int32)
    if n_pad != n:
        # pad sources with the final boundary (= n): identically-zero M rows
        counts_f = jnp.concatenate(
            [counts_f, jnp.broadcast_to(counts_f[-1:], (n_pad - n, n_lanes))], axis=0
        )
        planes = jnp.concatenate(
            [planes, jnp.zeros((d, n_pad - n, n_lanes), jnp.float32)], axis=1
        )
    if l_pad != n_lanes:
        # EDGE-replicate pad lanes (their outputs are sliced off either way,
        # but zero-pad would poison the banded prep's per-block lane minima)
        counts_f = jnp.pad(counts_f, ((0, 0), (0, l_pad - n_lanes)), mode="edge")
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, l_pad - n_lanes)))

    cshift = jnp.concatenate(
        [jnp.zeros((1, l_pad), jnp.int32), counts_f[:-1]], axis=0
    )

    out_shape = jax.ShapeDtypeStruct((d + 1, n_pad, l_pad), jnp.float32)
    table_in_specs = [
        pl.BlockSpec((n_pad, _LANE), lambda g: (0, g), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_pad, _LANE), lambda g: (0, g), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, n_pad, _LANE), lambda g: (0, 0, g), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (d + 1, n_pad, _LANE), lambda g: (0, 0, g), memory_space=pltpu.VMEM
    )

    def run_full(_):
        return pl.pallas_call(
            functools.partial(_expand_lane_block_kernel, d=d),
            out_shape=out_shape,
            grid=(l_pad // _LANE,),
            in_specs=table_in_specs,
            out_specs=out_spec,
            interpret=interpret,
        )(cshift, counts_f, planes)

    if banded and n_pad >= _BAND_WINDOWS[0]:

        def make_band_branch(w_rows: int):
            lo, ok = _band_tables(counts_f, n, w_rows)

            def run(_):
                return pl.pallas_call(
                    functools.partial(
                        _expand_lane_band_kernel, d=d, w_rows=w_rows
                    ),
                    out_shape=out_shape,
                    grid=(l_pad // _LANE,),
                    # whole-table SMEM spec: a blocked (n_tiles, 1) view per
                    # grid step fails Mosaic's block-shape divisibility rule;
                    # the kernel indexes its lane-block's column by program_id
                    # (the table is tiny — n_tiles x n_blocks int32)
                    in_specs=table_in_specs
                    + [pl.BlockSpec(memory_space=pltpu.SMEM)],
                    out_specs=out_spec,
                    interpret=interpret,
                )(cshift, counts_f, planes, lo)

            return ok, run

        ok_n, run_n = make_band_branch(_BAND_WINDOWS[0])
        if n_pad >= _BAND_WINDOWS[1]:
            ok_w, run_w = make_band_branch(_BAND_WINDOWS[1])
            out = jax.lax.cond(
                ok_n,
                run_n,
                lambda op: jax.lax.cond(ok_w, run_w, run_full, op),
                None,
            )
        else:
            out = jax.lax.cond(ok_n, run_n, run_full, None)
    else:
        out = run_full(None)

    vals = out[:d, :n, :n_lanes]
    idx = out[d, :n, :n_lanes].astype(jnp.int32)
    return vals, idx


# VMEM budget gate for the lane-blocked kernel: in/out blocks plus the loop
# carries are ~(3d + 4) planes of (n_pad, 128) f32 per grid step.
_LANE_BLOCK_VMEM_BUDGET = 6 * 1024 * 1024


def systematic_expand_lanes(
    key: jax.Array | None,
    weights: jax.Array,
    values,
    normalized: bool = False,
    u: jax.Array | None = None,
    interpret: bool | None = None,
    banded: bool | None = None,
):
    """Lane-batched fused systematic resample + gather.

    ``weights``: ``(N, *batch)`` log-weights (particle axis first, the
    package-wide layout). Each lane resamples independently with its own
    shared uniform — exactly ``ops.systematic_counts`` semantics — but the
    whole batch runs through ONE expansion: lane ``l``'s copy-count
    boundaries are offset by ``l*N``, which keeps the concatenated counts
    array monotone, so the single-lane streaming kernel applies verbatim to
    the ``(L*N,)``-flattened problem. This replaces the per-step XLA
    scatter+gather floor that dominates the nested-SMC re-filters
    (PERF.md; reference hot path resampling.py:24-52 over the lane batch).

    Returns ``(resampled_values, indices)`` with shapes matching the inputs
    (indices are per-lane, in ``[0, N)``).
    """
    w = jnp.asarray(weights)
    if w.ndim < 2:
        raise ValueError("use systematic_expand for single-lane weights")
    probs = w if normalized else normalize(w, axis=0)
    probs = probs.astype(jnp.float32)
    n = probs.shape[0]
    batch_shape = probs.shape[1:]
    n_lanes = 1
    for dim in batch_shape:
        n_lanes *= int(dim)

    single = not isinstance(values, (tuple, list))
    vals_in = (values,) if single else tuple(values)
    shapes = [v.shape for v in vals_in]
    widths = []
    for shape in shapes:
        width = 1
        for dim in shape[1 + len(batch_shape):]:
            width *= int(dim)
        widths.append(width)
    d_total = sum(widths)

    if u is None:
        if key is None:
            raise ValueError("either key or u must be provided")
        u = jax.random.uniform(key, batch_shape, dtype=probs.dtype)
    u = jnp.broadcast_to(jnp.asarray(u, probs.dtype), batch_shape).reshape(n_lanes)

    # per-lane copy-count boundaries in the native (N, L) layout (same
    # arithmetic as ops.systematic_counts — cumsum is layout-invariant, so
    # values match the transposed form bit-for-bit; the final boundary is
    # pinned to n, see _counts_from_probs on u == 1.0). Staying in (N, L)
    # spares two (N, L) transposes per fire on the blocked-kernel path.
    probs_nl = probs.reshape(n, n_lanes)
    cumw = jnp.cumsum(probs_nl, axis=0)
    cumw = cumw.at[-1, :].set(1.0)
    counts_nl = jnp.clip(jnp.ceil(n * cumw - u[None, :]), 0, n).astype(jnp.int32)
    counts_nl = counts_nl.at[-1, :].set(n)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_pad = ((n + 7) // 8) * 8
    if (3 * d_total + 4) * n_pad * 512 <= _LANE_BLOCK_VMEM_BUDGET:
        # small-n regime: the lane-blocked kernel works in the native (N, L)
        # layout — no flattening, no global offsets, lanes on the lane axis
        planes = jnp.concatenate(
            [
                jnp.moveaxis(
                    jnp.asarray(v, jnp.float32).reshape(n, n_lanes, w), 2, 0
                )
                for v, w in zip(vals_in, widths)
            ],
            axis=0,
        )  # (d, n, L)
        out_planes, idx_nl = _expand_lanes_blocked(
            counts_nl, planes, interpret, banded=banded
        )
        idx = idx_nl.reshape((n, *batch_shape))
        outs = []
        col = 0
        for v, shape, w in zip(vals_in, shapes, widths):
            plane = jnp.moveaxis(out_planes[col : col + w], 0, 2)  # (n, L, w)
            outs.append(plane.reshape(shape).astype(v.dtype))
            col += w
        return (outs[0] if single else tuple(outs)), idx

    # large-n regime: flatten lanes into one global monotone counts array and
    # run the windowed streaming kernel on the (L*N,) problem
    if n * n_lanes >= 1 << 24:
        raise ValueError(
            "total particle count must stay below 2**24 for exact f32 indexing"
        )
    flat_rows = []
    for v, w in zip(vals_in, widths):
        v2 = jnp.asarray(v, jnp.float32).reshape((n, n_lanes, w))
        # plane-major (w, L*n): same lane*n + particle ordering as the
        # counts offsets below
        flat_rows.append(v2.transpose(2, 1, 0).reshape(w, n_lanes * n))
    v2d = jnp.concatenate(flat_rows, axis=0)

    offsets = (jnp.arange(n_lanes, dtype=jnp.int32) * n)[:, None]
    counts_global = (counts_nl.T + offsets).reshape(-1)

    planes_out, idx_global = _expand_from_counts(counts_global, v2d, interpret)
    idx = (idx_global.reshape(n_lanes, n) - offsets).T.reshape((n, *batch_shape))

    outs = []
    col = 0
    for v, shape, w in zip(vals_in, shapes, widths):
        lane_first = jnp.stack(
            [p.reshape(n_lanes, n) for p in planes_out[col : col + w]], axis=-1
        )  # (L, n, w)
        back = jnp.moveaxis(lane_first, 0, 1).reshape(shape)
        outs.append(back.astype(v.dtype))
        col += w
    return (outs[0] if single else tuple(outs)), idx
