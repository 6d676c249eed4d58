"""Vectorized d-dimensional Hilbert-curve indexing (Skilling's algorithm).

Support kernel for SQMC (Gerber & Chopin 2015): sequential quasi-Monte-Carlo
needs the particle cloud ordered along a space-filling curve each step so
that the inverse-CDF resampling consumes the low-discrepancy point set in a
locality-preserving order — the property behind SQMC's o(N^-1/2) error rate
(Hilbert specifically; Z-order breaks the theory's Lipschitz sectioning).

Implementation: Skilling (2004, AIP Conf. Proc. 707 "Programming the Hilbert
curve") — axes -> transpose-format Gray-code transform in O(bits * d)
branch-free ``uint32`` bitwise ops over the whole ``(N, d)`` cloud at once
(VPU-friendly; no gathers, no host work). The interleaved Hilbert integer
has ``bits * d`` bits (up to 64), returned as a ``(hi, lo)`` ``uint32`` pair
sorted lexicographically — avoiding any dependence on x64 mode.

No reference counterpart (tingiskhan/pyfilter has no QMC filtering; its QMC
is parameter-space initialization only, inference/qmc.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def _axes_to_transpose(coords, bits: int):
    """Skilling's AxesToTranspose, vectorized: ``coords`` is ``(..., d)``
    uint32 with ``bits`` significant bits per dim; returns the list of d
    transpose-format words."""
    d = coords.shape[-1]
    cols = [coords[..., i].astype(jnp.uint32) for i in range(d)]

    q = 1 << (bits - 1)
    while q > 1:
        p = jnp.uint32(q - 1)
        for i in range(d):
            cond = (cols[i] & q) != 0
            if i == 0:
                # exchange branch is a no-op for i == 0 (t = 0); only invert
                cols[0] = jnp.where(cond, cols[0] ^ p, cols[0])
            else:
                t = jnp.where(cond, jnp.uint32(0), (cols[0] ^ cols[i]) & p)
                cols[0] = jnp.where(cond, cols[0] ^ p, cols[0] ^ t)
                cols[i] = cols[i] ^ t
        q >>= 1

    # Gray encode
    for i in range(1, d):
        cols[i] = cols[i] ^ cols[i - 1]
    t = jnp.zeros_like(cols[0])
    q = 1 << (bits - 1)
    while q > 1:
        t = jnp.where((cols[d - 1] & q) != 0, t ^ jnp.uint32(q - 1), t)
        q >>= 1
    return [c ^ t for c in cols]


def hilbert_keys(coords, bits: int):
    """Hilbert index of integer grid coordinates, as a sortable word pair.

    ``coords``: ``(..., d)`` integer grid positions in ``[0, 2^bits)``;
    requires ``bits * d <= 64`` and ``bits >= 2``. Returns ``(hi, lo)``
    uint32 arrays — the Hilbert integer's high/low words; order
    lexicographically (``jnp.lexsort((lo, hi))``).
    """
    d = coords.shape[-1]
    if bits * d > 64:
        raise ValueError(f"bits*d = {bits * d} exceeds the 64-bit key budget")
    if bits < 2:
        raise ValueError("bits must be >= 2")
    cols = _axes_to_transpose(jnp.asarray(coords), bits)

    hi = jnp.zeros_like(cols[0])
    lo = jnp.zeros_like(cols[0])
    # transpose format: bit q of word i is Hilbert bit q*d + (d-1-i)
    for q in range(bits):
        for i in range(d):
            pos = q * d + (d - 1 - i)
            bit = (cols[i] >> q) & jnp.uint32(1)
            if pos < 32:
                lo = lo | (bit << pos)
            else:
                hi = hi | (bit << (pos - 32))
    return hi, lo


def hilbert_argsort(values, bits: int = None):
    """Permutation ordering a particle cloud along the Hilbert curve.

    ``values``: ``(N, d)`` real states. Each dimension is min-max rescaled
    over the cloud onto the ``2^bits`` grid (the monotone "psi" map of
    Gerber-Chopin §3 — any componentwise-monotone rescale preserves the
    ordering property), then indexed and argsorted. ``bits`` defaults to the
    largest grid fitting the 64-bit key (capped at 16).
    """
    v = jnp.asarray(values)
    if v.ndim == 1:
        # d = 1: the curve is the sorted order itself
        return jnp.argsort(v).astype(jnp.int32)
    d = v.shape[-1]
    if d == 1:
        return jnp.argsort(v[:, 0]).astype(jnp.int32)
    if bits is None:
        bits = min(64 // d, 16)
    span = 1 << bits
    lo_v = jnp.min(v, axis=0)
    hi_v = jnp.max(v, axis=0)
    unit = (v - lo_v) / jnp.maximum(hi_v - lo_v, 1e-30)
    grid = jnp.clip((unit * span).astype(jnp.int32), 0, span - 1).astype(jnp.uint32)
    hi, lo = hilbert_keys(grid, bits)
    return jnp.lexsort((lo, hi)).astype(jnp.int32)
