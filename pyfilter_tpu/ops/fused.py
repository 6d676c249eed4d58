"""Pallas-fused SISR observation step for scalar-state models.

The scan-body of a bootstrap SISR observation step at N=1e6 costs ~2.4 ms/obs
under plain XLA — ~20x the HBM bound — because every sub-step's RNG draw,
drift evaluation and the weight reductions round-trip HBM as separate kernels.
This kernel keeps a block of the particle cloud in VMEM across ALL
``observe_every_step`` propagation sub-steps, the observation log-prob and the
weight update, emitting only per-block partial reductions:

    HBM traffic per observation: read x, w once — write x', w' once.

Scope (checked at trace time): scalar hidden state, affine process with
``Normal(0, s)`` increments (``x' = loc + scale * s * eps``), scalar
observation, no lane axis. Randomness comes from the TPU per-core PRNG
(``pltpu.prng_seed`` / ``prng_random_bits``) with a Box-Muller transform —
streams are decorrelated per (block, sub-step).

The surrounding per-observation logic (ESS gate + resampling + per-step
loglik assembly) stays in XLA: resampling is gather-bound and rare.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..timeseries import TimeseriesState

_ROWS = 64
_LANES = 128
_BLOCK = _ROWS * _LANES  # 8192 particles per grid step

_TWO_PI = 2.0 * math.pi


def _uniform_from_bits(bits):
    # low 23 bits -> (0, 1), strictly positive for the log in Box-Muller.
    # Mask (not shift): the bits carry int32 semantics in-kernel, and an
    # arithmetic shift would sign-extend into negative "uniforms"; uint32
    # casts to float are unsupported in Mosaic.
    masked = pltpu.bitcast(bits, jnp.int32) & jnp.int32(0x7FFFFF)
    return masked.astype(jnp.float32) * (1.0 / (1 << 23)) + (0.5 / (1 << 23))


def _normal_pair(shape):
    u1 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    u2 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _make_kernel(model, n_sub: int, inc_std: float):
    ev = 0

    def kernel(seed_ref, y_ref, t_ref, x_ref, lw_ref, x_out, lw_out, m_out, s_out):
        b = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + b)

        x = x_ref[...]
        t = t_ref[0]

        for s in range(n_sub):
            state = TimeseriesState(t + s, x, ev)
            loc, scale = model.hidden.mean_scale(state)
            eps = _normal_pair(x.shape)
            x = loc + scale * inc_std * eps

        obs_state = TimeseriesState(t + n_sub, x, ev)
        lw_inc = model.build_density(obs_state).log_prob(y_ref[0])
        # NaN/+inf scrub, matching utils.normalize (reference utils.py:57-58)
        bad = jnp.isnan(lw_inc) | (lw_inc == jnp.inf)
        lw_inc = jnp.where(bad, -jnp.inf, lw_inc)

        prev_lw = lw_ref[...]
        new_lw = prev_lw + lw_inc

        x_out[...] = x
        lw_out[...] = new_lw

        # per-block streaming logsumexp pieces of the per-step loglik numerator
        # logsumexp(lw_inc + prev_lw): emit (max, sum exp(v - max)) per block
        v = lw_inc + prev_lw
        m = jnp.max(v)
        m_safe = jnp.maximum(m, -3.0e38)  # all-dead block: avoid inf - inf
        m_out[b, 0] = m_safe
        s_out[b, 0] = jnp.sum(jnp.exp(v - m_safe))

    return kernel


def _supported(model) -> bool:
    hidden = model.hidden
    return (
        getattr(hidden, "event_ndim", None) == 0
        and hasattr(hidden, "mean_scale")
        and hasattr(hidden, "increment_distribution")
        and type(hidden.increment_distribution).__name__ == "Normal"
        and len(model.event_shape) == 0
    )


def fused_propagate_weight_step(model, x, log_w, y, t, seed, n_sub: int):
    """Run ``n_sub`` propagation sub-steps + observation weighting fused in VMEM.

    Returns ``(x_new, log_w_new, step_loglik_numerator)`` where the numerator is
    ``logsumexp(lw_inc + prev_lw)`` (subtract ``logsumexp(prev_lw)`` for the
    per-step loglik).
    """
    if not _supported(model):
        raise ValueError(
            "fused step supports scalar-state affine models with Normal increments "
            "and scalar observations"
        )
    n = x.shape[0]
    if n % _BLOCK != 0:
        raise ValueError(f"particle count must be a multiple of {_BLOCK}")

    inc = model.hidden.increment_distribution
    # the fused path bakes model constants into the kernel: parameters must be
    # concrete (fixed-model filtering/serving — lane-batched inference models
    # are out of scope here anyway)
    try:
        inc_std = float(inc.scale)
    except TypeError as e:
        raise ValueError(
            "fused step requires concrete (non-traced) model parameters"
        ) from e

    rows = n // _LANES
    x2 = x.reshape(rows, _LANES)
    lw2 = log_w.reshape(rows, _LANES)
    grid = rows // _ROWS

    kernel = _make_kernel(model, n_sub, inc_std)

    out_shape = (
        jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),   # x'
        jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),   # lw'
        jax.ShapeDtypeStruct((grid, 1), jnp.float32),        # block max
        jax.ShapeDtypeStruct((grid, 1), jnp.float32),        # block sumexp
    )
    block = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    scalar = pl.BlockSpec(memory_space=pltpu.SMEM)
    # per-block reduction slots: full-array SMEM buffer, each (sequential)
    # grid step writes its own row
    tiny = pl.BlockSpec(memory_space=pltpu.SMEM)

    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    y_arr = jnp.asarray(y, jnp.float32).reshape(1)
    t_arr = jnp.asarray(t, jnp.float32).reshape(1)

    x_new, lw_new, m_blocks, s_blocks = pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=out_shape,
        in_specs=[scalar, scalar, scalar, block, block],
        out_specs=(block, block, tiny, tiny),
    )(seed_arr, y_arr, t_arr, x2, lw2)

    m_blocks = m_blocks[:, 0]
    s_blocks = s_blocks[:, 0]
    m = jnp.max(m_blocks)
    numerator = m + jnp.log(jnp.sum(s_blocks * jnp.exp(m_blocks - m)))

    return x_new.reshape(n), lw_new.reshape(n), numerator


@functools.partial(jax.jit, static_argnums=(0, 2, 5))
def fused_bootstrap_filter(model, y, n_particles: int, key, ess_threshold=0.9, n_sub: int = 1):
    """Full bootstrap-SISR filtering pass with the fused Pallas observation step.

    Semantics match ``SISR(model, N).batch_filter`` for scalar-state models
    with ``nan_strategy`` irrelevant (finite observations): ESS-gated
    systematic resampling (counts-inversion), ``n_sub`` sub-steps per
    observation after the first. ``n_particles`` is rounded up to a whole
    number of kernel blocks. Returns ``(log_likelihood, x_last, lw_last)``.
    """
    from ..ops.resample import systematic_counts
    from ..utils import get_ess, normalize

    # round up to a whole number of kernel blocks (the extra <1% of
    # particles are real particles — the estimator just runs slightly wider)
    n = ((n_particles + _BLOCK - 1) // _BLOCK) * _BLOCK
    k_init, k_seed, k_loop = jax.random.split(key, 3)

    x0 = model.hidden.initial_sample(k_init, (n,)).value.astype(jnp.float32)
    lw0 = jnp.zeros(n, jnp.float32)
    base_seed = jax.random.randint(k_seed, (), 0, 2**31 - 1 - 10**6)

    thresh = ess_threshold * n

    def obs_step(carry, inp):
        x, lw, lse_prev, t = carry
        step_idx, y_t, k = inp

        probs = normalize(lw)
        ess = get_ess(probs, normalized=True)

        def resample(_):
            idx = systematic_counts(k, probs, normalized=True)
            # weights reset to zero -> their logsumexp is log(n)
            return x[idx], jnp.zeros_like(lw), _lse_uniform(n)

        def passthrough(_):
            return x, lw, lse_prev

        x_r, lw_r, lse_r = jax.lax.cond(ess < thresh, resample, passthrough, None)

        seed = base_seed + step_idx * 131071
        x_new, lw_new, numerator = fused_propagate_weight_step(
            model, x_r, lw_r, y_t, t, seed, n_sub
        )
        ll_t = numerator - lse_r
        lse_new = jax.scipy.special.logsumexp(lw_new)
        t_new = t + n_sub
        return (x_new, lw_new, lse_new, t_new), ll_t

    # first observation: single sub-step (initial time already aligned)
    k1, k_rest = jax.random.split(k_loop)
    (x1, lw1, num1) = fused_propagate_weight_step(model, x0, lw0, y[0], 0.0, base_seed - 7, 1)
    ll0 = num1 - _lse_uniform(n)
    lse1 = jax.scipy.special.logsumexp(lw1)

    steps = y.shape[0] - 1
    keys = jax.random.split(k_rest, steps)
    idxs = jnp.arange(1, steps + 1)
    (x_last, lw_last, _, _), lls = jax.lax.scan(
        obs_step, (x1, lw1, lse1, jnp.asarray(1.0, jnp.float32)), (idxs, y[1:], keys)
    )
    return ll0 + jnp.sum(lls), x_last, lw_last


def _lse_uniform(n: int):
    # logsumexp of n zero log-weights
    return jnp.asarray(math.log(n), jnp.float32)
