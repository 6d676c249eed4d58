"""Block particle filter — dimension-robust filtering via localized resampling.

Rebeschini & van Handel (2015, Ann. Appl. Prob. 25(5)): partition a
``d``-dimensional state into ``B`` blocks and resample each block
INDEPENDENTLY with weights built from that block's own observation
likelihood. Plain particle filters collapse exponentially in ``d`` (weight
degeneracy); the block filter's error is uniform in the state dimension at
the price of a bias from severing cross-block dependence at block
boundaries — the particle-filter analogue of the LETKF's covariance
localization (see ``filters/etkf.py``).

This is a beyond-reference capability (tingiskhan/pyfilter is particle-global
only; SURVEY.md §2.3) completing the high-dimensional story of the filter
zoo: EnKF/ETKF (Gaussian, localized) and the block PF (non-Gaussian,
localized).

Requirements on the model:

- hidden event rank 1 (a ``(d,)`` state vector). The transition may couple
  blocks arbitrarily — propagation stays joint and exact; only resampling is
  localized.
- the observation density factorizes per component: an ``Independent`` over
  a scalar-batch base (e.g. ``Normal(loc_d, s).to_event(1)``, the
  :class:`~pyfilter_tpu.timeseries.ssm.LinearStateSpaceModel` layout with
  diagonal ``A``), observing each coordinate locally, ``d_y == d``.
  Component ``NaN``s are exactly marginalized (partial observations); a
  block with no observed component skips its resample that step.

TPU mapping: blocks are a trailing reshape axis ``(N, *lanes, B, k)`` — the
per-block weights are one segment reduction, the ``B`` resamples are ONE
lane-batched resampler call (blocks ride the batch axes), and the per-block
gather is a single ``take_along_axis``. With contiguous equal blocks aligned
to a sharded ``d`` axis the whole update partitions block-locally: the only
cross-device traffic in the step is the scalar log-likelihood reduction
(tests/test_block.py asserts the sharded step's HLO carries no all-gather).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from .. import resampling
from ..distributions import Independent
from ..ops import systematic_counts
from ..timeseries import TimeseriesState
from ..utils import normalize
from .result import FilterResult


class BlockPFState(NamedTuple):
    """Carries the (uniformly-weighted, post-block-resample) particle cloud.

    ``values``: ``(N, *lanes, d)``; ``log_likelihood``: running total per
    lane; ``block_ess``: relative ESS per block of the last correct step
    (degeneracy diagnostic — the quantity the blocking keeps bounded away
    from ``1/N`` as ``d`` grows).
    """

    values: jax.Array
    time_index: jax.Array
    log_likelihood: jax.Array
    block_ess: jax.Array

    def get_mean(self):
        return self.values.mean(axis=0)

    def get_variance(self):
        return self.values.var(axis=0)


class BlockParticleFilter:
    """Block particle filter over a :class:`StateSpaceModel`.

    ``block_size`` partitions the ``d`` state components into contiguous
    equal blocks (``d % block_size == 0``); ``blocks`` instead gives an
    explicit permutation-partition as a sequence of equal-length index
    tuples (the state is gathered into that order once per step, so
    non-contiguous neighbourhoods cost one extra gather pair).

    ``block_size=d`` recovers the standard bootstrap filter with
    resample-every-step; ``block_size=1`` is maximal localization (most
    bias, least variance). ``resampling_method`` accepts the same schemes as
    :class:`ParticleFilter` (default: counts-inversion systematic).
    """

    def __init__(
        self,
        model,
        particles: int,
        block_size: Optional[int] = None,
        blocks=None,
        resampling_method: Union[str, callable] = systematic_counts,
        batch_shape=(),
    ):
        self.model = model
        self.n_particles = int(particles)
        self.batch_shape = tuple(int(b) for b in batch_shape)
        self.resampler = (
            getattr(resampling, resampling_method)
            if isinstance(resampling_method, str)
            else resampling_method
        )

        if int(model.hidden.event_ndim) != 1:
            raise ValueError("BlockParticleFilter needs a vector state (event rank 1)")
        d = int(model.hidden.initial_distribution().event_shape[0])
        self.dim = d

        if (block_size is None) == (blocks is None):
            raise ValueError("pass exactly one of block_size / blocks")
        if blocks is not None:
            blocks = tuple(tuple(int(i) for i in b) for b in blocks)
            sizes = {len(b) for b in blocks}
            if len(sizes) != 1:
                raise ValueError("blocks must have equal sizes (static shapes)")
            flat = [i for b in blocks for i in b]
            if sorted(flat) != list(range(d)):
                raise ValueError("blocks must partition range(d)")
            self.block_size = sizes.pop()
            self.n_blocks = len(blocks)
            perm = jnp.asarray(flat, jnp.int32)
            self._perm = perm
            self._inv_perm = jnp.argsort(perm)
        else:
            if d % int(block_size) != 0:
                raise ValueError(f"block_size {block_size} must divide d={d}")
            self.block_size = int(block_size)
            self.n_blocks = d // self.block_size
            self._perm = None
            self._inv_perm = None

    # -- model boundary -------------------------------------------------------
    @property
    def particles(self) -> tuple:
        return (self.n_particles, *self.batch_shape)

    def _component_log_probs(self, x: TimeseriesState, y_t: jax.Array) -> jax.Array:
        """Per-component observation log-probs ``(N, *lanes, d)`` with NaN
        components contributing exactly 0 (partial marginalization —
        the factorized density makes this exact, filters/_masked.py:1)."""
        density = self.model.build_density(x)
        if not (isinstance(density, Independent) and density.reinterpreted_batch_ndims == 1):
            raise ValueError(
                "BlockParticleFilter needs a componentwise-factorized "
                "observation density (Independent with one reinterpreted "
                "batch dim, e.g. Normal(loc, s).to_event(1))"
            )
        y_safe = jnp.where(jnp.isnan(y_t), 0.0, y_t)
        lp = density.base_dist.log_prob(y_safe)  # (N, *lanes, d)
        return jnp.where(jnp.isnan(y_t), 0.0, lp)

    # -- filtering ------------------------------------------------------------
    def initialize(self, key) -> BlockPFState:
        x0 = self.model.hidden.initial_sample(key, self.particles)
        val = jnp.asarray(x0.value, jnp.float32)
        zeros = jnp.zeros(self.batch_shape, val.dtype)
        ess = jnp.ones(self.batch_shape + (self.n_blocks,), val.dtype)
        return BlockPFState(val, jnp.asarray(x0.time_index), zeros, ess)

    def filter(self, key, y_t, state: BlockPFState, n_transitions: int = None) -> BlockPFState:
        """One predict + blockwise correct-resample move."""
        if n_transitions is None:
            n_transitions = int(self.model.observe_every_step)
        k_prop, k_res = jax.random.split(key)

        x = TimeseriesState(state.time_index, state.values, 1)
        x = self.model.hidden.propagate_substeps(k_prop, x, n_transitions)
        vals = jnp.asarray(x.value, jnp.float32)  # (N, *lanes, d)

        y_t = jnp.asarray(y_t, jnp.float32)
        lp = self._component_log_probs(x.copy(values=vals), y_t)

        if self._perm is not None:
            lp = jnp.take(lp, self._perm, axis=-1)
            vals = jnp.take(vals, self._perm, axis=-1)
        nb, k = self.n_blocks, self.block_size

        lead = lp.shape[:-1]  # (N, *lanes)
        lw = jnp.sum(lp.reshape(lead + (nb, k)), axis=-1)  # (N, *lanes, B)

        # block log-likelihood increments: log mean_i exp(lw_b^i); a block
        # with no observed component has lw == 0 identically -> increment 0
        obs_mask = ~jnp.isnan(y_t)
        if self._perm is not None:
            obs_mask = jnp.take(obs_mask, self._perm, axis=-1)
        block_observed = jnp.any(
            obs_mask.reshape(obs_mask.shape[:-1] + (nb, k)), axis=-1
        )  # (*y_lanes?, B) — broadcasts against (*lanes, B)
        inc = jax.scipy.special.logsumexp(lw, axis=0) - jnp.log(
            jnp.asarray(self.n_particles, vals.dtype)
        )  # (*lanes, B)
        inc = jnp.where(block_observed, inc, 0.0)
        ll = state.log_likelihood + jnp.sum(inc, axis=-1)

        # one lane-batched resample across all blocks; unobserved blocks keep
        # their particles (identity indices)
        probs = normalize(lw, axis=0)
        idx = self.resampler(k_res, probs, normalized=True)  # (N, *lanes, B)
        ident = jnp.broadcast_to(
            jnp.arange(self.n_particles, dtype=idx.dtype).reshape(
                (self.n_particles,) + (1,) * (idx.ndim - 1)
            ),
            idx.shape,
        )
        idx = jnp.where(block_observed, idx, ident)

        ess = 1.0 / (
            jnp.sum(jnp.square(probs), axis=0) * self.n_particles
        )  # relative ESS in (0, 1], per block

        blocked = vals.reshape(lead + (nb, k))
        new_vals = jnp.take_along_axis(blocked, idx[..., None], axis=0).reshape(
            lead + (nb * k,)
        )
        if self._inv_perm is not None:
            new_vals = jnp.take(new_vals, self._inv_perm, axis=-1)

        return BlockPFState(new_vals, jnp.asarray(x.time_index), ll, ess)

    def batch_filter(self, key, y, unroll: int = 1) -> FilterResult:
        """Filter a whole sequence in one ``lax.scan``; ``aux`` carries the
        per-step per-block relative ESS ``(T, *lanes, B)``."""
        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 1:
            raise ValueError("block filtering needs vector observations (T, d)")

        k_init, k0, k_scan = jax.random.split(key, 3)
        state1 = self.filter(k0, y[0], self.initialize(k_init), n_transitions=1)
        first = (
            state1.log_likelihood,
            state1.get_mean(),
            state1.get_variance(),
            state1.block_ess,
        )

        def step(carry, inp):
            state, k = carry
            k, k_use = jax.random.split(k)
            new = self.filter(k_use, inp, state)
            step_ll = new.log_likelihood - state.log_likelihood
            return (new, k), (step_ll, new.get_mean(), new.get_variance(), new.block_ess)

        (last, _), rest = jax.lax.scan(step, (state1, k_scan), y[1:], unroll=unroll)
        step_lls, means, variances, ess = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), first, rest
        )
        return FilterResult(
            log_likelihood=last.log_likelihood,
            step_log_likelihoods=step_lls,
            filter_means=means,
            filter_variances=variances,
            latest_state=last,
            states=None,
            aux=ess,
        )
