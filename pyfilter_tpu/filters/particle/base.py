"""Particle filter base: initialization, particle shapes, smoothing.

JAX re-design of the reference's ``pyfilter/filters/particle/base.py``. The
smoothers run as reverse ``lax.scan`` over the recorded history arrays instead
of Python loops over state objects.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from ... import resampling
from ...ops import systematic_counts
from ...timeseries import TimeseriesState
from ...utils import batched_gather
from ..base import BaseFilter
from ..result import FilterHistory, FilterResult
from ..state import ParticleFilterCorrection
from .proposals import Bootstrap, Proposal


def smoothed_joint_log_likelihood(model, times, smoothed, y, oes: int = 1):
    """Joint log-density of smoothed trajectories under (differentiable)
    model parameters: transition terms from every recorded step, observation
    terms at each ``oes``-th recorded state, initial density on the first —
    averaged over the trajectory axis. Shared by the single-device VI factor
    and ``parallel.spmd_smoothed_log_likelihood``.

    ``smoothed``: ``(T+1, n_trajectories, *lanes, *event)``; ``times``:
    ``(T+1,)`` — broadcast-shaped against the trajectory/lane axes here so
    time-INHOMOGENEOUS models (e.g. ``TrendingOU``, whose ``mean_scale``
    reads ``x.time_index``) see a time per step, not a time per trajectory.
    """
    ev = model.hidden.event_ndim
    # time axis must broadcast against (n_traj, *lanes), not align with it
    t_shaped = jnp.reshape(times, times.shape[:1] + (1,) * (smoothed.ndim - 1 - ev))

    x_tm1 = TimeseriesState(t_shaped[:-1], smoothed[:-1], ev)
    x_t_obs = TimeseriesState(t_shaped[1::oes], smoothed[1::oes], ev)

    hidden_density = model.hidden.build_density(x_tm1)
    obs_density = model.build_density(x_t_obs)

    y = jnp.asarray(y)
    y_event_ndim = len(model.event_shape)
    obs_batch_extra = smoothed.ndim - 1 - ev  # trajectory + lane axes
    y_shaped = y.reshape(
        y.shape[:1] + (1,) * obs_batch_extra + y.shape[1 : 1 + y_event_ndim]
    )

    ll = (
        jnp.sum(hidden_density.log_prob(smoothed[1:]), axis=0)
        + jnp.sum(obs_density.log_prob(y_shaped), axis=0)
        + model.hidden.initial_distribution().log_prob(smoothed[0])
    )
    return jnp.mean(ll, axis=0)


class ParticleFilter(BaseFilter):
    """Abstract base class for particle filters (reference particle/base.py).

    Particle shape is ``(N, *batch_shape)`` — particle axis 0, lane axes after
    (reference particle/base.py:50-62). ``ess_threshold`` is the relative ESS
    below which lanes resample (default 0.9, reference particle/base.py:26,36).
    """

    _config_fields = (
        "record_states",
        "record_intermediary",
        "nan_strategy",
        "batch_shape",
        "model_builder",
        "n_particles",
        "proposal",
        "resampler",
        "ess_threshold",
        "record_moments",
        "fused_resample",
        "differentiable",
    )

    def __init__(
        self,
        model,
        particles: int,
        # default: the search-free counts-inversion systematic resampler
        # (2.3x faster than the search-based one at N=1e6 on TPU; identical
        # up to ULP-level ties — ops/resample.py). Pass
        # ``resampling.systematic`` for the reference-exact variant.
        resampling_method: Union[str, callable] = systematic_counts,
        proposal: Proposal = None,
        ess_threshold: float = 0.9,
        record_states: bool = False,
        record_intermediary: bool = False,
        record_moments: bool = True,
        nan_strategy: str = "skip",
        batch_shape=(),
        # fused Pallas resample+gather (ops/expand.py): None = auto-enable on
        # TPU for large single-lane clouds with a systematic resampler; True
        # forces it (systematic semantics); False disables.
        fused_resample: bool = None,
        # differentiable filtering: carry the Ścibior–Wood stop-gradient
        # ancestor correction through every resample so the marginal
        # log-likelihood is differentiable w.r.t. model parameters with the
        # correct expected gradient (arXiv:2106.10314; PAPERS.md
        # arXiv:2111.01409). Forward values are bit-identical to the default
        # path — the correction is exactly zero-valued.
        differentiable: bool = False,
        # reference-signature aliases (particle/base.py:19-27) for drop-in
        # migration: `resampling=` and `record_intermediary_states=`
        resampling=None,
        record_intermediary_states=None,
    ):
        if resampling is not None:
            resampling_method = resampling
        if record_intermediary_states is not None:
            record_intermediary = bool(record_intermediary_states)
        super().__init__(
            model,
            record_states=record_states,
            record_intermediary=record_intermediary,
            nan_strategy=nan_strategy,
            batch_shape=batch_shape,
        )
        self.n_particles = int(particles)
        self.resampler = (
            getattr(resampling, resampling_method)
            if isinstance(resampling_method, str)
            else resampling_method
        )
        self.proposal = proposal if proposal is not None else Bootstrap()
        self.ess_threshold = float(ess_threshold)
        self.record_moments = record_moments
        self.fused_resample = fused_resample
        self.differentiable = bool(differentiable)

    def _use_fused_resample(self, value: jax.Array) -> bool:
        """Trace-time decision: route the resample+gather through the fused
        Pallas expansion kernel (ops/expand.py — the lane-batched variant when
        ``batch_shape`` is set). f32 clouds only; the auto mode additionally
        requires a TPU backend, the default counts-inversion systematic
        resampler, and a total cloud large enough that the XLA scatter/gather
        floor dominates. An explicit ``resampling.systematic`` (the
        reference-exact search-based variant) is honored as-is — opt in to
        the kernel with ``fused_resample=True``."""
        total = self.n_particles
        for dim in self.batch_shape:
            total *= int(dim)
        if value.dtype != jnp.float32 or total >= 1 << 24:
            return False
        if self.fused_resample is not None:
            return bool(self.fused_resample)
        return (
            jax.default_backend() == "tpu"
            and total >= 16384
            and self.resampler is systematic_counts
        )

    def _fused_resample(self, key, weights, values, normalized: bool = False):
        """Dispatch to the single-lane or lane-batched expansion kernel."""
        from ...ops.expand import systematic_expand, systematic_expand_lanes

        if self.batch_shape:
            return systematic_expand_lanes(key, weights, values, normalized=normalized)
        return systematic_expand(key, weights, values, normalized=normalized)

    def _ancestor_correction(self, log_weights, indices) -> jax.Array:
        """Ścibior–Wood stop-gradient resampling correction (arXiv:2106.10314).

        Returns per-particle log-weight terms that evaluate to exactly 0 but
        carry ``∂ log w̄^{a_i}`` of each output slot's chosen ancestor, so
        gradients of the marginal-likelihood estimator flow through the
        (otherwise non-differentiable) resample. Every downstream use of the
        post-resample weights must include this term — the filters therefore
        also replace the constant ``1/N`` normalized weights with
        ``softmax(correction)`` (same value, live gradient).
        """
        from ...utils import normalize_log

        lw_norm = normalize_log(log_weights)
        gathered = batched_gather(lw_norm, indices, 0)
        # a zero-mass ancestor is never selected except through ULP-level
        # cumsum ties; guard the -inf - (-inf) = nan that would produce
        gathered = jnp.where(jnp.isfinite(gathered), gathered, 0.0)
        return gathered - jax.lax.stop_gradient(gathered)

    # -- reference aliases -----------------------------------------------------
    @property
    def ssm(self):
        """The underlying state-space model (reference ``BaseFilter.ssm``)."""
        return self.model

    # -- shapes --------------------------------------------------------------
    @property
    def particles(self) -> tuple:
        """Full particle shape ``(N, *batch)`` (reference particle/base.py:50-62)."""
        return (self.n_particles, *self.batch_shape)

    @property
    def resample_threshold(self) -> float:
        return self.ess_threshold * self.n_particles

    def increase_particles(self, factor: int) -> "ParticleFilter":
        """New filter with ``factor``× the particles (pure version of reference
        particle/base.py:72-80; a genuine shape change → recompile boundary)."""
        return self.replace(n_particles=int(factor * self.n_particles))

    # -- initialization -------------------------------------------------------
    def initialize(self, key) -> ParticleFilterCorrection:
        """Sample the initial cloud with zero log-weights and identity ancestry
        (reference particle/base.py:87-103)."""
        x = self.model.hidden.initial_sample(key, self.particles)
        dtype = jnp.result_type(x.value, jnp.float32)
        weights = jnp.zeros(self.particles, dtype=dtype)
        prev_inds = jnp.broadcast_to(
            jnp.arange(self.n_particles, dtype=jnp.int32).reshape(
                (self.n_particles,) + (1,) * len(self.batch_shape)
            ),
            self.particles,
        )
        ll = jnp.zeros(self.batch_shape, dtype=dtype)
        return ParticleFilterCorrection.from_weighted_particles(
            x, weights, ll, prev_inds, compute_moments=self.record_moments
        )

    # -- smoothing ------------------------------------------------------------
    def smooth(
        self,
        key,
        states: Union[FilterResult, FilterHistory],
        method: str = "ffbs",
        **kwargs,
    ) -> jax.Array:
        """Sample smoothed trajectories from the recorded filter history
        (reference particle/base.py:105-157). Returns ``(T, N, *batch, *event)``.

        ``method``:

        - "ffbs" — exact forward-filter backward-sampling; O(N·M) per step
          (the reference's algorithm, particle/base.py:105-128).
        - "ffbsi" — rejection-sampling FFBSi (Douc et al. 2011): same law,
          O(N) expected work per step, with an exact streaming fallback for
          capped rejection rounds. Scales to N ≥ 1e5 where "ffbs" cannot.
          kwargs: ``log_density_sup`` (auto-derived for homoscedastic affine
          models), ``max_rounds`` (default 16), ``block`` (fallback block),
          ``n_trajectories`` (smooth M != N trajectories; per-step cost
          scales with M — the realistic configuration at N ≥ 1e6).
        - "fl" — fixed-lag genealogy tracing.
        """
        history = states.states if isinstance(states, FilterResult) else states
        if history is None:
            raise ValueError("smoothing requires record_states=True on the filter")
        method = method.lower()
        if method == "ffbs":
            return self._smooth_ffbs(key, history, **kwargs)
        if method == "ffbsi":
            from .smoothing import ffbsi_smooth

            return ffbsi_smooth(key, self.model, history, self.resampler, **kwargs)
        if method == "fl":
            return self._smooth_fl(history, **kwargs)
        raise NotImplementedError(f"unsupported smoothing method '{method}'")

    def _smooth_ffbs(
        self, key, history: FilterHistory, n_trajectories: int = None
    ) -> jax.Array:
        """Backward-sampling pass (reference particle/base.py:105-128): draw N
        trajectories (or ``n_trajectories``, laneless only); at each step
        reweight particles by ``w_t + log p(x_{t+1}^{(j)} | x_t^{(i)})`` and
        categorically re-select."""
        ev = self.model.hidden.event_ndim
        values = history.values          # (T, N, *batch, *event)
        log_w = history.log_weights      # (T, N, *batch)
        times = history.time_indexes     # (T, ...)

        k_last, k_scan = jax.random.split(key)
        if n_trajectories is None:
            idx_last = self.resampler(k_last, log_w[-1])
        else:
            if log_w.ndim > 2:
                raise ValueError("n_trajectories requires a laneless history")
            from ...resampling import systematic_m

            idx_last = systematic_m(k_last, log_w[-1], int(n_trajectories))
        traj_last = batched_gather(values[-1], idx_last, ev)

        def backward(carry, inp):
            traj_next = carry  # (N, *batch, *event) — smoothed x_{t+1}
            vals_t, lw_t, t_t, k = inp
            state_t = TimeseriesState(t_t, vals_t, ev)
            density = self.model.hidden.build_density(state_t)  # batch (N, *batch)

            # log p(traj_next^(j) | x_t^(i)) for every trajectory j, particle i
            w_state = density.log_prob(
                jnp.expand_dims(traj_next, 1)
            )  # (N_traj, N, *batch)
            weights = lw_t[None] + w_state
            logits = jnp.moveaxis(weights, 1, -1)  # (N_traj, *batch, N)
            idx = jax.random.categorical(k, logits, axis=-1)  # (N_traj, *batch)
            traj_t = batched_gather(vals_t, idx, ev)
            return traj_t, traj_t

        T = values.shape[0]
        if T == 1:
            return traj_last[None]

        keys = jax.random.split(k_scan, T - 1)
        # scan backwards over t = T-2 .. 0
        _, traj_rest = jax.lax.scan(
            backward,
            traj_last,
            (values[:-1], log_w[:-1], times[:-1], keys),
            reverse=True,
        )
        return jnp.concatenate([traj_rest, traj_last[None]], axis=0)

    def _smooth_fl(self, history: FilterHistory) -> jax.Array:
        """Fixed-lag smoothing via genealogy tracing over stored ancestor
        indices (reference particle/base.py:130-146)."""
        ev = self.model.hidden.event_ndim
        values = history.values
        prev_inds = history.prev_indices

        init = jnp.broadcast_to(
            jnp.arange(self.n_particles, dtype=prev_inds.dtype).reshape(
                (self.n_particles,) + (1,) * len(self.batch_shape)
            ),
            self.particles,
        )

        def backward(carry, inp):
            inds = carry
            vals_t, anc_tp1 = inp
            inds = batched_gather(anc_tp1, inds, 0)
            out = batched_gather(vals_t, inds, ev)
            return inds, out

        T = values.shape[0]
        if T == 1:
            return values
        _, rest = jax.lax.scan(
            backward, init, (values[:-1], prev_inds[1:]), reverse=True
        )
        return jnp.concatenate([rest, values[-1][None]], axis=0)

    # -- VI bridge -------------------------------------------------------------
    def smoothed_log_likelihood(
        self, key, y: jax.Array, model=None, smoothing: str = "ffbs", **smooth_kwargs
    ) -> jax.Array:
        """Differentiable joint log-likelihood factor from FFBS-smoothed
        trajectories — the reference's pyro VI bridge
        (particle/base.py:176-229) without pyro: run a stop-gradient filter +
        FFBS pass, then re-evaluate the joint density of the smoothed paths
        under (differentiable) model parameters and average over trajectories.

        Use inside an ELBO: gradients flow through the density evaluations only
        (matching the reference's ``no_grad`` boundary, base.py:184-195).

        ``smoothing="ffbsi"`` swaps the O(N·M) exact backward pass for the
        O(N) rejection sampler (same law — see :meth:`smooth`), so the VI
        factor runs at the particle counts filtering runs at.
        """
        model = self.model if model is None else model
        filt = self.replace(
            model=model,
            record_states=True,
            record_intermediary=model.observe_every_step > 1,
        )

        k_filter, k_smooth = jax.random.split(key)
        result = jax.lax.stop_gradient(filt.batch_filter(k_filter, y))
        smoothed = jax.lax.stop_gradient(
            filt.smooth(k_smooth, result, method=smoothing, **smooth_kwargs)
        )
        times = result.states.time_indexes

        # history spans t = 0..T: transitions from all-but-last, observations
        # at every oes-th recorded state (reference particle/base.py:196-202)
        return smoothed_joint_log_likelihood(
            model, times, smoothed, y, oes=model.observe_every_step
        )
