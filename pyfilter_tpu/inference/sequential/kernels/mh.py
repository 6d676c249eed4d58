"""Particle Metropolis-Hastings rejuvenation kernel for SMC2.

Re-design of the reference's ``pyfilter/inference/sequential/kernels/mh.py``:
resample parameter lanes, fit the proposal MVN, run up to ``num_steps`` PMMH
transitions over the full parsed history, and — when the acceptance rate falls
below 20% — double the state-particle count and re-filter the entire history
(a genuine shape change and hence a deliberate recompile boundary).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ....filters.base import pad_observations
from ....resampling import systematic, systematic_m
from ....utils import normalize
from ...batch.mcmc.proposals import BaseProposal, SymmetricMH
from ...batch.mcmc.utils import _pmmh_transition_body, run_pmmh
from ...context import InferenceContext, QuasiInferenceContext
from ...state import RunningFilterResult, SequentialAlgorithmState, SMC2State
from ...utils import QuasiMultivariateNormal


class TooManyIncreases(Exception):
    pass


@functools.partial(
    jax.jit,
    static_argnames=(
        "proposal",
        "resampler",
        "n_steps",
        "acceptance_threshold",
        "waste_free",
    ),
)
def _jitted_rejuvenate(
    key,
    context,
    w,
    latest_state,
    loglik,
    filt,
    y_padded,
    n_valid,
    qmc_probs,
    proposal,
    resampler,
    n_steps,
    acceptance_threshold,
    waste_free=False,
    filt_m=None,
):
    """The ENTIRE rejuvenation — lane resample, proposal-MVN fit, and all
    ``n_steps`` PMMH transitions with the running-average early abort — as
    one compiled call. The abort condition (mean acceptance below the
    threshold) is a device scalar, so the host only fetches the final
    ``(aborted, rate)`` pair; skipped transitions pass through a scalar
    ``lax.cond`` and cost nothing. Key splits mirror the host-loop tiers
    exactly, so trajectories are bit-compatible with the unfused path.

    ``qmc_probs`` (``(n_steps, B, dim)`` or None): pre-drawn Sobol uniforms
    for quasi contexts — the engine is host state, so the host draws one
    block per rejuvenation and transition ``i`` inverts ``qmc_probs[i]``
    instead of pseudo-random sampling (see ``_pmmh_transition_body``). The
    returned ``n_done`` lets the caller rewind the engine past the draws an
    early abort never consumed."""
    k_resample, key = jax.random.split(key)
    k_r2, k_build = jax.random.split(k_resample)

    shim = SequentialAlgorithmState(w, None)
    dist = proposal.build(context, shim, None, None, key=k_build)

    if waste_free:
        # Dau & Chopin 2022: resample K / (n_steps + 1) chain ROOTS, move
        # only those, and keep every chain state as the new swarm — the same
        # K-lane swarm from (n_steps + 1)x fewer re-filtered lanes per move
        chain_len = n_steps + 1
        k_total = int(w.shape[0])
        m = k_total // chain_len
        idx_m = systematic_m(k_r2, normalize(w), m, normalized=True)
        ctx_step = context.resample(idx_m)
        ctx_step.batch_shape = (m,)  # static aux: the M-lane view
        latest = latest_state.resample(idx_m)
        ll = jnp.take(loglik, idx_m, axis=0)
        w_step = jnp.zeros((m,), w.dtype)
        filt_step = filt_m
        indices = jnp.tile(idx_m, chain_len)
        thetas = [ctx_step.stack_parameters(constrained=False)]
        latests = [latest]
        lls = [ll]
    else:
        indices = resampler(k_r2, normalize(w), normalized=True)
        ctx_step = context.resample(indices)
        latest = latest_state.resample(indices)
        ll = jnp.take(loglik, indices, axis=0)
        w_step = w
        filt_step = filt

    size = () if tuple(dist.batch_shape) else (w_step.shape[0],)

    aborted = jnp.asarray(False)
    avg = jnp.asarray(0.0, jnp.float32)
    n_done = jnp.asarray(0, jnp.int32)
    for i in range(n_steps):
        k_step, key = jax.random.split(key)
        qmc_i = None if qmc_probs is None else qmc_probs[i]

        def active(op, k_step=k_step, qmc_i=qmc_i):
            ctx_i, lat_i, ll_i = op
            _, rate, ctx_o, lat_o, ll_o, _ = _pmmh_transition_body(
                k_step, ctx_i, w_step, lat_i, ll_i, dist, filt_step, y_padded,
                n_valid, proposal, size, False, qmc_prob=qmc_i,
            )
            return (ctx_o, lat_o, ll_o), rate

        def passive(op):
            return op, jnp.asarray(1.0, jnp.float32)

        (ctx_step, latest, ll), rate = jax.lax.cond(
            ~aborted, active, passive, (ctx_step, latest, ll)
        )
        if waste_free:
            thetas.append(ctx_step.stack_parameters(constrained=False))
            latests.append(latest)
            lls.append(ll)
        n_done = n_done + jnp.where(aborted, 0, 1).astype(jnp.int32)
        avg = jnp.where(aborted, avg, (rate + i * avg) / (i + 1))
        aborted = aborted | (avg < acceptance_threshold)

    if waste_free:
        # reconstitute the K-lane swarm: all chain states, equal weights.
        # (After an abort the pass-through steps appended duplicates — the
        # abort path discards the swarm and doubles/re-filters anyway.)
        theta_k = jnp.concatenate(thetas, axis=0)
        ctx_out = context.unstack_parameters(theta_k, constrained=False)
        latest_out = type(latest).lane_concat(latests)
        ll_out = jnp.concatenate(lls, axis=0)
        return indices, ctx_out, latest_out, ll_out, aborted, avg, n_done, key
    return indices, ctx_step, latest, ll, aborted, avg, n_done, key


@functools.partial(jax.jit, static_argnames=("proposal", "resampler"))
def _jitted_rejuvenation_prep(key, context, w, latest_state, loglik, proposal, resampler):
    """Lane resample + proposal-MVN fit as one compiled call.

    Eagerly this is ~20 small device ops (per-parameter takes, weighted
    mean/cov, Cholesky) and each eager dispatch pays the TPU-tunnel latency
    (see utils._run_pmmh_masked_core). The proposal kernel is fit on the
    PRE-resample cloud with the current weights — same order as the eager
    body of :meth:`ParticleMetropolisHastings.update`."""
    k_resample, k_build = jax.random.split(key)
    indices = resampler(k_resample, normalize(w), normalized=True)
    shim = SequentialAlgorithmState(w, None)
    dist = proposal.build(context, shim, None, None, key=k_build)
    new_context = context.resample(indices)
    new_latest = latest_state.resample(indices)
    new_ll = jnp.take(loglik, indices, axis=0)
    return indices, dist, new_context, new_latest, new_ll


class MHUpdate(NamedTuple):
    context: object
    filter_: object
    state: SMC2State


class ParticleMetropolisHastings:
    """Reference mh.py:15-140."""

    def __init__(
        self,
        num_steps: int = 1,
        proposal: BaseProposal = None,
        distance_threshold: float = None,
        acceptance_threshold: float = 0.2,
        max_increases: int = 5,
        resampler=systematic,
        waste_free: bool = False,
    ):
        self._n_steps = int(num_steps)
        self._proposal = proposal or SymmetricMH()
        self._dist_thresh = distance_threshold
        self._is_adaptive = distance_threshold is not None
        self._acceptance_threshold = acceptance_threshold
        self._max_increases = int(max_increases)
        self._increases = 0
        self._resampler = resampler
        #: Dau & Chopin 2022 waste-free rejuvenation: resample
        #: K / (num_steps + 1) chain roots, move those, keep every chain
        #: state as the new swarm. Needs the fused (jit-compatible,
        #: non-adaptive, non-recording) path and K divisible by num_steps+1.
        self.waste_free = bool(waste_free)
        if self.waste_free and self._is_adaptive:
            raise ValueError("waste_free is incompatible with distance_threshold")
        #: when set (SMC2.fit sets it to the padded full-dataset length), every
        #: rejuvenation re-filter uses this single bucket — one XLA compile for
        #: the whole run instead of one per power-of-two history length.
        #: Inactive steps pass through a scalar ``lax.cond``, so over-padding
        #: costs only scan-step overhead.
        self.bucket_hint: int | None = None

    @property
    def proposal(self) -> BaseProposal:
        return self._proposal

    def _bucket_for(self, y) -> int | None:
        if self.bucket_hint is not None and self.bucket_hint >= y.shape[0]:
            return self.bucket_hint
        return None

    def update(self, key, context, filter_, state: SMC2State) -> MHUpdate:
        k_resample, key = jax.random.split(key)

        y_host = state.parsed_data_host
        # bucketed padding (host-side): the history grows every rejuvenation,
        # and a fresh XLA compile per length costs far more than the re-filter
        y_padded, n_valid = pad_observations(y_host, bucket=self._bucket_for(y_host))
        y = jnp.asarray(y_host)

        jit_ok = getattr(self._proposal, "jit_compatible", False)
        fast = type(context) is InferenceContext and jit_ok
        # a quasi context rides the same fused tiers: it is a pytree whose
        # reconstructed in-trace copy carries ``quasi_engine=None`` (the Sobol
        # engine is host state) — candidate uniforms are pre-drawn host-side
        # below and the engine is reattached to the returned context
        quasi_fast = (
            type(context) is QuasiInferenceContext
            and context.quasi_engine is not None
            and jit_ok
        )
        engine = context.quasi_engine if quasi_fast else None
        # state-recording filters cannot take the masked re-filter inside the
        # fused call; they drop to the prep tier (run_pmmh falls back to the
        # full batch_filter internally)
        if self.waste_free and not (
            (fast or quasi_fast)
            and not (filter_.record_states or filter_.record_intermediary)
        ):
            raise ValueError(
                "waste_free rejuvenation requires the fused path: a "
                "jit-compatible proposal, a pytree context, and a "
                "non-recording filter"
            )
        filt_m = None
        if self.waste_free:
            k_total = int(state.w.shape[0])
            chain_len = self._n_steps + 1
            if k_total % chain_len:
                raise ValueError(
                    f"waste_free needs the parameter-particle count "
                    f"({k_total}) divisible by num_steps + 1 ({chain_len})"
                )
            filt_m = filter_.set_batch_shape((k_total // chain_len,))
        if (
            (fast or quasi_fast)
            and not self._is_adaptive
            and not (filter_.record_states or filter_.record_intermediary)
        ):
            qmc_probs = None
            if quasi_fast and getattr(self._proposal, "uses_quasi_engine", False):
                # one Sobol block for all n_steps candidate draws, in the
                # order the eager loop would consume them (step-major)
                n_lanes = int(state.w.shape[0])
                if self.waste_free:
                    n_lanes //= self._n_steps + 1
                qmc_probs = jnp.stack(
                    [engine.sample((n_lanes,)) for _ in range(self._n_steps)]
                )
            # the whole rejuvenation in one dispatch (prep + n_steps
            # transitions + device-side early abort); two scalar fetches total
            indices, new_context, new_latest, new_ll, aborted, rate, n_done, key = (
                _jitted_rejuvenate(
                    key,
                    context,
                    state.w,
                    state.filter_state.latest_state,
                    state.filter_state.log_likelihood,
                    filter_,
                    y_padded,
                    jnp.int32(n_valid),
                    qmc_probs,
                    self._proposal,
                    self._resampler,
                    self._n_steps,
                    float(self._acceptance_threshold),
                    waste_free=self.waste_free,
                    filt_m=filt_m,
                )
            )
            context = new_context
            if quasi_fast:
                context.quasi_engine = engine
            fs = RunningFilterResult(
                new_latest, new_ll, state.filter_state.record_moments
            )
            fs.filter_means = [
                jnp.take(m, indices, axis=0) for m in state.filter_state.filter_means
            ]
            fs.filter_variances = [
                jnp.take(v, indices, axis=0) for v in state.filter_state.filter_variances
            ]
            state.filter_state = fs

            if bool(aborted):
                if qmc_probs is not None:
                    # the abort skipped the remaining transitions; return the
                    # unconsumed Sobol draws so the stream position matches a
                    # step-by-step host loop
                    engine.rewind(
                        (self._n_steps - int(n_done)) * int(qmc_probs.shape[1])
                    )
                return self._increase_states(key, context, filter_, state)

            new_filter = filter_.initialize_model(context)
            state.w = jnp.zeros_like(state.w)
            return MHUpdate(context, new_filter, state)

        if fast or quasi_fast:
            # fused prep: resample + MVN fit in one device call; the recorded
            # moment history (host lists) is gathered eagerly below
            indices, dist, context, new_latest, new_ll = _jitted_rejuvenation_prep(
                k_resample,
                context,
                state.w,
                state.filter_state.latest_state,
                state.filter_state.log_likelihood,
                self._proposal,
                self._resampler,
            )
            if quasi_fast:
                # the in-trace build could not see the host engine: reattach
                # it and promote the fitted MVN back to its QMC-sampled form
                # for the eager transition loop below
                context.quasi_engine = engine
                if getattr(self._proposal, "uses_quasi_engine", False):
                    dist = QuasiMultivariateNormal(
                        engine, dist.loc, scale_tril=dist.scale_tril
                    )
            fs = RunningFilterResult(
                new_latest, new_ll, state.filter_state.record_moments
            )
            fs.filter_means = [
                jnp.take(m, indices, axis=0) for m in state.filter_state.filter_means
            ]
            fs.filter_variances = [
                jnp.take(v, indices, axis=0) for v in state.filter_state.filter_variances
            ]
            state.filter_state = fs
        else:
            indices = self._resampler(
                k_resample, state.normalized_weights(), normalized=True
            )
            k_build, key = jax.random.split(key)
            dist = self._proposal.build(context, state, filter_, y, key=k_build)

            context = context.resample(indices)
            state.filter_state = state.filter_state.resample(indices)

        size = () if tuple(dist.batch_shape) else (filter_.batch_shape[0],)

        # NB: the adaptive early stop is inspired by nchopin/particles
        # (reference mh.py:66)
        old_params = (
            context.stack_parameters(constrained=False) if self._is_adaptive else None
        )

        previous_distance = 0.0
        acceptance_rate = 0.0
        for i in range(self._n_steps):
            k_step, key = jax.random.split(key)
            step = run_pmmh(
                k_step,
                context,
                state,
                self._proposal,
                dist,
                filter_,
                y,
                size=size,
                mutate_kernel=False,
                y_padded=y_padded,
                n_valid=n_valid,
            )
            context = step.context
            state.filter_state = step.filter_state

            rate = (
                float(step.accept_rate)
                if step.accept_rate is not None
                else float(jnp.mean(step.accepted.astype(jnp.float32)))
            )
            acceptance_rate = (rate + i * acceptance_rate) / (i + 1)

            # abort early to avoid wasting compute (reference mh.py:90-91)
            if acceptance_rate < self._acceptance_threshold:
                return self._increase_states(key, context, filter_, state)

            if not self._is_adaptive:
                continue

            new_params = context.stack_parameters(constrained=False)
            distance = float(
                jnp.mean(jnp.max(jnp.abs(new_params - old_params), axis=0))
            )
            if abs(distance - previous_distance) <= self._dist_thresh * previous_distance:
                break
            previous_distance = distance

        new_filter = filter_.initialize_model(context)
        state.w = jnp.zeros_like(state.w)
        return MHUpdate(context, new_filter, state)

    def double_after_abort(self, key, context, filter_, state: SMC2State) -> MHUpdate:
        """Host-side continuation of an IN-SCAN rejuvenation that aborted on
        low acceptance (``smc2._chunk_scan_rejuvenating``): the scan already
        applied the lane resample and the completed transitions; doubling the
        state-particle count is a shape change only the host can perform.
        ``key`` is the kernel's evolved key out of the aborted move — the
        same key the segmented path hands to the doubling."""
        return self._increase_states(key, context, filter_, state)

    def _increase_states(self, key, context, filter_, state: SMC2State) -> MHUpdate:
        """Double the state-particle count and re-filter the whole history
        (reference mh.py:110-140)."""
        self._increases += 1
        if self._increases > self._max_increases:
            raise TooManyIncreases(f"Configuration only allows {self._max_increases}!")

        new_filter = filter_.initialize_model(context).increase_particles(2)

        y_host = state.parsed_data_host
        if (
            new_filter.record_states
            or new_filter.record_intermediary
            or state.filter_state.record_moments
        ):
            # the doubled filter replaces the whole running result, so any
            # recorded history (states / intermediaries / moments) must be
            # regenerated — only the full batch_filter produces it. Increases
            # change the particle shape and force a recompile anyway, so the
            # bucketed masked fast path buys nothing here.
            new_res = new_filter.batch_filter(key, jnp.asarray(y_host))
        else:
            y_padded, n_valid = pad_observations(y_host, bucket=self._bucket_for(y_host))
            new_res = new_filter.batch_filter_masked(key, y_padded, n_valid)
        weight = new_res.log_likelihood - state.filter_state.log_likelihood

        new_state = SMC2State(
            weight,
            RunningFilterResult.from_filter_result(
                new_res, record_moments=state.filter_state.record_moments
            ),
            parsed_data=state.parsed_data,
        )
        new_state.ess = state.ess
        new_state.current_iteration = state.current_iteration
        return MHUpdate(context, new_filter, new_state)
