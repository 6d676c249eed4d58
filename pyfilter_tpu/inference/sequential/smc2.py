"""SMC2 — Chopin et al.'s nested sequential Monte Carlo.

Re-design of the reference's ``pyfilter/inference/sequential/smc2.py``.

On top of the base class's stop-at-trigger chunk scan, SMC2's ``fit`` runs
the rejuvenation INSIDE the compiled scan whenever the PMMH kernel's fused
tier applies (plain pytree context, jit-compatible proposal, no recorded
moments/states, no mesh): the ``lax.while_loop`` body evaluates the trigger
and enters the whole PMMH move — lane resample, proposal-MVN fit,
``num_steps`` masked re-filter transitions, early abort — through a scalar
``lax.cond``, so a rejuvenation no longer costs a scan restart plus a
separate device dispatch (each worth ~20-30 ms of TPU-tunnel latency; the
flagship fit fires 4-6 of them). The scan only stops early when a
rejuvenation aborts on low acceptance, because the particle doubling that
follows is a genuine shape change the host must perform. The rejuvenation
key chain is threaded through the scan carry with the exact splits the
segmented path consumes, so both paths produce identical trajectories.
"""

from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ...filters.base import pad_observations
from ...utils import get_ess
from ..context import InferenceContext
from ..state import SMC2State
from .base import SequentialParticleAlgorithm, _split_chain
from .kernels import ParticleMetropolisHastings
from .kernels.mh import _jitted_rejuvenate
from .threshold import ConstantThreshold, Thresholder


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
def _chunk_scan_rejuvenating(
    filt,
    corr,
    w,
    ll,
    context,
    rej_key,
    ys,
    keys,
    lo,
    hi,
    gstart,
    thr,
    force,
    y_padded,
    proposal,
    resampler,
    n_steps,
    acceptance_threshold,
    waste_free=False,
    filt_m=None,
):
    """The SMC2 chunk scan with the PMMH rejuvenation fused into the loop
    body. Mirrors ``base._chunk_scan``'s contract (stop index, trigger rows,
    per-step ESS buffer) except that a trigger rejuvenates in-trace instead
    of stopping, and the loop stops only when a rejuvenation ABORTS on low
    acceptance (``double`` set — the host then runs the particle doubling).

    ``gstart``: the global observation index of ``ys[0]`` — step ``i``
    re-filters the history ``y_padded[: gstart + i + 1]``.

    ``rej_key`` replays the segmented path's key bookkeeping bit-for-bit:
    each fired rejuvenation advances it by one ``split`` (the algorithm's
    ``_next_key``) and derives the kernel key with the same second split
    ``ParticleMetropolisHastings.update`` performs. ``abort_key`` carries the
    kernel's evolved key out of an aborted move — the segmented path hands
    exactly that key to ``_increase_states``.
    """
    chunk = ys.shape[0]
    ess_buf = jnp.zeros((chunk,), w.dtype)

    def cond(carry):
        _, i, double, _ = carry
        return (i < hi) & ~double

    def body(carry):
        (context, filt, corr, w, ll, rej_key, abort_key), i, _, ess_buf = carry
        new = filt.filter(keys[i], ys[i], corr, first_step=False)
        inc = new.log_likelihood
        w = w + inc
        ll = ll + inc
        ess = get_ess(w)
        ess_buf = ess_buf.at[i].set(ess)
        trig = ~jnp.isfinite(w).all() | (ess < thr[i]) | force[i]

        def rejuv(op):
            context, filt, corr, w, ll, rej_key, _ = op
            rej_key, sub = jax.random.split(rej_key)  # == self._next_key()
            _, k_upd = jax.random.split(sub)  # == mh.update's top-level split
            n_valid = (gstart + i + 1).astype(jnp.int32)
            _, ctx2, lat2, ll2, aborted, _, _, key_out = _jitted_rejuvenate(
                k_upd,
                context,
                w,
                corr,
                ll,
                filt,
                y_padded,
                n_valid,
                None,
                proposal,
                resampler,
                n_steps,
                acceptance_threshold,
                waste_free=waste_free,
                filt_m=filt_m,
            )
            filt2 = filt.initialize_model(ctx2)
            # on abort the kept weights are inert — the doubling recomputes
            # weights from the loglik difference and never reads state.w,
            # matching mh.update's abort exit (which likewise leaves state.w
            # untouched); a completed move resets them to zero
            w2 = jnp.where(aborted, w, jnp.zeros_like(w))
            return (ctx2, filt2, lat2, w2, ll2, rej_key, key_out), aborted

        def noop(op):
            return op, jnp.asarray(False)

        out, double = jax.lax.cond(
            trig, rejuv, noop, (context, filt, new, w, ll, rej_key, abort_key)
        )
        return out, i + 1, double, ess_buf

    carry, stop, double, ess_buf = jax.lax.while_loop(
        cond,
        body,
        ((context, filt, corr, w, ll, rej_key, rej_key), lo, jnp.asarray(False), ess_buf),
    )
    return carry, ess_buf, stop, double


class SMC2(SequentialParticleAlgorithm):
    _chunk_supported = True

    def __init__(
        self,
        filter_,
        particles: int,
        threshold: Union[float, Thresholder] = 0.2,
        kernel=None,
        max_increases: int = 5,
        context=None,
        key=None,
        num_steps: int = 1,
        distance_threshold: float = None,
        waste_free: bool = False,
        **kwargs,
    ):
        super().__init__(filter_, particles, context=context, key=key, **kwargs)

        self._threshold = (
            threshold if isinstance(threshold, Thresholder) else ConstantThreshold(threshold)
        )
        if waste_free and particles % (num_steps + 1):
            raise ValueError(
                f"waste_free needs particles ({particles}) divisible by "
                f"num_steps + 1 ({num_steps + 1})"
            )
        self._kernel = ParticleMetropolisHastings(
            proposal=kernel,
            max_increases=max_increases,
            num_steps=num_steps,
            distance_threshold=distance_threshold,
            waste_free=waste_free,
        )

    @property
    def kernel(self) -> ParticleMetropolisHastings:
        return self._kernel

    def initialize(self) -> SMC2State:
        state = super().initialize()
        return SMC2State(state.w, state.filter_state)

    def _step(self, y, state: SMC2State) -> SMC2State:
        """Reference smc2.py:53-65: append data, filter, accumulate weights,
        rejuvenate when the parameter ESS drops below the threshold or any
        weight goes non-finite. (Per-step reference-style path; ``fit`` uses
        the chunked scan by default — see ``_chunk_trigger``.)"""
        state.append_data(y)
        state = self._filter_step(y, state)

        trig = self._chunk_trigger(
            state.current_iteration,
            [float(state.ess[-1])],
            [bool(~jnp.isfinite(state.w).all())],
        )
        if trig is not None:
            state = self._do_rejuvenate(state)
        return state

    def _trigger_rows(self, t0, n):
        """Rejuvenate after global step ``t0 + j`` when the parameter ESS
        falls below the (scheduled) threshold; non-finite weights always
        trigger (handled by the scan itself)."""
        k = self.num_particles
        thr = np.asarray(
            [self._threshold.get_threshold(t0 + j) * k for j in range(n)], np.float32
        )
        return thr, np.zeros(n, np.bool_)

    def _on_data_consumed(self, state: SMC2State, y_rows):
        # every consumed observation joins the re-filtering history
        for row in y_rows:
            state.append_data(row)

    # -- in-scan rejuvenation (see module docstring) ---------------------------
    def _inline_rejuvenation_ok(self) -> bool:
        """The in-scan rejuvenation needs exactly the PMMH kernel's fused
        tier: a plain pytree context, a traceable proposal, the masked
        re-filter (no recorded states/intermediaries), no recorded moments
        (their histories are host lists gathered eagerly), no adaptive
        distance stop, and no mesh (placement runs host-side)."""
        kernel = self._kernel
        return (
            type(self.context) is InferenceContext
            and getattr(kernel.proposal, "jit_compatible", False)
            and not kernel._is_adaptive
            and not (self._filter.record_states or self._filter.record_intermediary)
            and not self.record_moments
            and self._mesh is None
        )

    def _advance_chunked(self, y, state, logging, chunk: int, t: int, offset: int):
        # the inline path re-filters ``y[: gstart + i + 1]`` on every firing,
        # which is only the true history when ``y`` IS the whole history so
        # far — i.e. no continuation offset AND the parsed rows are exactly
        # ``y[:t]``. A mid-stream continuation (SMC2 as a combined
        # algorithm's second stage) hands a tail slice while
        # ``state.parsed_data`` holds the full history; drop to the segmented
        # path there rather than rejuvenating against a truncated history.
        if (
            offset != 0
            or len(state.parsed_data) != t
            or not self._inline_rejuvenation_ok()
        ):
            return super()._advance_chunked(y, state, logging, chunk, t, offset)

        n_total = int(y.shape[0])
        y_host = np.asarray(y)
        # the rejuvenation history, padded once for the whole fit (the scan
        # masks to ``gstart + i + 1`` valid steps per firing)
        y_padded, _ = pad_observations(y_host, bucket=self._kernel._bucket_for(y_host))
        kernel = self._kernel

        while t < n_total:
            t_base = t
            n_eff = min(chunk, n_total - t)
            ys_c = y[t : t + n_eff]
            if n_eff < chunk:  # static chunk shape: one compile for all chunks
                pad = jnp.broadcast_to(ys_c[-1:], (chunk - n_eff,) + ys_c.shape[1:])
                ys_c = jnp.concatenate([ys_c, pad], axis=0)
            self._key, keys = _split_chain(self._key, chunk)
            thr_np, force_np = self._trigger_rows(t_base, chunk)
            thr = jnp.asarray(np.asarray(thr_np, np.float32))
            force = jnp.asarray(np.asarray(force_np, np.bool_))

            lo = 0
            while lo < n_eff:
                filt_m = (
                    self._filter.set_batch_shape(
                        (self.num_particles // (kernel._n_steps + 1),)
                    )
                    if kernel.waste_free
                    else None
                )
                carry, ess_buf, stop, double = _chunk_scan_rejuvenating(
                    self._filter,
                    state.filter_state.latest_state,
                    state.w,
                    state.filter_state.log_likelihood,
                    self.context,
                    self._key,
                    ys_c,
                    keys,
                    jnp.int32(lo),
                    jnp.int32(n_eff),
                    jnp.int32(t_base),
                    thr,
                    force,
                    y_padded,
                    kernel.proposal,
                    kernel._resampler,
                    kernel._n_steps,
                    float(kernel._acceptance_threshold),
                    waste_free=kernel.waste_free,
                    filt_m=filt_m,
                )
                stop_np, dbl_np, ess_np = jax.device_get((stop, double, ess_buf))
                hi = int(stop_np)

                ctx2, filt2, corr, w, llv, rej_key, abort_key = carry
                self.context.absorb(ctx2)
                self._filter = filt2
                self._key = rej_key
                state.w = w
                state.filter_state.latest_state = corr
                state.filter_state.log_likelihood = llv
                for j in range(lo, hi):
                    state.ess.append(ess_np[j])
                state.current_iteration += hi - lo
                self._on_data_consumed(state, y_host[t : t + (hi - lo)])
                t += hi - lo
                lo = hi
                if bool(dbl_np):
                    # the in-scan move aborted on low acceptance: the particle
                    # doubling is a shape change only the host can perform
                    update = kernel.double_after_abort(
                        abort_key, self.context, self._filter, state
                    )
                    self.context.absorb(update.context)
                    self._filter = update.filter_
                    state = update.state
            logging.do_log(state.current_iteration, state)
        return state
