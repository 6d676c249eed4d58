"""Sequential particle algorithms: the outer layer of nested SMC.

Re-design of the reference's ``pyfilter/inference/sequential/base.py``:
``num_particles`` parameter lanes ride the filter's batch axis; each
observation step runs one jit-compiled filter move over all lanes, and
rejuvenation kernels rebuild the model functionally.

The reference's fit loop (sequential/base.py:93-102) — and round 1 of this
package — synced device to host after every observation to evaluate the
rejuvenation trigger. Here ``fit`` runs jitted **scan chunks** instead: one
compiled ``lax.while_loop`` advances up to ``chunk_size`` observations and
stops ON the first rejuvenation trigger, evaluated device-side from
host-precomputed per-step trigger rows (every thresholder schedule reduces
to an ESS-threshold vector plus a force-boolean vector). The host syncs once
per segment — stop position, trigger flag, ESS rows — rejuvenates when a
trigger fired, and resumes the same compiled scan at the stop position.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import get_ess
from ..base import BaseAlgorithm
from ..logging import TQDMWrapper
from ..state import (
    RunningFilterResult,
    SequentialAlgorithmState,
    scrub_lane_increment,
)


@functools.partial(jax.jit, static_argnames=("n",))
def _split_chain(key, n: int):
    """``n`` sequential ``jax.random.split`` steps in ONE device call —
    bit-identical to the per-step loop's key stream, without paying one
    host->device round-trip per observation (the axon tunnel makes each
    eager split a multi-ms round-trip)."""

    def body(k, _):
        k, sub = jax.random.split(k)
        return k, sub

    return jax.lax.scan(body, key, None, length=n)


@jax.jit
def _chunk_scan(filt, corr, w, ll, ys, keys, lo, hi, thr, force):
    """Advance the filter over steps ``i`` in the traced window ``[lo, hi)``,
    bumping the parameter lane weights, and STOP at the first rejuvenation
    trigger: after each step the body evaluates ``nonfinite | ess < thr[i] |
    force[i]`` (``thr``/``force`` are the host-precomputed per-step trigger
    rows — every thresholder schedule reduces to them). Returns the
    ``(correction, w, log_likelihood)`` carry at the stop position, the
    per-step ESS buffer (plus filter means/variances when the filter records
    moments; rows outside the executed window are zero), the stop index
    (first unexecuted step), and whether a trigger fired.

    Stopping ON the trigger replaces the earlier run-whole-window-then-replay
    protocol, which executed up to a full chunk of discarded post-trigger
    steps per rejuvenation (the carried cloud was already rejuvenation-stale)
    and then re-ran the prefix to recover the carry — measured at roughly a
    third of SMC2's steady-state wall-clock on the flagship config."""
    record_moments = getattr(filt, "record_moments", True)
    chunk = ys.shape[0]

    bufs = (jnp.zeros((chunk,), w.dtype),)
    if record_moments:
        bufs = bufs + (
            jnp.zeros((chunk,) + corr.mean.shape, corr.mean.dtype),
            jnp.zeros((chunk,) + corr.variance.shape, corr.variance.dtype),
        )

    def cond(carry):
        _, i, trig, _ = carry
        return (i < hi) & ~trig

    def body(carry):
        (corr, w, ll), i, _, outs = carry
        new = filt.filter(keys[i], ys[i], corr, first_step=False)
        inc = new.log_likelihood
        w = w + scrub_lane_increment(inc)  # dead lane, not poison (state.py)
        ll = ll + inc
        ess = get_ess(w)
        trig = ~jnp.isfinite(w).all() | (ess < thr[i]) | force[i]
        outs = (outs[0].at[i].set(ess),) + (
            (outs[1].at[i].set(new.mean), outs[2].at[i].set(new.variance))
            if record_moments
            else ()
        )
        return (new, w, ll), i + 1, trig, outs

    carry_out, stop, trig, outs = jax.lax.while_loop(
        cond, body, ((corr, w, ll), lo, jnp.asarray(False), bufs)
    )
    return carry_out, outs, stop, trig


class SequentialParticleAlgorithm(BaseAlgorithm):
    """Reference sequential/base.py:14-102. Wires the filter's lane axis and
    the context's batch shape to the same ``num_particles``."""

    #: subclasses that express their rejuvenation trigger via
    #: :meth:`_chunk_trigger` opt in to the chunked (host-sync-free) fit loop.
    _chunk_supported: bool = False
    #: 128: the while_loop chunk scan prices only EXECUTED steps and stops on
    #: triggers, so larger chunks cost nothing extra on rejuvenations while
    #: halving the per-chunk host syncs (SMC2 flagship: 2.4 s at 16 ->
    #: ~1.7 s at 64 -> 1.38 s; 1.08 s at 128 with stop-at-trigger; 256 flat)
    _default_chunk_size: int = 128
    #: True when ``_chunk_trigger`` translates a *pre-step* condition
    #: ("rejuvenate before step t+1") into an after-step-t event. A trigger
    #: on the final observation then corresponds to a step that never
    #: happens, and the chunked fit must not fire it (the per-step loop
    #: wouldn't).
    _prestep_trigger: bool = False

    def __init__(
        self,
        filter_,
        num_particles: int,
        context=None,
        key=None,
        record_moments: bool = True,
        mesh=None,
        lane_axis: str = "lanes",
        particle_axis: str = None,
    ):
        """``mesh`` (optional, a :class:`jax.sharding.Mesh`): distribute the
        nested SMC over devices — parameter lanes shard over the mesh's
        ``lane_axis`` (embarrassingly parallel filters; the lane count must
        divide evenly) and, when ``particle_axis`` names a second mesh axis,
        each filter's state-particle cloud shards over it (XLA inserts the
        psum/all-gather collectives for the weight reductions and
        resampling). SURVEY.md §2.8/§5.8's new-capability plan.

        COST WARNING — ``record_moments=True`` (the default, matching the
        reference's FilterResult semantics) keeps per-step filter
        means/variances, whose host-list histories exclude SMC2's in-scan
        fused rejuvenation: each rejuvenation then costs a separate dispatch
        plus eager moment gathers. Pass ``record_moments=False`` when you
        only need the posterior (the benchmarks do) — see PERF.md's
        "recording cost cliff" table for the measured difference."""
        super().__init__(filter_, context=context, key=key)

        self.num_particles = int(num_particles)
        self._filter = self._filter.set_batch_shape((self.num_particles,))
        self.context.set_batch_shape((self.num_particles,))
        self.record_moments = record_moments
        self._mesh = mesh
        self._lane_axis = lane_axis if mesh is not None and lane_axis in getattr(mesh, "axis_names", ()) else None
        self._particle_axis = (
            particle_axis
            if mesh is not None and particle_axis in getattr(mesh, "axis_names", ())
            else None
        )

        self._callbacks: List[Callable] = []

    # -- device placement (mesh mode) ------------------------------------------
    def _place_filter(self, filt):
        """Lane-shard the filter's model parameters over the mesh."""
        if self._mesh is None or self._lane_axis is None:
            return filt
        from ...parallel import lane_sharded_filter

        return lane_sharded_filter(filt, self._mesh, lane_axis=self._lane_axis)

    def _place_state(self, state):
        """Shard the running state: particle-indexed leaves on
        (particle_axis, lane_axis), per-lane leaves on lane_axis."""
        if self._mesh is None:
            return state
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ...parallel import shard_filter_state

        state.filter_state.latest_state = shard_filter_state(
            state.filter_state.latest_state,
            self._mesh,
            particle_axis=self._particle_axis,
            lane_axis=self._lane_axis,
            n_lane_dims=1,
        )
        lane_sharding = NamedSharding(self._mesh, P(self._lane_axis))
        state.w = jax.device_put(state.w, lane_sharding)
        state.filter_state.log_likelihood = jax.device_put(
            state.filter_state.log_likelihood, lane_sharding
        )
        return state

    @property
    def particles(self) -> tuple:
        return (self.num_particles,)

    def register_callback(self, callback):
        if callback is None or callback in self._callbacks:
            return
        self._callbacks.append(callback)

    def initialize(self) -> SequentialAlgorithmState:
        """Build the model from the context (registering priors), initialize
        parameters, initialize the filter cloud (reference base.py:51-62)."""
        self.context.set_key(self._next_key())
        self._filter = self._filter.initialize_model(self.context)
        self.context.initialize_parameters()
        # rebuild with the (possibly re-)initialized values
        self._filter = self._filter.initialize_model(self.context)
        self._filter = self._place_filter(self._filter)

        init_state = self._filter.initialize(self._next_key())
        init_weights = jnp.zeros(self.particles)
        state = SequentialAlgorithmState(
            init_weights,
            RunningFilterResult(
                init_state, jnp.zeros(self.particles), record_moments=self.record_moments
            ),
        )
        return self._place_state(state)

    def step(self, y, state: SequentialAlgorithmState) -> SequentialAlgorithmState:
        result = self._step(y, state)
        for cb in self._callbacks:
            cb(self, y, result)
        result.bump_iteration()
        return result

    def _step(self, y, state):
        raise NotImplementedError

    def _filter_step(self, y, state: SequentialAlgorithmState):
        """One jitted filter move over all lanes, appended into the state."""
        correction = self._filter.step(
            self._next_key(),
            y,
            state.filter_state.latest_state,
            first_step=state.current_iteration == 0,
        )
        state.append(correction)
        return state

    def fit(self, y, logging=None, chunk_size: int | None = None) -> SequentialAlgorithmState:
        """Fit the algorithm over ``y``.

        ``chunk_size``: observations advanced per compiled scan before the
        host inspects the rejuvenation triggers (default
        ``_default_chunk_size`` when the algorithm supports chunking and no
        per-step callbacks are registered; pass 1 to force the per-step
        reference-style loop)."""
        logging = logging or TQDMWrapper()
        y = jnp.asarray(y)
        self._plan_buckets(int(y.shape[0]))

        if chunk_size is None:
            chunk_size = (
                self._default_chunk_size
                if self._chunk_supported and not self._callbacks
                else 1
            )

        with logging.initialize(self, y.shape[0]):
            state = self.initialize()
            if chunk_size > 1 and self._chunk_supported and not self._callbacks:
                return self._fit_chunked(y, state, logging, int(chunk_size))
            for yt in y:
                state = self.step(yt, state)
                logging.do_log(state.current_iteration, state)
            # end-of-data health heal: pre-step triggers never fire after the
            # final observation, so a lane that died ON the last step would
            # otherwise survive into the returned state (mirrors the chunked
            # path's exception)
            if getattr(self, "_kernel", None) is not None and not bool(
                np.isfinite(np.asarray(state.w)).all()
            ):
                state = self._do_rejuvenate(state)
            return state

    def _plan_buckets(self, n_total: int):
        """One re-filter bucket for the whole fit: the rejuvenation kernel pads
        every history to the full dataset's power-of-two length, so the masked
        re-filter compiles once per run, not once per bucket."""
        planned = 1 << max(n_total - 1, 0).bit_length()
        for alg in (self, getattr(self, "_first", None), getattr(self, "_second", None)):
            kernel = getattr(alg, "_kernel", None)
            if kernel is not None and hasattr(kernel, "bucket_hint"):
                if kernel.bucket_hint is None or kernel.bucket_hint < planned:
                    kernel.bucket_hint = planned

    # -- chunked fit (host-sync once per chunk) --------------------------------
    def _trigger_rows(self, t0: int, n: int):
        """Per-step trigger rows for global steps ``t0 .. t0+n-1``: an ESS
        threshold vector ``thr`` (rejuvenate after step ``t0+j`` when
        ``ess < thr[j]``) and a boolean ``force`` schedule. Non-finite
        weights always trigger. Every subclass trigger (thresholder
        schedules, NESS's constant, FixedWidthNESS's block schedule) reduces
        to this form, which is what lets the chunk scan stop device-side."""
        raise NotImplementedError

    def _chunk_trigger(self, t0: int, ess, nonfinite) -> Optional[int]:
        """First local index ``j`` such that rejuvenation must run AFTER global
        step ``t0 + j`` (``ess[j]``/``nonfinite[j]`` describe the parameter
        weights after that step), or None. Host-side, NumPy inputs — the
        per-step fit path's view of :meth:`_trigger_rows`."""
        thr, force = self._trigger_rows(t0, len(ess))
        for j, (e, nf) in enumerate(zip(ess, nonfinite)):
            if nf or e < thr[j] or force[j]:
                return j
        return None

    def _do_rejuvenate(self, state):
        """Run the algorithm's rejuvenation kernel and absorb its results
        (shared by SMC2's PMMH kernel and NESS's jitter kernel)."""
        update = self._kernel.update(self._next_key(), self.context, self._filter, state)
        self.context.absorb(update.context)
        self._filter = self._place_filter(update.filter_)
        return self._place_state(update.state)

    def _on_data_consumed(self, state, y_rows):
        """Hook: observations just absorbed into the state (SMC2 history)."""

    def _fit_chunked(self, y, state, logging, chunk: int) -> SequentialAlgorithmState:
        n_total = int(y.shape[0])

        # the first observation runs alone: ``first_step=True`` is a static
        # structural flag (sub-step count), so it cannot live inside the scan
        corr0 = self._filter.step(
            self._next_key(), y[0], state.filter_state.latest_state, first_step=True
        )
        self._on_data_consumed(state, np.asarray(y[0])[None])
        state.append(corr0)
        state.bump_iteration()
        trig = self._chunk_trigger(
            0,
            np.asarray(state.ess[-1])[None],
            np.asarray(~jnp.isfinite(state.w).all())[None],
        )
        if trig is not None and (
            not (self._prestep_trigger and n_total == 1)
            or not bool(np.isfinite(np.asarray(state.w)).all())
        ):
            state = self._do_rejuvenate(state)
        logging.do_log(state.current_iteration, state)

        return self._advance_chunked(y, state, logging, chunk, t=1, offset=0)

    def _continue_chunked(self, y, state, logging, chunk: int):
        """Resume a chunked fit mid-stream (the filter cloud is already past
        its first step): used by :class:`CombinedSequentialParticleAlgorithm`
        when the second algorithm takes over at the switch point. ``y`` is the
        remaining tail; trigger-row step indices restart at 0 — matching the
        per-step path, where the second algorithm's schedule (e.g.
        FixedWidthNESS's block counter) counts its OWN steps from the switch."""
        if int(y.shape[0]) == 0:
            return state
        # the handover boundary: a pre-step trigger before this algorithm's
        # local step 0 is an after-step--1 event in trigger-row coordinates
        trig = self._chunk_trigger(
            -1,
            np.asarray(state.ess[-1])[None],
            np.asarray(~jnp.isfinite(state.w).all())[None],
        )
        if trig is not None:
            state = self._do_rejuvenate(state)
        return self._advance_chunked(y, state, logging, chunk, t=0, offset=0)

    def _advance_chunked(self, y, state, logging, chunk: int, t: int, offset: int):
        """Advance over ``y[t:]`` in compiled stop-at-trigger chunks. Row ``j``
        of a chunk starting at position ``p`` maps to the algorithm-local step
        ``offset + p + j`` in :meth:`_trigger_rows` coordinates."""
        n_total = int(y.shape[0])
        y_host = np.asarray(y)  # one fetch: history rows append host-side

        while t < n_total:
            n_eff = min(chunk, n_total - t)
            ys_c = y[t : t + n_eff]
            if n_eff < chunk:  # static chunk shape: one compile for all chunks
                pad = jnp.broadcast_to(ys_c[-1:], (chunk - n_eff,) + ys_c.shape[1:])
                ys_c = jnp.concatenate([ys_c, pad], axis=0)
            # one split per observation — the same key stream the per-step
            # loop consumes (so both paths are bit-identical up to the first
            # rejuvenation), chained inside a single device call
            self._key, keys = _split_chain(self._key, chunk)
            # trigger rows for this chunk window: row j <-> local step
            # offset + t + j (offset is 0 except mid-stream continuations)
            thr_np, force_np = self._trigger_rows(offset + t, chunk)
            thr = jnp.asarray(np.asarray(thr_np, np.float32))
            force = jnp.asarray(np.asarray(force_np, np.bool_))

            lo = 0
            while lo < n_eff:
                carry = (
                    state.filter_state.latest_state,
                    state.w,
                    state.filter_state.log_likelihood,
                )
                carry_out, outs, stop, trig = _chunk_scan(
                    self._filter,
                    *carry,
                    ys_c,
                    keys,
                    jnp.int32(lo),
                    jnp.int32(n_eff),
                    thr,
                    force,
                )
                # the chunk's single host sync: one batched transfer for the
                # stop position, the trigger flag, and the ESS history rows
                stop_np, trig_np, ess_np = jax.device_get((stop, trig, outs[0]))
                hi = int(stop_np)

                self._absorb_chunk(state, carry_out, outs, lo, hi, ess_np)
                self._on_data_consumed(state, y_host[t : t + (hi - lo)])
                t += hi - lo
                lo = hi
                # a pre-step trigger on the final observation addresses a
                # step that never happens — the per-step loop wouldn't fire
                # it. The HEALTH trigger is the exception: non-finite lane
                # weights must never survive into the returned state, so a
                # dead/NaN lane at the last step still rejuvenates.
                if bool(trig_np) and (
                    not (self._prestep_trigger and t >= n_total)
                    or not bool(np.isfinite(np.asarray(state.w)).all())
                ):
                    state = self._do_rejuvenate(state)
            logging.do_log(state.current_iteration, state)
        return state

    def _absorb_chunk(self, state, carry_out, outs, lo: int, hi: int, ess_np=None):
        """Fold a consumed scan window ``[lo, hi)`` into the running state.
        ``ess_np`` (optional): the already-fetched host copy of the ESS rows —
        appending from it avoids one tiny device dispatch per observation."""
        corr, w, ll = carry_out
        state.w = w
        state.filter_state.latest_state = corr
        state.filter_state.log_likelihood = ll
        ess = outs[0] if ess_np is None else ess_np
        for j in range(lo, hi):
            state.ess.append(ess[j])
        if self.record_moments and len(outs) > 1:
            means, variances = outs[1], outs[2]
            for j in range(lo, hi):
                state.filter_state.filter_means.append(means[j])
                state.filter_state.filter_variances.append(variances[j])
        state.current_iteration += hi - lo


class CombinedSequentialParticleAlgorithm(SequentialParticleAlgorithm):
    """Run one algorithm for the first ``switch`` observations, then another
    (reference sequential/base.py:105-171)."""

    def __init__(
        self,
        filter_,
        num_particles: int,
        switch: int,
        first_kw: Dict[str, Any] = None,
        second_kw: Dict[str, Any] = None,
        context=None,
        key=None,
        **kwargs,
    ):
        """``kwargs`` (``record_moments``, ``mesh``, ``lane_axis``,
        ``particle_axis``, ...) apply to BOTH stages; per-stage
        ``first_kw``/``second_kw`` entries override them."""
        super().__init__(filter_, num_particles, context=context, key=key, **kwargs)

        self._first = self.make_first(
            filter_, self.context, num_particles, **{**kwargs, **(first_kw or {})}
        )
        self._second = self.make_second(
            filter_, self.context, num_particles, **{**kwargs, **(second_kw or {})}
        )
        self._first.set_key(self._next_key())
        self._second.set_key(self._next_key())

        self._when_to_switch = int(switch)
        self._is_switched = False

    def make_first(self, filter_, context, particles, **kwargs) -> SequentialParticleAlgorithm:
        raise NotImplementedError

    def make_second(self, filter_, context, particles, **kwargs) -> SequentialParticleAlgorithm:
        raise NotImplementedError

    def do_on_switch(self, first, second, state):
        raise NotImplementedError

    def initialize(self):
        return self._first.initialize()

    def fit(self, y, logging=None, chunk_size: int | None = None):
        """Chunked hybrid fit: the first algorithm's chunked loop consumes the
        first ``switch + 1`` observations, the switch hands the rebound
        filter/context to the second (whose pre-step trigger is checked at the
        boundary), and the second's chunked loop consumes the tail. Falls back
        to the per-step loop when either stage doesn't support chunking, when
        callbacks are registered, or when ``chunk_size=1`` is forced."""
        chunkable = (
            self._first._chunk_supported
            and self._second._chunk_supported
            and not (self._callbacks or self._first._callbacks or self._second._callbacks)
        )
        if chunk_size is None:
            chunk_size = self._first._default_chunk_size if chunkable else 1
        if not chunkable or int(chunk_size) <= 1:
            return super().fit(y, logging=logging, chunk_size=1)

        logging = logging or TQDMWrapper()
        y = jnp.asarray(y)
        n_total = int(y.shape[0])
        self._plan_buckets(n_total)
        chunk = int(chunk_size)

        with logging.initialize(self, n_total):
            state = self.initialize()
            n1 = min(self._when_to_switch + 1, n_total)
            state = self._first._fit_chunked(y[:n1], state, logging, chunk)
            if n1 < n_total:
                self._is_switched = True
                state = self.do_on_switch(self._first, self._second, state)
                self._second.context = self._first.context
                self._second.filter = self._first.filter
                state = self._second._continue_chunked(y[n1:], state, logging, chunk)
            return state

    def _step(self, y, state):
        if not self._is_switched:
            if state.current_iteration <= self._when_to_switch:
                return self._first._step(y, state)
            self._is_switched = True
            state = self.do_on_switch(self._first, self._second, state)
            # the second algorithm takes over the first's rebound filter/context
            self._second.context = self._first.context
            self._second.filter = self._first.filter
        return self._second._step(y, state)
