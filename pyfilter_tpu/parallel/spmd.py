"""Explicit-SPMD particle filtering: the whole scan under ONE ``shard_map``.

The GSPMD path (`parallel.sharding`) lets XLA insert collectives from
sharding annotations; its resample branch lowers to full-cloud all-gathers
(proven in tests/test_parallel.py's HLO assertions) — O(N) per device per
fire. This module is the scaling-tier filter: the filter scan runs inside
``shard_map`` with the explicit collective layer — ``psum`` weight
reductions and the halo-exchange systematic resampler
(:func:`..collective.distributed_systematic`, O(halo * N/P) per fire with
an all-gather fallback for degenerate weights). Per-device noise streams
are decorrelated by folding the axis index into the keys, so the law is the
standard bootstrap filter at global N.

This is the path to 1e8+ particles: memory O(N/P) per device, steady-state
communication O(1) scalars (two psums), resample communication O(halo*N/P).

Smoothing scales the same way: :func:`spmd_smooth` runs FFBS over a recorded
sharded history with a Gumbel-max distributed categorical — O(M) scalars of
communication per backward step for M trajectories, never O(N).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .collective import (
    distributed_log_likelihood,
    distributed_metropolis,
    distributed_systematic,
    psum_normalize,
)


def _substeps(model, k_sub, x, lw, n_sub: int, record: bool):
    """Advance ``n_sub`` hidden sub-steps; with ``record`` each sub-step's
    ``(values, log_weights, time)`` is collected so the history carries one
    entry per TRANSITION (the single-device ``record_intermediary`` layout —
    what FFBS smoothing under ``observe_every_step > 1`` needs). The
    non-recording path keeps the fused ``propagate_substeps`` fast path
    (law-equal, different key consumption)."""
    if not n_sub:
        return x, []
    if not record:
        return model.hidden.propagate_substeps(k_sub, x, n_sub), []
    subs = []
    for k in jax.random.split(k_sub, n_sub):
        x = model.hidden.propagate(k, x)
        subs.append((x.value, lw, x.time_index))
    return x, subs


def _hist_block(subs, x, lw):
    """Stack sub-step records + the corrected state into one ``(n_sub + 1,
    n_local, ...)`` history block (time axis leading inside the step)."""
    parts = subs + [(x.value, lw, x.time_index)]
    return tuple(jnp.stack(leaves) for leaves in zip(*parts))


def spmd_filter_loop(
    model,
    n_particles: int,
    key,
    y,
    axis_name: str = "particles",
    ess_threshold: float = 0.9,
    halo: int = 1,
    proposal=None,
    resampler: str = "systematic",
    metropolis_iters: int = 32,
    filter_type: str = "sisr",
    record_history: bool = False,
):
    """The per-device filter body (call inside ``shard_map``): init + scan of
    ESS-gated SISR steps — or APF steps with ``filter_type="apf"`` — over the
    local particle shard.

    ``proposal`` (default Bootstrap): any per-particle-LOCAL proposal — one
    whose ``sample_and_weight`` touches only ``prediction.get_timeseries_state()``
    (Bootstrap, LinearGaussianObservations). Proposals that collapse the
    cloud through its weights need global moments and cannot ride
    ``proposal=``; the Gaussian particle filter is available as
    ``filter_type="gpf"`` instead (psum'd moments).

    ``resampler``: ``"systematic"`` (halo exchange + all-gather fallback,
    exact law) or ``"metropolis"`` (communication-local: ``2*halo`` ppermutes,
    zero reductions in the resample itself, approximately multinomial —
    ``collective.local_metropolis`` documents the bias trade;
    ``metropolis_iters`` is its chain length).

    ``filter_type="apf"`` runs the auxiliary particle filter step
    (filters/particle/apf.py semantics): pre-weight with ``p(y | E[x])``
    (per-particle local), resample EVERY step on ``pre_w + lw`` pulling the
    values and pre-weights through one distributed resample, propose from the
    resampled cloud, subtract the gathered pre-weights, and add the psum'd
    auxiliary normalizer to the loglik.

    ``filter_type="gpf"`` runs the Gaussian particle filter: the cloud
    collapses to a moment-matched Gaussian of the propagated predictive —
    the global moments are two psums, which is why the Gaussian-approximate
    family needs its own step here instead of riding ``proposal=``.

    Returns ``(final_values, final_log_weights, log_likelihood, means)`` —
    values/weights are the LOCAL shard, loglik and the per-step weighted-mean
    history are replicated. With ``record_history=True`` a fifth element
    ``(values, log_weights, times)`` of per-step shards (for
    :func:`spmd_smooth`'s backward pass) is appended.
    """
    from ..filters.particle.proposals import Bootstrap
    from ..filters.state import ParticleFilterPrediction

    proposal = proposal if proposal is not None else Bootstrap()
    p = jax.lax.axis_size(axis_name)
    dev = jax.lax.axis_index(axis_name)
    n_local = n_particles // p
    oes = int(model.observe_every_step)
    ev = model.hidden.event_ndim

    k_init, k_scan = jax.random.split(key)
    # per-device noise stream: fold the axis index in once at the root
    x0 = model.hidden.initial_sample(jax.random.fold_in(k_init, dev), (n_local,))
    # mark the zero weights device-varying: the scan carry's output side is
    # (per-shard weights), and shard_map's varying-axes check requires the
    # initial carry to match
    lw0 = jax.lax.pcast(jnp.zeros((n_local,), jnp.float32), (axis_name,), to="varying")

    def weighted_mean(probs, value):
        pb = probs.reshape(probs.shape + (1,) * ev)
        return jax.lax.psum(jnp.sum(pb * value, axis=0), axis_name)

    def resample(k_res, lw_, vals):
        if resampler == "metropolis":
            return distributed_metropolis(
                k_res, lw_, vals, axis_name, halo, metropolis_iters
            )
        return distributed_systematic(k_res, lw_, vals, axis_name, halo)

    def step(n_sub, carry, inp):
        x, lw, ll = carry
        k, y_t = inp
        k_res, k_prop = jax.random.split(k)

        probs = psum_normalize(lw, axis_name)
        ess = 1.0 / jax.lax.psum(jnp.sum(jnp.square(probs)), axis_name)

        def do_resample(op):
            vals, lw_ = op
            taken, _ = resample(k_res, lw_, vals)
            return taken, jnp.zeros_like(lw_)

        def passthrough(op):
            return op

        vals, lw = jax.lax.cond(
            ess < ess_threshold * n_particles, do_resample, passthrough, (x.value, lw)
        )
        x = x.copy(values=vals)

        # sub-step to the observation time, then draw the final step through
        # the proposal (== BaseFilter.filter's substep/correct split; the
        # FIRST observation uses n_sub=0 — one transition from t=0, matching
        # BaseFilter.filter's first_step timing)
        k_dev = jax.random.fold_in(k_prop, dev)
        k_sub, k_final = jax.random.split(k_dev)
        x, subs = _substeps(model, k_sub, x, lw, n_sub, record_history)

        def do_correct(op):
            x_, lw_ = op
            shim = ParticleFilterPrediction(
                x_, lw_, psum_normalize(lw_, axis_name), None
            )
            x_new, inc = proposal.sample_and_weight(k_final, model, y_t, shim)
            return x_new, lw_ + inc, distributed_log_likelihood(inc, lw_, axis_name)

        def do_skip(op):
            # all-NaN observation: propagate from the transition only, zero
            # loglik increment (BaseFilter.filter's NaN skip, filters/base.py)
            x_, lw_ = op
            x_new = model.hidden.propagate(k_final, x_)
            return x_new, lw_, jnp.float32(0.0)

        skip = jnp.all(jnp.isnan(y_t))
        x, lw, inc_ll = jax.lax.cond(skip, do_skip, do_correct, (x, lw))
        ll = ll + inc_ll
        mean = weighted_mean(psum_normalize(lw, axis_name), x.value)
        out = (mean, _hist_block(subs, x, lw)) if record_history else mean
        return (x, lw, ll), out

    def apf_step(n_sub, carry, inp):
        x, lw, ll = carry
        k, y_t = inp
        k_res, k_prop = jax.random.split(k)
        k_dev = jax.random.fold_in(k_prop, dev)
        k_sub, k_final = jax.random.split(k_dev)
        x, subs = _substeps(model, k_sub, x, lw, n_sub, record_history)

        def do_correct(op):
            x_, lw_ = op
            # pre-weight with p(y | E[x]) — per-particle local (apf.py:38)
            pre_w = proposal.pre_weight(model, y_t, x_)
            probs_prev = psum_normalize(lw_, axis_name)
            (vals, prew_res), _ = resample(k_res, pre_w + lw_, (x_.value, pre_w))
            x_ = x_.copy(values=vals)

            zeros = jnp.zeros_like(lw_)
            shim = ParticleFilterPrediction(x_, zeros, zeros + 1.0 / n_particles, None)
            x_new, inc = proposal.sample_and_weight(k_final, model, y_t, shim)
            w = inc - prew_res  # subtract the gathered pre-weights (apf.py:61)

            # aux normalizer: log sum_prev(prev_probs * exp(pre_w)) across shards
            aux = jnp.log(
                jax.lax.psum(jnp.sum(probs_prev * jnp.exp(pre_w)), axis_name)
            )
            return x_new, w, distributed_log_likelihood(w, zeros, axis_name) + aux

        def do_skip(op):
            x_, lw_ = op
            return model.hidden.propagate(k_final, x_), lw_, jnp.float32(0.0)

        skip = jnp.all(jnp.isnan(y_t))
        x, lw, inc_ll = jax.lax.cond(skip, do_skip, do_correct, (x, lw))
        ll = ll + inc_ll
        mean = weighted_mean(psum_normalize(lw, axis_name), x.value)
        out = (mean, _hist_block(subs, x, lw)) if record_history else mean
        return (x, lw, ll), out

    def gpf_step(n_sub, carry, inp):
        # Gaussian particle filter (filters/particle/gpf.py semantics): no
        # resampling; the cloud collapses to a moment-matched Gaussian of the
        # propagated predictive — the moments are the ONLY cross-particle
        # statistic, and they are two psums
        from ..distributions import MultivariateNormal, Normal, robust_cholesky

        x, lw, ll = carry
        k, y_t = inp
        k_dev = jax.random.fold_in(k, dev)
        k_sub, k_prop, k_sample = jax.random.split(k_dev, 3)
        x, subs = _substeps(model, k_sub, x, lw, n_sub, record_history)

        x_prop = model.hidden.propagate(k_prop, x)

        def do_correct(_):
            # moments + collapse only on real observations — a skip step
            # would otherwise still pay the two psums and the Cholesky
            probs = psum_normalize(lw, axis_name)
            pb = probs.reshape(probs.shape + (1,) * ev)
            mean = jax.lax.psum(jnp.sum(pb * x_prop.value, axis=0), axis_name)
            if ev == 0:
                var = jax.lax.psum(
                    jnp.sum(probs * jnp.square(x_prop.value - mean), axis=0), axis_name
                )
                predictive = Normal(mean, jnp.sqrt(var))
            else:
                centered = x_prop.value - mean
                cov = jax.lax.psum(
                    jnp.einsum("n,ni,nj->ij", probs, centered, centered), axis_name
                )
                predictive = MultivariateNormal(mean, scale_tril=robust_cholesky(cov))
            x_vals = predictive.expand((n_local,)).sample(k_sample)
            x_new = x_prop.copy(values=x_vals)
            w = model.build_density(x_new).log_prob(y_t)
            return x_new, w, distributed_log_likelihood(w, jnp.zeros_like(w), axis_name)

        def do_skip(_):
            # all-NaN observation: keep the propagated cloud and weights
            return x_prop, lw, jnp.float32(0.0)

        skip = jnp.all(jnp.isnan(y_t))
        x, lw, inc_ll = jax.lax.cond(skip, do_skip, do_correct, None)
        ll = ll + inc_ll
        mean_f = weighted_mean(psum_normalize(lw, axis_name), x.value)
        out = (mean_f, (x.value, lw, x.time_index)) if record_history else mean_f
        return (x, lw, ll), out

    bodies = {"sisr": step, "apf": apf_step, "gpf": gpf_step}
    body = bodies[filter_type]
    body_rest = functools.partial(body, oes - 1)

    keys = jax.random.split(k_scan, y.shape[0])
    carry0 = (x0, lw0, jnp.float32(0.0))
    if oes > 1:
        # the first observation is corrected after ONE transition from t=0
        # (BaseFilter.filter's first_step timing) — peel it out of the scan
        carry1, out_first = body(0, carry0, (keys[0], y[0]))
        (x, lw, ll), outs_rest = jax.lax.scan(body_rest, carry1, (keys[1:], y[1:]))
        if record_history:
            # history blocks have different per-step widths (1 vs oes):
            # flatten the scan blocks over time and splice the pieces
            mean_first, hist_first = out_first
            means_rest, hist_rest = outs_rest
            means = jnp.concatenate([mean_first[None], means_rest], axis=0)
            hist = tuple(
                jnp.concatenate([f, r.reshape((-1,) + r.shape[2:])], axis=0)
                for f, r in zip(hist_first, hist_rest)
            )
            outs = (means, hist)
        else:
            outs = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a[None], b], axis=0), out_first, outs_rest
            )
    else:
        (x, lw, ll), outs = jax.lax.scan(body_rest, carry0, (keys, y))
        if record_history:
            # oes == 1: per-step blocks are (1, n_local, ...) — drop the width
            means, hist = outs
            outs = (means, tuple(h.reshape((-1,) + h.shape[2:]) for h in hist))
    if record_history:
        means, (h_vals, h_lws, h_times) = outs
        # prepend the initial state: the history spans every TRANSITION
        # (t = 0..T*oes-ish; length 2 + (T-1)*oes for sub-stepped models),
        # exactly as the single-device record_states(+record_intermediary)
        # layout does (FilterHistory includes the init)
        history = (
            jnp.concatenate([x0.value[None], h_vals], axis=0),
            jnp.concatenate([lw0[None], h_lws], axis=0),
            jnp.concatenate([jnp.reshape(x0.time_index, (1,)).astype(h_times.dtype), h_times]),
        )
        return x.value, lw, ll, means, history
    return x.value, lw, ll, outs


def spmd_batch_filter(
    model,
    n_particles: int,
    key,
    y,
    mesh: Mesh,
    axis_name: str = "particles",
    ess_threshold: float = 0.9,
    halo: int = 1,
    proposal=None,
    resampler: str = "systematic",
    metropolis_iters: int = 32,
    filter_type: str = "sisr",
    record_history: bool = False,
):
    """Full filtering pass with explicit collectives — ESS-gated SISR by
    default, the auxiliary particle filter with ``filter_type="apf"``
    (default Bootstrap proposal; any per-particle-local proposal works — see
    :func:`spmd_filter_loop`).

    ``n_particles`` is the GLOBAL particle count (must divide the mesh axis).
    Returns ``(values, log_weights, log_likelihood, filter_means)`` with
    values/weights sharded over ``axis_name``; ``record_history=True``
    appends the per-step ``(values, log_weights, times)`` history (time-major,
    particle axis sharded) consumed by :func:`spmd_smooth`.
    """
    p = mesh.shape[axis_name]
    if n_particles % p:
        raise ValueError(f"n_particles {n_particles} must divide mesh axis size {p}")

    f = _jitted_spmd_filter(
        mesh, axis_name, int(n_particles), float(ess_threshold), int(halo),
        proposal, resampler, int(metropolis_iters), filter_type, bool(record_history),
    )
    return f(model, key, jnp.asarray(y))


@functools.lru_cache(maxsize=None)
def _jitted_spmd_filter(
    mesh, axis_name, n_particles, ess_threshold, halo,
    proposal, resampler, metropolis_iters, filter_type, record_history,
):
    """One compiled executable per (mesh, static config): the MODEL rides in
    as a replicated pytree ARGUMENT, so parameter updates never recompile
    (the repo-wide invariant; proposals hash structurally for the same
    reason). Re-invoking with the same config and new parameters is a cache
    hit."""

    def run(model, key, y):
        return spmd_filter_loop(
            model, n_particles, key, y,
            axis_name=axis_name, ess_threshold=ess_threshold, halo=halo,
            proposal=proposal, resampler=resampler,
            metropolis_iters=metropolis_iters, filter_type=filter_type,
            record_history=record_history,
        )

    out_specs = (P(axis_name), P(axis_name), P(), P())
    if record_history:
        out_specs = out_specs + ((P(None, axis_name), P(None, axis_name), P()),)
    return jax.jit(
        shard_map(run, mesh=mesh, in_specs=(P(), P(), P()), out_specs=out_specs)
    )


def spmd_ffbs_loop(model, n_trajectories: int, key, vals, lws, times, axis_name: str):
    """Backward-sampling pass over a particle-sharded filter history (call
    inside ``shard_map``; the public entry is :func:`spmd_smooth`).

    The ``n_trajectories`` smoothed states stay REPLICATED while the cloud
    stays sharded: each backward step computes local reweighting logits
    ``lw_t + log p(traj_{t+1} | x_t)`` on its shard and re-selects ancestors
    with :func:`..collective.distributed_categorical` (Gumbel-max + pmax) and
    :func:`..collective.distributed_take_rows` (psum select) — O(M) scalars
    of communication per step, never O(N). Single-device semantics:
    filters/particle/base.py:_smooth_ffbs (reference particle/base.py:105-128).
    """
    from ..timeseries import TimeseriesState
    from .collective import distributed_categorical, distributed_take_rows

    ev = model.hidden.event_ndim
    m = n_trajectories
    k_last, k_scan = jax.random.split(key)

    logits_last = jnp.broadcast_to(lws[-1][None, :], (m,) + lws[-1].shape)
    idx_last = distributed_categorical(k_last, logits_last, axis_name)
    traj_last = distributed_take_rows(vals[-1], idx_last, axis_name)  # (M, *ev)

    def backward(carry, inp):
        traj_next = carry
        vals_t, lw_t, t_t, k = inp
        state_t = TimeseriesState(t_t, vals_t, ev)
        density = model.hidden.build_density(state_t)  # batch (n_local,)
        w_state = density.log_prob(jnp.expand_dims(traj_next, 1))  # (M, n_local)
        idx = distributed_categorical(k, lw_t[None] + w_state, axis_name)
        traj_t = distributed_take_rows(vals_t, idx, axis_name)
        return traj_t, traj_t

    t = vals.shape[0]
    if t == 1:
        return traj_last[None]
    keys = jax.random.split(k_scan, t - 1)
    _, rest = jax.lax.scan(
        backward, traj_last, (vals[:-1], lws[:-1], times[:-1], keys), reverse=True
    )
    return jnp.concatenate([rest, traj_last[None]], axis=0)


def spmd_ffbsi_loop(
    model, n_trajectories: int, key, vals, lws, times, axis_name: str, log_sup,
    max_rounds: int = 32,
):
    """Rejection-FFBSi backward pass over a particle-sharded history (the
    distributed twin of ``filters.particle.smoothing.ffbsi_smooth``).

    Per backward step and rejection round: candidates are drawn from a
    UNIFORM proposal over the GLOBAL particle index — a replicated
    ``randint``, no cumulative weights, no per-device mass prefix, no
    searchsorted — and accepted with the weight-corrected probability
    ``(w_i / max w) · p(target | x_i) / sup p``, which leaves the accepted
    law exactly ``∝ w_i p(target | x_i)``. The ONLY communication per round
    is the two psum row-selects (candidate values O(M·event) and candidate
    log-weights O(M) — the same ``distributed_take_rows`` the exact pass
    uses); the max-weight shift is one pmax per step. Acceptance is
    replicated O(M) density work. Compute per round is O(M) against the
    exact pass's O(M · n_local) per step; the exact Gumbel-max pass remains
    as the capped-rounds fallback (executed only when a slot fails), so the
    law is exact.
    """
    from ..timeseries import TimeseriesState
    from .collective import distributed_categorical, distributed_take_rows

    ev = model.hidden.event_ndim
    m = n_trajectories
    p = jax.lax.axis_size(axis_name)
    n_local = vals.shape[1]

    k_last, k_scan = jax.random.split(key)
    logits_last = jnp.broadcast_to(lws[-1][None, :], (m,) + lws[-1].shape)
    idx_last = distributed_categorical(k_last, logits_last, axis_name)
    traj_last = distributed_take_rows(vals[-1], idx_last, axis_name)

    def backward(traj_next, inp):
        vals_t, lw_t, t_t, k = inp
        # log(w_i / max w) with the GLOBAL max — one pmax per step
        lw_shift = lw_t - jax.lax.pmax(jnp.max(lw_t), axis_name)

        k_rounds, k_fb = jax.random.split(k)

        def round_body(state):
            idx, accepted, rk, r = state
            rk, kc, ka = jax.random.split(rk, 3)
            # replicated keys => identical candidates on every device
            gidx = jax.random.randint(kc, (m,), 0, p * n_local, dtype=jnp.int32)
            x_c = distributed_take_rows(vals_t, gidx, axis_name)  # (m, *event)
            lw_c = distributed_take_rows(lw_shift, gidx, axis_name)  # (m,)
            lp = model.hidden.build_density(
                TimeseriesState(t_t, x_c, ev)
            ).log_prob(traj_next)
            log_u = jnp.log(jax.random.uniform(ka, (m,), lp.dtype))
            acc = (~accepted) & (log_u < lw_c + lp - log_sup)
            return jnp.where(acc, gidx, idx), accepted | acc, rk, r + 1

        def round_cond(state):
            _, accepted, _, r = state
            return (~jnp.all(accepted)) & (r < max_rounds)

        idx, accepted, _, _ = jax.lax.while_loop(
            round_cond,
            round_body,
            (jnp.zeros((m,), jnp.int32), jnp.zeros((m,), bool), k_rounds, jnp.int32(0)),
        )

        def fallback(args):
            idx, accepted = args
            density = model.hidden.build_density(TimeseriesState(t_t, vals_t, ev))
            w_state = density.log_prob(jnp.expand_dims(traj_next, 1))  # (m, n_local)
            exact = distributed_categorical(k_fb, lw_t[None] + w_state, axis_name)
            return jnp.where(accepted, idx, exact)

        idx = jax.lax.cond(jnp.all(accepted), lambda a: a[0], fallback, (idx, accepted))
        traj_t = distributed_take_rows(vals_t, idx, axis_name)
        return traj_t, traj_t

    t = vals.shape[0]
    if t == 1:
        return traj_last[None]
    keys = jax.random.split(k_scan, t - 1)
    _, rest = jax.lax.scan(
        backward, traj_last, (vals[:-1], lws[:-1], times[:-1], keys), reverse=True
    )
    return jnp.concatenate([rest, traj_last[None]], axis=0)


def spmd_smooth(
    model,
    key,
    history,
    mesh: Mesh,
    n_trajectories: int = 256,
    axis_name: str = "particles",
    method: str = "ffbs",
    log_density_sup=None,
    max_rounds: int = 32,
):
    """FFBS smoothing of an SPMD filter history
    (``spmd_batch_filter(..., record_history=True)``'s fifth output).

    Returns ``(T, n_trajectories, *event)`` smoothed trajectories,
    replicated. Communication is O(n_trajectories) per backward step (the
    Gumbel-max distributed categorical); compute is the same O(M * N/P)
    density evaluations per device the single-device pass does at O(M * N).

    ``n_trajectories`` deliberately defaults to a modest 256 — unlike the
    single-device ``smooth()``'s M=N: on this path N is huge by design, and
    M=N would build an (N, N/P) per-device logit matrix per backward step.

    ``observe_every_step > 1`` is supported since round 4: the recorded
    history carries one entry per TRANSITION (sub-steps included), so the
    backward density is always a single-step transition.

    ``method="ffbsi"`` swaps the exact O(M · N/P)-per-step backward pass for
    the rejection sampler (:func:`spmd_ffbsi_loop` — uniform proposal with
    weight-corrected acceptance: O(M) compute and communication per round,
    exact fallback on capped rounds);
    ``log_density_sup`` is auto-derived for homoscedastic affine models.
    """
    vals, lws, times = history
    if method == "ffbsi":
        if log_density_sup is None:
            from ..filters.particle.smoothing import transition_log_sup

            log_density_sup = transition_log_sup(model)
        f = _jitted_spmd_ffbsi(mesh, axis_name, int(n_trajectories), int(max_rounds))
        return f(model, key, vals, lws, times, jnp.asarray(log_density_sup))
    if method != "ffbs":
        raise NotImplementedError(f"unsupported spmd smoothing method '{method}'")
    f = _jitted_spmd_smooth(mesh, axis_name, int(n_trajectories))
    return f(model, key, vals, lws, times)


@functools.lru_cache(maxsize=None)
def _jitted_spmd_smooth(mesh, axis_name, n_trajectories):
    """Compiled-once FFBS pass; the model is a replicated pytree argument
    (parameter updates never recompile — see :func:`_jitted_spmd_filter`)."""

    def run(model, key, vals, lws, times):
        return spmd_ffbs_loop(model, n_trajectories, key, vals, lws, times, axis_name)

    return jax.jit(
        shard_map(
            run,
            mesh=mesh,
            in_specs=(P(), P(), P(None, axis_name), P(None, axis_name), P()),
            out_specs=P(),
        )
    )


@functools.lru_cache(maxsize=None)
def _jitted_spmd_ffbsi(mesh, axis_name, n_trajectories, max_rounds):
    def run(model, key, vals, lws, times, log_sup):
        return spmd_ffbsi_loop(
            model, n_trajectories, key, vals, lws, times, axis_name, log_sup,
            max_rounds=max_rounds,
        )

    return jax.jit(
        shard_map(
            run,
            mesh=mesh,
            in_specs=(P(), P(), P(None, axis_name), P(None, axis_name), P(), P()),
            out_specs=P(),
        )
    )


def spmd_predict(
    model,
    key,
    values,
    log_weights,
    n_steps: int,
    mesh: Mesh,
    time_index,
    axis_name: str = "particles",
):
    """K-step-ahead predictive moments from a sharded filter cloud (the SPMD
    analogue of ``Correction.predict_path`` + weighted moments): propagate
    the local shard forward ``n_steps`` (zero communication) and psum the
    per-step weighted mean/variance. Returns ``(means, variances)`` of shape
    ``(n_steps, *event)``, replicated.

    ``time_index`` is REQUIRED — the time the cloud was filtered to (after
    ``spmd_batch_filter`` over ``T`` observations:
    ``T * model.observe_every_step``). Time-inhomogeneous models (e.g.
    ``TrendingOU``) read it in ``mean_scale``; a silent 0 default would
    predict from the wrong epoch."""
    t0 = jnp.asarray(time_index, jnp.float32)
    f = _jitted_spmd_predict(mesh, axis_name, int(n_steps))
    return f(model, key, values, log_weights, t0)


@functools.lru_cache(maxsize=None)
def _jitted_spmd_predict(mesh, axis_name, n_steps):
    from ..timeseries import TimeseriesState

    def run(model, key, values, log_weights, t0):
        dev = jax.lax.axis_index(axis_name)
        ev = model.hidden.event_ndim
        probs = psum_normalize(log_weights, axis_name)
        pb = probs.reshape(probs.shape + (1,) * ev)

        def step(x, k):
            x = model.hidden.propagate(k, x)
            mean = jax.lax.psum(jnp.sum(pb * x.value, axis=0), axis_name)
            var = jax.lax.psum(
                jnp.sum(pb * jnp.square(x.value - mean), axis=0), axis_name
            )
            return x, (mean, var)

        x0 = TimeseriesState(t0, values, ev)
        keys = jax.random.split(jax.random.fold_in(key, dev), n_steps)
        _, (means, variances) = jax.lax.scan(step, x0, keys)
        return means, variances

    return jax.jit(
        shard_map(
            run,
            mesh=mesh,
            in_specs=(P(), P(), P(axis_name), P(axis_name), P()),
            out_specs=(P(), P()),
        )
    )


def spmd_smoothed_log_likelihood(
    model,
    n_particles: int,
    key,
    y,
    mesh: Mesh,
    n_trajectories: int = 256,
    axis_name: str = "particles",
    **filter_kwargs,
):
    """The VI bridge at scale: the differentiable FFBS-smoothed joint
    log-likelihood factor (single-device twin:
    ``ParticleFilter.smoothed_log_likelihood``, reference pyro bridge
    particle/base.py:176-229) with the filtering + smoothing passes sharded
    over the mesh.

    The filter and FFBS run on a stop-gradient copy of the model (the
    reference's ``no_grad`` boundary); the smoothed trajectories come back
    REPLICATED ``(T+1, M, *event)``, so the differentiable density
    re-evaluation is plain local computation — gradients flow through the
    densities only, and the backward pass never touches a collective.
    """
    from ..filters.particle.base import smoothed_joint_log_likelihood

    frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, model)
    k_filter, k_smooth = jax.random.split(key)
    y = jnp.asarray(y)

    *_, history = spmd_batch_filter(
        frozen, n_particles, k_filter, y, mesh,
        axis_name=axis_name, record_history=True, **filter_kwargs,
    )
    history = jax.lax.stop_gradient(history)
    smoothed = jax.lax.stop_gradient(
        spmd_smooth(frozen, k_smooth, history, mesh, n_trajectories, axis_name)
    )
    return smoothed_joint_log_likelihood(
        model, history[2], smoothed, y, oes=int(model.observe_every_step)
    )
