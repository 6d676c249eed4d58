"""O(N) particle smoothing: rejection-sampling FFBSi and PaRIS.

The classic FFBS backward pass (reference pyfilter/filters/particle/base.py:
105-128, reproduced as ``ParticleFilter._smooth_ffbs``) materializes an
``(N_traj, N)`` transition-density matrix per step — O(N·M) compute and
memory, the one particle path in this framework that could not run at
N ≥ 1e5. This module removes that wall with two scan-native algorithms:

- **Rejection FFBSi** (Douc, Garivier, Moulines & Olsson 2011, "Sequential
  Monte Carlo smoothing for general state space hidden Markov models"),
  with a UNIFORM proposal and weight-corrected acceptance: each trajectory
  draws ancestor candidates ``i ~ Uniform{1..N}`` (a ``randint`` — no
  inverse-CDF, no sort, no cumulative weights anywhere) and accepts with
  probability ``(w_i / max w) · p(x_{t+1} | x_cand) / sup p``, which leaves
  the accepted law exactly ``∝ w_i p(x_{t+1} | x_i)`` — the classic
  weighted-proposal sampler's target. The acceptance rate pays a factor
  ``mean(w) / max(w)`` (≈1 right after a resample, where ESS gating keeps
  weights flat); candidates are so cheap that extra rounds more than cover
  it. A per-model transition-density upper bound comes from
  :func:`transition_log_sup` (homoscedastic affine processes) or an
  explicit ``log_density_sup`` argument.
- **Capped rounds + exact streaming fallback**: after ``max_rounds``
  vectorized rejection rounds the unaccepted slots are completed with an
  EXACT categorical draw via a Gumbel-max argmax streamed over particle
  blocks — O(N·M) compute but O(N·block) memory, and only *executed* (a
  scalar ``lax.cond``) when some slot actually failed. The combined law is
  exact: acceptance within K rounds yields the target conditional law, and
  the fallback is the target law itself.
- **PaRIS** (Olsson & Westerborn 2017, "Efficient particle-based online
  smoothing of additive functionals": the ``N_tilde``-draw backward-sampling
  recursion) — ONLINE smoothing of additive functionals
  ``S_T = h_0(x_0) + Σ_t h(x_{t-1}, x_t)`` with O(1) memory: per-particle
  statistics ride the filter scan, no recorded history at all.

TPU notes: ALL rejection rounds are drawn at once — one ``randint``, one
(R·J) gather, one batched density eval, an argmax for each target's first
acceptance — because sequential full-size rounds wait on straggler targets
(measured wall-clocks live in PERF.md "Round-5 ledger"). The uniform
proposal removes the per-step inverse-CDF sort of ``N + R·J`` keys that
dominated the weighted-proposal variant's backward scan. The exact fallback
streams over particle blocks with static trip counts, selecting failed
slots by ONE argsort per step (slice-indexed passes, no re-sorting).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...distributions import Independent, MultivariateNormal, Normal
from ...timeseries import TimeseriesState
from ...utils import batched_gather

_LOG_2PI = math.log(2.0 * math.pi)


def _max_log_prob(dist):
    """Log of the density's maximum value (the density at its mode).

    Supported analytically for the Gaussian increment families; anything else
    needs an explicit ``log_density_sup`` from the caller.
    """
    if isinstance(dist, Normal):
        return -jnp.log(jnp.asarray(dist.scale)) - 0.5 * _LOG_2PI
    if isinstance(dist, Independent) and isinstance(dist.base_dist, Normal):
        base = dist.base_dist
        per = jnp.broadcast_to(
            -jnp.log(jnp.asarray(base.scale)) - 0.5 * _LOG_2PI, base.batch_shape
        )
        k = dist.reinterpreted_batch_ndims
        return jnp.sum(per, axis=tuple(range(-k, 0))) if k else per
    if isinstance(dist, MultivariateNormal):
        diag = jnp.diagonal(jnp.asarray(dist.scale_tril), axis1=-2, axis2=-1)
        return -0.5 * diag.shape[-1] * _LOG_2PI - jnp.sum(jnp.log(diag), axis=-1)
    raise ValueError(
        f"no analytic density bound for {type(dist).__name__}; "
        "pass log_density_sup explicitly"
    )


def transition_log_sup(model) -> jax.Array:
    """Upper bound on ``log p(x' | x)`` over ALL ``(x, x', t)`` for an
    affine process with state- and time-independent diffusion.

    The transition density is the affine pushforward ``loc(x) + scale · W``
    (timeseries/process.py:157-159); for constant ``scale`` its maximum over
    both arguments is ``max_density(W) / |det scale|``. Homoscedasticity is
    verified by probing ``mean_scale`` at several states and times — a
    state-dependent scale has no generic bound, so the caller must supply
    ``log_density_sup`` (e.g. from the diffusion's known infimum).

    Raises when the process has no ``mean_scale`` (non-affine), when the
    scale is state-/time-dependent, or when the probe values are traced
    (call outside ``jit``, or pass the bound explicitly).
    """
    import numpy as np

    hidden = model.hidden
    if not hasattr(hidden, "mean_scale") or not hasattr(hidden, "increment_distribution"):
        raise ValueError(
            "transition_log_sup needs an affine process (mean_scale + "
            "increment_distribution); pass log_density_sup explicitly"
        )
    ev = int(hidden.event_ndim)
    init = hidden.initial_distribution()
    d = int(init.event_shape[0]) if ev == 1 else 1

    def scale_at(v, t):
        value = jnp.asarray(np.full(d, v, np.float32)) if ev == 1 else jnp.asarray(v, jnp.float32)
        _, scale = hidden.mean_scale(TimeseriesState(jnp.asarray(float(t)), value, ev))
        return np.asarray(scale, np.float64)

    try:
        probes = [scale_at(v, t) for v in (0.0, 0.7, -1.3) for t in (0.0, 1.0, 7.0)]
    except Exception as exc:  # traced parameters (inside jit) land here too
        raise ValueError(
            "could not probe the transition scale (traced parameters?); "
            "pass log_density_sup explicitly"
        ) from exc
    scale0 = probes[0]
    for s in probes[1:]:
        if s.shape != scale0.shape or not np.allclose(s, scale0, rtol=1e-5, atol=1e-7):
            raise ValueError(
                "state- or time-dependent diffusion scale: no generic "
                "transition-density bound; pass log_density_sup explicitly "
                "(e.g. from the scale's known infimum)"
            )

    mlp = _max_log_prob(hidden.increment_distribution)
    s = jnp.asarray(scale0, jnp.float32)
    if s.ndim >= 2 and s.shape[-1] == s.shape[-2] == d:
        logdet = jnp.linalg.slogdet(s)[1]
    else:
        # scalar or elementwise scale, broadcast over the d event dims
        per = jnp.log(jnp.abs(s))
        logdet = d * per if per.ndim == 0 else jnp.sum(
            jnp.broadcast_to(per, per.shape[:-1] + (d,)) if ev == 1 else per, axis=-1
        )
    return jnp.asarray(mlp - logdet, jnp.float32)


def transition_log_sup_traced(model) -> jax.Array:
    """In-trace version of :func:`transition_log_sup` — usable when the
    model's parameters are TRACED (e.g. the current iterate inside
    :func:`~pyfilter_tpu.inference.score.fit_mle_streaming`'s compiled window
    step, where the host-side homoscedasticity probes cannot run).

    The caller is responsible for having validated homoscedasticity ONCE at a
    concrete parameter point (run :func:`transition_log_sup` at θ0 — the
    structural property "scale independent of state/time" does not change
    with parameter values for a fixed model family).
    """
    hidden = model.hidden
    ev = int(hidden.event_ndim)
    init = hidden.initial_distribution()
    d = int(init.event_shape[0]) if ev == 1 else 1
    probe = jnp.zeros((d,)) if ev == 1 else jnp.asarray(0.0)
    _, scale = hidden.mean_scale(TimeseriesState(jnp.asarray(0.0), probe, ev))
    mlp = _max_log_prob(hidden.increment_distribution)
    s = jnp.asarray(scale, jnp.float32)
    if s.ndim >= 2 and s.shape[-1] == s.shape[-2] == d:
        logdet = jnp.linalg.slogdet(s)[1]
    else:
        per = jnp.log(jnp.abs(s))
        logdet = d * per if per.ndim == 0 else jnp.sum(
            jnp.broadcast_to(per, per.shape[:-1] + (d,)) if ev == 1 else per, axis=-1
        )
    return jnp.asarray(mlp - logdet, jnp.float32)


def _streaming_categorical(key, model, vals_t, lw_t, t_t, targets, ev, block):
    """Exact backward-kernel categorical draw per target, Gumbel-max streamed
    over particle blocks: O(N·M) compute, O(N_traj · block) memory."""
    n = vals_t.shape[0]
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    if pad:
        vals_p = jnp.concatenate([vals_t, jnp.broadcast_to(vals_t[:1], (pad,) + vals_t.shape[1:])], 0)
        lw_p = jnp.concatenate([lw_t, jnp.full((pad,) + lw_t.shape[1:], -jnp.inf, lw_t.dtype)], 0)
    else:
        vals_p, lw_p = vals_t, lw_t

    def body(i, carry):
        best_val, best_idx = carry
        sl_v = jax.lax.dynamic_slice_in_dim(vals_p, i * block, block, 0)
        sl_lw = jax.lax.dynamic_slice_in_dim(lw_p, i * block, block, 0)
        density = model.hidden.build_density(TimeseriesState(t_t, sl_v, ev))
        lp = density.log_prob(jnp.expand_dims(targets, 1))  # (J, B, *batch)
        g = jax.random.gumbel(jax.random.fold_in(key, i), lp.shape, lp.dtype)
        tot = sl_lw[None] + lp + g
        mv = jnp.max(tot, axis=1)
        mi = (jnp.argmax(tot, axis=1) + i * block).astype(jnp.int32)
        upd = mv > best_val
        return jnp.where(upd, mv, best_val), jnp.where(upd, mi, best_idx)

    j_shape = targets.shape[: targets.ndim - ev]
    best0 = (jnp.full(j_shape, -jnp.inf, lw_t.dtype), jnp.zeros(j_shape, jnp.int32))
    _, idx = jax.lax.fori_loop(0, n_blocks, body, best0)
    return idx


def backward_indices(
    key,
    model,
    vals_t,
    lw_t,
    t_t,
    targets,
    log_sup,
    max_rounds: int = 16,
    block: int = 64,
    fallback_subset: int | None = None,
    return_violation: bool = False,
):
    """One backward-kernel draw per target: index ``i`` with probability
    ``∝ w_t^i p(target | x_t^i)``.

    Candidates come from a UNIFORM proposal over the N particles with a
    weight-corrected acceptance ``(w_i / max w) · p(target | x_i) / sup p``
    — the accepted law is exactly the weighted target, but drawing a
    candidate is a ``randint`` plus two gathers: no cumulative weights and
    no inverse-CDF sort anywhere (the weighted-proposal variant's per-step
    sort of ``N + R·J`` keys dominated the backward scan on the v5e).

    All ``max_rounds`` rejection rounds are drawn AT ONCE — one ``randint``,
    one ``(R·J)`` gather, one batched density eval — and each target takes
    its FIRST accepted round (an argmax over the round axis). No sequential
    while-loop: straggler targets with low acceptance would otherwise hold
    every slot hostage for tens of full-size rounds (an order-of-magnitude
    wall-clock difference on the v5e; current measured numbers: PERF.md
    "Round-5 ledger").

    Targets with no acceptance among the R rounds are finished EXACTLY by a
    streaming Gumbel-max categorical — when laneless, failed slots are
    ordered first by ONE argsort and fixed in static ``fallback_subset``
    slices (as many passes as there are failures, usually one); over all
    targets at once when lane axes are present. The combined law is exact
    either way.

    ``vals_t``: ``(N, *batch, *event)``; ``lw_t``: ``(N, *batch)`` unnormalized
    log-weights; ``targets``: ``(J, *batch, *event)`` (J may differ from N only
    when there are no lane axes). Returns int32 indices ``(J, *batch)``.

    ``return_violation=True`` additionally returns a scalar bool flagging any
    candidate whose transition density EXCEEDED ``log_sup``: rejection
    sampling silently truncates acceptance "probabilities" above 1, so a bad
    bound (e.g. a state-dependent diffusion that slipped past
    :func:`transition_log_sup`'s homoscedasticity probes) biases the smoother
    with no other signal. Callers surface the flag instead of trusting the
    draw (``ffbsi_smooth`` / ``paris`` poison their output with NaN).
    """
    ev = model.hidden.event_ndim
    j_shape = targets.shape[: targets.ndim - ev]
    j = j_shape[0]
    if j_shape[1:] != lw_t.shape[1:]:
        raise ValueError(f"lane axes mismatch: targets {j_shape} vs weights {lw_t.shape}")
    if j != lw_t.shape[0] and len(j_shape) > 1:
        raise ValueError("J != N requires laneless inputs")

    n = vals_t.shape[0]
    r = int(max_rounds)
    k_prop, k_acc, k_fb = jax.random.split(key, 3)
    lw_shift = lw_t - jnp.max(lw_t, axis=0, keepdims=True)  # log(w_i / max w)

    if r > 0:
        cand = jax.random.randint(k_prop, (r,) + j_shape, 0, n, dtype=jnp.int32)
        flat = cand.reshape((r * j,) + j_shape[1:])
        if len(j_shape) == 1 and ev <= 1:
            # ONE packed gather instead of separate value and weight gathers:
            # random gathers are the backward step's dominant traffic, and
            # fetching the (value..., lw) row contiguously halves the gather
            # count (measured ~1.7x on the standalone gather pair at
            # R·J=1.6e6 from a 1e5 cloud on the v5e)
            vals2d = vals_t if ev == 1 else vals_t[:, None]
            packed = jnp.concatenate([vals2d, lw_shift[:, None]], axis=-1)
            g = jnp.take(packed, flat, axis=0).reshape((r, j, -1))
            x_c = g[..., :-1] if ev == 1 else g[..., 0]
            lw_c = g[..., -1]
        else:
            # NOTE the same packing was built and measured for the
            # lane-batched path (take_along_axis over (N, L) with a packed
            # trailing axis) and came out SLOWER on the v5e (569 vs 443 ms on
            # the standalone pair at N=J=2e4, L=50): lane-strided rows make
            # the packed gather wider, not fewer-transaction. Reverted —
            # packing only pays on the laneless contiguous-row path above.
            x_c = batched_gather(vals_t, flat, ev).reshape((r,) + targets.shape)
            lw_c = batched_gather(lw_shift, flat, 0).reshape((r,) + j_shape)
        density = model.hidden.build_density(TimeseriesState(t_t, x_c, ev))
        lp = density.log_prob(targets[None])  # (R, J, *batch)
        # a density value above the bound means the acceptance probability
        # saturates at 1 and the accepted law is no longer the target —
        # detectable exactly here, at the candidate evaluations
        violated = jnp.any(lp > log_sup + 1e-4)
        log_u = jnp.log(jax.random.uniform(k_acc, (r,) + j_shape, dtype=lp.dtype))
        acc = log_u < lw_c + lp - log_sup
        first = jnp.argmax(acc, axis=0)  # first accepting round per target
        idx = jnp.take_along_axis(cand, first[None], axis=0)[0]
        accepted = jnp.any(acc, axis=0)
        # NOTE a two-stage lazy draw (4 rounds, then 12 under a cond on
        # jnp.all(accepted)) was built and measured NEUTRAL at N=1e5
        # (12.0 s vs 11.7 s per pass): with J in the thousands the
        # probability that EVERY target accepts within a few rounds is
        # essentially zero, so the second stage always fired. Reverted.
    else:  # degenerate cap: everything goes through the exact fallback
        idx = jnp.zeros(j_shape, jnp.int32)
        accepted = jnp.zeros(j_shape, bool)
        violated = jnp.asarray(False)  # the fallback draw is exact regardless

    if len(j_shape) == 1:
        # laneless: finish ONLY the failed slots. ONE argsort orders failures
        # first; each pass fixes a static k_sub-slice of that order (no
        # re-sorting — the original `accepted` mask guards re-selected
        # boundary slots, and a fresh exact draw for an already-fixed slot is
        # still the exact law). The streaming block is blown up to the
        # ~128 MB memory budget: the fallback's cost on TPU is the
        # SEQUENTIAL block count, not the per-block work (measured
        # 12.7 s -> ~2 s per pass at N=1e5).
        k_sub = int(fallback_subset) if fallback_subset else min(j, max(128, j // 512))
        block_eff = max(int(block), min(n, (1 << 25) // max(k_sub, 1)))

        def compact_failed(acc, size):
            """First ``size`` failed-slot indices (sentinel ``j`` past the
            end) without a sort: each failed element scatters its index into
            its cumsum rank; accepted elements aim out of bounds and drop."""
            slots = jnp.where(~acc, jnp.cumsum(~acc) - 1, j)
            order = (
                jnp.full(j, j, jnp.int32)
                .at[slots]
                .set(jnp.arange(j, dtype=jnp.int32), mode="drop")
            )
            return order[:size] if size < j else order

        def _fixup_exact(idx, acc):
            """Exact streaming passes for every still-failed slot (stage B;
            also the whole fallback when ``max_rounds == 0``)."""
            n_fail = jnp.sum(~acc)
            order = compact_failed(acc, j)

            def pass_cond(state):
                _, it = state
                return it * k_sub < n_fail

            def pass_body(state):
                idx, it = state
                sel_b = jax.lax.dynamic_slice_in_dim(order, it * k_sub, k_sub, 0)
                sel_g = jnp.minimum(sel_b, j - 1)
                exact = _streaming_categorical(
                    jax.random.fold_in(k_fb, it), model, vals_t, lw_t, t_t,
                    jnp.take(targets, sel_g, axis=0), ev, block_eff,
                )
                fix = ~jnp.take(acc, sel_g)
                idx = idx.at[sel_b].set(
                    jnp.where(fix, exact, jnp.take(idx, sel_g)), mode="drop"
                )
                return idx, it + 1

            idx, _ = jax.lax.while_loop(pass_cond, pass_body, (idx, jnp.int32(0)))
            return idx

        # NOTE a "stage A" subset-rejection layer (64 extra rounds over a
        # compaction of the failed slots, before any streaming-exact pass)
        # was built and measured NEUTRAL on-chip at both the default
        # (11.65 vs 11.71 s/pass at N=M=1e5) and the fallback-heavy
        # max_rounds=8 configuration (14.68 vs 15.0 s) — the backward
        # step's cost is structural in the candidate gather machinery, not
        # in the fallback's size. Reverted for simplicity.
        idx = jax.lax.cond(
            jnp.all(accepted),
            lambda args: args[0],
            lambda args: _fixup_exact(*args),
            (idx, accepted),
        )
        return (idx, violated) if return_violation else idx

    def fallback(args):
        idx, accepted = args
        exact = _streaming_categorical(k_fb, model, vals_t, lw_t, t_t, targets, ev, block)
        return jnp.where(accepted, idx, exact)

    idx = jax.lax.cond(
        jnp.all(accepted), lambda args: args[0], fallback, (idx, accepted)
    )
    return (idx, violated) if return_violation else idx


def ffbsi_smooth(
    key,
    model,
    history,
    resampler,
    log_density_sup=None,
    max_rounds: int = 16,
    block: int = 64,
    n_trajectories: int | None = None,
    check_bound: bool = True,
    fallback_subset: int | None = None,
):
    """Rejection-FFBSi trajectory sampling over a recorded filter history —
    same law as the exact FFBS (``ParticleFilter._smooth_ffbs``), O(N)
    expected work per step. Returns ``(T, M, *batch, *event)`` with
    ``M = n_trajectories`` (default N).

    ``n_trajectories``: smooth ``M != N`` trajectories (laneless histories
    only) — the realistic large-N configuration: the per-step cost scales
    with M, so M=4096 trajectories over an N=1e6 filter history cost ~N/M
    less than the full M=N pass.

    A transition density observed ABOVE ``log_density_sup`` during rejection
    (a wrong caller-supplied bound, or a state-dependent scale that slipped
    past :func:`transition_log_sup`'s probes) would silently bias the law —
    instead the whole returned trajectory array is poisoned with NaN
    (disable via ``check_bound=False``; no host callback exists on the axon
    TPU backend, so NaN is the loud in-trace signal).

    TPU perf tip: the pass is RNG-heavy (``R·J`` candidate draws per
    backward step), so the PRNG implementation of ``key`` matters — an rbg
    key (``jax.random.key(seed, impl="rbg")``) measured 2.7x faster than
    threefry at N=M=1e5 on the v5e (PERF.md "Round-5 ledger").
    """
    ev = model.hidden.event_ndim
    values = history.values
    log_w = history.log_weights
    times = history.time_indexes
    log_sup = (
        transition_log_sup(model) if log_density_sup is None else jnp.asarray(log_density_sup)
    )

    k_last, k_scan = jax.random.split(key)
    if n_trajectories is None:
        idx_last = resampler(k_last, log_w[-1])
    else:
        if log_w.ndim > 2:
            raise ValueError("n_trajectories requires a laneless history")
        from ...resampling import systematic_m

        idx_last = systematic_m(k_last, log_w[-1], int(n_trajectories))
    traj_last = batched_gather(values[-1], idx_last, ev)

    def backward(carry, inp):
        traj_next, viol = carry
        vals_t, lw_t, t_t, k = inp
        idx, v = backward_indices(
            k, model, vals_t, lw_t, t_t, traj_next, log_sup, max_rounds, block,
            fallback_subset=fallback_subset, return_violation=True,
        )
        traj_t = batched_gather(vals_t, idx, ev)
        return (traj_t, viol | v), traj_t

    T = values.shape[0]
    if T == 1:
        return traj_last[None]
    keys = jax.random.split(k_scan, T - 1)
    (_, violated), traj_rest = jax.lax.scan(
        backward,
        (traj_last, jnp.asarray(False)),
        (values[:-1], log_w[:-1], times[:-1], keys),
        reverse=True,
    )
    traj = jnp.concatenate([traj_rest, traj_last[None]], axis=0)
    if check_bound:
        # A NaN-poisoned output is the only in-trace signal available: the
        # axon TPU backend supports no host callbacks (debug.print), and a
        # silent truncation of acceptance probabilities above 1 would bias
        # the law with no signal at all. Remedy: pass a valid
        # log_density_sup, or check_bound=False to accept the bias.
        traj = jnp.where(violated, jnp.nan, traj)
    return traj


def paris(
    filt,
    key,
    y,
    h_fn,
    h0_fn=None,
    n_tilde: int = 2,
    log_density_sup=None,
    max_rounds: int = 16,
    block: int = 64,
    h_obs_fn=None,
    initial_state=None,
    first_step: bool = True,
):
    """Online PaRIS smoothing of an additive functional — O(1) memory.

    Estimates ``E[ h_0(x_0) + Σ_{t≥1} h(x_{t-1}, x_t) | y_{1:T} ]`` with
    per-particle statistics updated INSIDE the filter pass (no recorded
    history): each particle draws ``n_tilde`` backward indices from the
    previous cloud through the same rejection kernel as FFBSi and averages
    the inherited statistics (Olsson & Westerborn 2017; ``n_tilde >= 2``
    gives the stable O(1)-variance-per-step regime).

    ``h_fn(x_prev_values, x_values, t) -> pytree`` with leaves shaped
    ``(N, *batch, ...)`` (both value arguments are full clouds);
    ``h0_fn(x0_values)`` optional initial term.

    ``observe_every_step > 1`` is supported the way PGAS supports it
    (batch/mcmc/pgas.py): the composed sub-step transition has no closed-form
    density, so the backward-sampling recursion runs at SUB-STEP granularity —
    each uncorrected propagation is its own backward update against the
    sub-step cloud (whose weights are the post-resample weights, unchanged
    between corrections: pure propagation never reweights). ``h_fn`` is then
    called once per SUB-STEP transition with that transition's target time
    index — a functional additive over observation times only should gate on
    ``t`` (e.g. ``jnp.where(t % oes == 0, h, 0.0)``).

    ``h_obs_fn(x_values, y_t, t) -> pytree``: optional OBSERVATION-time term
    added once per correction (a function of the current cloud only, so it
    joins the statistic after the backward inheritance — the natural slot
    for ``∇_θ log g`` in online score estimation). NaN gating is the
    caller's job (the observation is passed through as-is).

    ``initial_state``/``first_step``: continue from a carried filter state
    instead of a fresh initialization (``first_step=False`` makes the first
    observation a regular ``observe_every_step``-transition move) — the
    hooks :func:`~pyfilter_tpu.inference.score.fit_mle_streaming` uses to
    window one endless stream.

    Returns ``(estimate, stats, result)``: the weighted smoothed-functional
    estimate (pytree), the final per-particle statistics, and the
    :class:`FilterResult` of the underlying pass.

    TPU perf tip: like :func:`ffbsi_smooth`, the backward draws are
    RNG-heavy — an rbg key (``jax.random.key(seed, impl="rbg")``) measured
    ~2x faster than threefry on the v5e (PERF.md "Round-5 ledger").
    """
    model = filt.model
    oes = int(model.observe_every_step)
    ev = model.hidden.event_ndim
    log_sup = (
        transition_log_sup(model) if log_density_sup is None else jnp.asarray(log_density_sup)
    )

    y = jnp.asarray(y)
    k_init, k_first, k_back1, k_scan = jax.random.split(key, 4)
    state0 = filt.initialize(k_init) if initial_state is None else initial_state
    stats0 = (
        h0_fn(state0.x.value)
        if h0_fn is not None
        else jax.tree_util.tree_map(
            lambda leaf: jnp.zeros_like(leaf),
            h_fn(state0.x.value, state0.x.value, state0.x.time_index),
        )
    )

    def backward_update(k, vals_p, lw_p, t_p, targets, t_new, stats):
        """PaRIS statistic recursion: average over n_tilde backward draws
        against the cloud ``(vals_p, lw_p)`` at time ``t_p``."""

        def one_draw(kk):
            idx, v = backward_indices(
                kk, model, vals_p, lw_p, t_p, targets, log_sup, max_rounds, block,
                return_violation=True,
            )
            x_prev = batched_gather(vals_p, idx, ev)
            inherited = jax.tree_util.tree_map(
                lambda leaf: batched_gather(leaf, idx, leaf.ndim - lw_p.ndim), stats
            )
            inc = h_fn(x_prev, targets, t_new)
            return jax.tree_util.tree_map(jnp.add, inherited, inc), v

        draws, viols = zip(*(one_draw(kk) for kk in jax.random.split(k, n_tilde)))
        stats = jax.tree_util.tree_map(
            lambda *leaves: sum(leaves) / float(n_tilde), *draws
        )
        return stats, jnp.any(jnp.stack(viols))

    def add_obs_term(stats, new, y_t):
        if h_obs_fn is None:
            return stats
        inc = h_obs_fn(new.x.value, y_t, new.x.time_index)
        return jax.tree_util.tree_map(jnp.add, stats, inc)

    def move_and_update(k, y_t, state, stats, is_first=False):
        """One observation move: filter forward, then one backward update per
        TRANSITION — a single update at oes == 1, or one per sub-step chain
        link ``state -> sub_1 -> ... -> sub_{oes-1} -> correction`` (the
        sub-step clouds carry the post-resample weights the filter recorded
        for them) — then the optional observation term."""
        n_sub = 0 if is_first else oes - 1
        k_f, k_b = jax.random.split(k)
        if n_sub == 0:
            new = filt.filter(k_f, y_t, state, first_step=is_first)
            stats, v = backward_update(
                k_b, state.x.value, state.log_weights, state.x.time_index,
                new.x.value, new.x.time_index, stats,
            )
            return new, add_obs_term(stats, new, y_t), v
        new, inter = filt.filter(k_f, y_t, state, return_intermediaries=True)
        i_times, i_vals, i_lw, _ = inter  # leaves stacked (n_sub, ...)
        ks = jax.random.split(k_b, n_sub + 1)
        chain = [(state.x.value, state.log_weights, state.x.time_index)] + [
            (i_vals[i], i_lw[i], i_times[i]) for i in range(n_sub)
        ]
        viol = jnp.asarray(False)
        for i in range(n_sub):
            vals_p, lw_p, t_p = chain[i]
            stats, v = backward_update(
                ks[i], vals_p, lw_p, t_p, chain[i + 1][0], chain[i + 1][2], stats
            )
            viol = viol | v
        vals_p, lw_p, t_p = chain[-1]
        stats, v = backward_update(
            ks[-1], vals_p, lw_p, t_p, new.x.value, new.x.time_index, stats
        )
        return new, add_obs_term(stats, new, y_t), viol | v

    state1, stats1, viol1 = move_and_update(
        k_first, y[0], state0, stats0, is_first=first_step
    )

    def step(carry, inp):
        state, stats, viol = carry
        k, y_t = inp
        new, stats, v = move_and_update(k, y_t, state, stats)
        return (new, stats, viol | v), (new.log_likelihood, new.mean, new.variance)

    n_steps = y.shape[0]
    if n_steps > 1:
        keys = jax.random.split(k_scan, n_steps - 1)
        (last, stats, violated), (step_lls, means, variances) = jax.lax.scan(
            step, (state1, stats1, viol1), (keys, y[1:])
        )
        step_lls = jnp.concatenate([state1.log_likelihood[None], step_lls])
        means = jnp.concatenate([state1.mean[None], means])
        variances = jnp.concatenate([state1.variance[None], variances])
    else:
        last, stats, violated = state1, stats1, viol1
        step_lls = state1.log_likelihood[None]
        means, variances = state1.mean[None], state1.variance[None]

    from ..result import FilterResult

    w = last.normalized_weights()
    # same loud-failure contract as ffbsi_smooth: a violated rejection bound
    # poisons the smoothed estimate instead of silently biasing it
    stats = jax.tree_util.tree_map(lambda leaf: jnp.where(violated, jnp.nan, leaf), stats)
    estimate = jax.tree_util.tree_map(
        lambda leaf: jnp.sum(
            leaf * w.reshape(w.shape + (1,) * (leaf.ndim - w.ndim)), axis=0
        ),
        stats,
    )
    result = FilterResult(
        log_likelihood=jnp.sum(step_lls, axis=0),
        step_log_likelihoods=step_lls,
        filter_means=means,
        filter_variances=variances,
        latest_state=last,
        states=None,
    )
    return estimate, stats, result
