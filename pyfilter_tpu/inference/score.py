"""Online score estimation and streaming maximum likelihood.

O(N) online score (Poyiadjis, Doucet & Singh 2011, "Particle approximations
of the score and observed information matrix in state space models", via the
PaRIS recursion of Olsson & Westerborn 2017): the score of the data
log-likelihood is the smoothed expectation of an ADDITIVE functional,

.. math::
    \\nabla_\\theta \\log p(y_{1:T} | \\theta)
      = E\\Big[\\sum_t \\nabla_\\theta \\log f_\\theta(x_t | x_{t-1})
                 + \\nabla_\\theta \\log g_\\theta(y_t | x_t)\\,\\Big|\\,y_{1:T}\\Big],

so per-particle score statistics ride the filter scan with O(1) memory — no
recorded history, no differentiable-resampling correction, no growing
backward pass. This completes the offline ``fit_mle`` (differentiable
resampling over the whole recorded sequence, inference/variational.py) with
a STREAMING counterpart: :func:`fit_mle_streaming` takes one Adam step per
window of observations and carries only the particle cloud across windows —
the recursive-MLE scheme of Le Gland & Mevel / Poyiadjis et al. §4.

Extends the reference's one gradient path (the FFBS-smoothed pyro factor,
reference pyfilter/filters/particle/base.py:176-229 — O(T) recorded history
per gradient) to its online limit.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..filters.particle.smoothing import (
    paris,
    transition_log_sup,
    transition_log_sup_traced,
)
from ..timeseries import TimeseriesState
from .context import InferenceContext


def _score_functionals(ctx, build_model, theta, ev):
    """(h_fn, h_obs_fn) evaluating the per-particle gradients of ``log f``
    (per sub-step transition) and ``log g`` (per observation) w.r.t. the
    stacked UNCONSTRAINED parameters, AT the point ``theta`` (shape (1, D) —
    a traced value inside the streaming window step, so each window
    differentiates at its current iterate).

    Rebuilding the model per particle inside ``jax.grad`` is free after
    tracing — the builder only routes traced leaves into the density calls.
    """

    def h_fn(x_prev, x_cur, t):
        def one(xp_i, xc_i):
            def log_f(th):
                ctx2 = ctx.unstack_parameters(th, constrained=False)
                with ctx2.no_prior_verification():
                    model2 = build_model(ctx2)
                dens = model2.hidden.build_density(TimeseriesState(t - 1.0, xp_i, ev))
                return jnp.sum(dens.log_prob(xc_i))

            return jax.grad(log_f)(theta)[0]  # (D,)

        return jax.vmap(one)(x_prev, x_cur)

    def h_obs_fn(x_cur, y_t, t):
        finite = jnp.isfinite(jnp.asarray(y_t)).all()
        y_safe = jnp.where(jnp.isnan(jnp.asarray(y_t)), 0.0, jnp.asarray(y_t))

        def one(xc_i):
            def log_g(th):
                ctx2 = ctx.unstack_parameters(th, constrained=False)
                with ctx2.no_prior_verification():
                    model2 = build_model(ctx2)
                dens = model2.build_density(TimeseriesState(t, xc_i, ev))
                return jnp.sum(dens.log_prob(y_safe))

            g = jax.grad(log_g)(theta)[0]
            return jnp.where(finite, g, jnp.zeros_like(g))

        return jax.vmap(one)(x_cur)

    return h_fn, h_obs_fn


class OnlineScoreResult(NamedTuple):
    score: jax.Array  # (D,) d/dθ log p(y | θ) at the context's values
    log_likelihood: jax.Array
    stats: jax.Array  # (N, D) final per-particle score statistics
    context: InferenceContext

    def by_parameter(self):
        """Score components mapped back to named parameters (unconstrained
        space)."""
        out, pos = {}, 0
        for name, val in self.context.get_parameters(constrained=False):
            n = int(np.prod(np.shape(val)[1:])) if np.ndim(val) > 1 else 1
            out[name] = np.asarray(self.score[pos : pos + n])
            pos += n
        return out


def online_score(
    build_model: Callable,
    y,
    filter_factory: Callable,
    key,
    context: InferenceContext = None,
    n_tilde: int = 2,
    log_density_sup=None,
    max_rounds: int = 16,
) -> OnlineScoreResult:
    """O(1)-memory estimate of ``∇_θ log p(y_{1:T} | θ)`` at the context's
    current parameter values (unconstrained space — matching ``fit_mle``'s
    parameterization), via PaRIS with the score functional.

    ``filter_factory(build_model)`` supplies the particle filter (a plain
    bootstrap SISR works — no ``differentiable=True`` needed: the gradient
    flows through DENSITY re-evaluations, never through resampling).
    ``log_density_sup``: rejection bound forwarded to the backward kernel
    (required for heteroscedastic transitions; see ``transition_log_sup``).

    TPU perf tip: like the PaRIS/FFBSi kernels underneath, the pass is
    RNG-heavy — an rbg key (``jax.random.key(seed, impl="rbg")``) measured
    2.2x faster than threefry at N=1e5 on the v5e (PERF.md "Round-5
    ledger"). Repeated calls with the SAME ``build_model`` function object
    reuse the compiled executable (parameter-value changes never recompile).
    """
    k_ctx, k_run = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
    ctx = context if context is not None else InferenceContext(key=k_ctx)
    if ctx.batch_shape is None:
        ctx.set_batch_shape(())
    elif tuple(ctx.batch_shape) != ():
        raise ValueError("online_score evaluates one parameter point: batch shape ()")

    filt = filter_factory(build_model).initialize_model(ctx)
    if log_density_sup is None:
        log_density_sup = transition_log_sup(filt.model)

    est, ll, stats = _online_score_core(
        build_model, n_tilde, max_rounds, filt, ctx, k_run,
        jnp.asarray(y), jnp.asarray(log_density_sup),
    )
    return OnlineScoreResult(est, ll, stats, ctx)


@functools.partial(jax.jit, static_argnames=("build_model", "n_tilde", "max_rounds"))
def _online_score_core(build_model, n_tilde, max_rounds, filt, ctx, key, y, log_sup):
    """The jitted body of :func:`online_score`.

    Module-level jit keyed on the (hashable) model builder: WITHOUT this,
    every call re-traced the whole PaRIS scan eagerly — xprof attributed
    essentially the entire 21 s N=1e5/T=200 pass to host-side
    ``trace_to_jaxpr``/dispatch, with the device near-idle (PERF.md
    "Round-5 ledger"). Repeated calls with the same builder (an SGD loop,
    a scorer in an outer sampler) now reuse the compiled executable; the
    filter and context ride in as pytrees, so changed PARAMETERS never
    recompile (the architecture's no-recompile invariant).
    """
    theta = ctx.stack_parameters(constrained=False)
    ev = filt.model.hidden.event_ndim
    h_fn, h_obs_fn = _score_functionals(ctx, build_model, theta, ev)
    est, stats, res = paris(
        filt, key, y, h_fn, h_obs_fn=h_obs_fn, n_tilde=n_tilde,
        log_density_sup=log_sup, max_rounds=max_rounds,
    )
    return est, res.log_likelihood, stats


class StreamingMLEResult(NamedTuple):
    theta: jax.Array  # (1, D) final unconstrained parameters
    theta_path: jax.Array  # (n_windows, D) parameter trajectory
    window_log_likelihoods: jax.Array
    context: InferenceContext

    def parameters(self):
        ctx = self.context.unstack_parameters(self.theta, constrained=False)
        return {n: np.asarray(v) for n, v in ctx.get_parameters(constrained=True)}


def fit_mle_streaming(
    build_model: Callable,
    y,
    filter_factory: Callable,
    key,
    window: int = 25,
    learning_rate: float = 2e-2,
    context: InferenceContext = None,
    n_tilde: int = 2,
    log_density_sup=None,
    max_rounds: int = 16,
) -> StreamingMLEResult:
    """Streaming maximum likelihood: one Adam ascent step per ``window``
    observations using the PaRIS online score of that window, carrying ONLY
    the particle cloud across windows — O(1) memory in T, so it runs on
    streams no recorded-history gradient method could hold (``fit_mle``
    records nothing either but differentiates one fixed-length pass; this
    estimator never revisits old observations at all).

    The window score is a gradient of the window's conditional likelihood
    given the carried cloud — the standard recursive-MLE approximation
    (Poyiadjis et al. 2011 §4): as θ converges the carried cloud equals the
    θ-filter's and the bias vanishes. Trailing observations that do not fill
    a window are dropped.

    ``log_density_sup=None`` (default) recomputes the rejection bound
    IN-TRACE at each window's θ via
    :func:`~pyfilter_tpu.filters.particle.smoothing.transition_log_sup_traced`
    (homoscedasticity is validated once at θ0 host-side) — a static bound
    valid at θ0 silently turns invalid as Adam moves the noise scale, and
    the bound guard would rightly poison the run. Pass an explicit value
    only for heteroscedastic models, as a bound covering every θ the
    optimizer may visit.
    """
    import optax

    k_ctx, k0, k_loop = jax.random.split(
        jax.random.PRNGKey(0) if key is None else key, 3
    )
    ctx = context if context is not None else InferenceContext(key=k_ctx)
    if ctx.batch_shape is None:
        ctx.set_batch_shape(())
    elif tuple(ctx.batch_shape) != ():
        raise ValueError("fit_mle_streaming is a point estimator: batch shape ()")

    base_filt = filter_factory(build_model)
    filt0 = base_filt.initialize_model(ctx)
    model = filt0.model
    ev = model.hidden.event_ndim
    oes = int(model.observe_every_step)
    per_theta_bound = log_density_sup is None
    if per_theta_bound:
        transition_log_sup(model)  # θ0 host validation (homoscedasticity)
    else:
        log_density_sup = jnp.asarray(log_density_sup)

    y = jnp.asarray(y)
    n_win = y.shape[0] // int(window)
    if n_win < 1:
        raise ValueError("fewer observations than one window")
    y_win = y[: n_win * window].reshape((n_win, window) + y.shape[1:])

    theta0 = ctx.stack_parameters(constrained=False)  # (1, D)
    opt = optax.adam(learning_rate)
    opt_state0 = opt.init(theta0)

    @functools.partial(jax.jit, static_argnames=("first",))
    def window_step(theta, opt_state, state, k, y_w, first):
        ctx2 = ctx.unstack_parameters(theta, constrained=False)
        filt2 = base_filt.initialize_model(ctx2)
        # the functionals differentiate at THIS window's (traced) iterate,
        # and the rejection bound follows the iterate too
        h_fn, h_obs_fn = _score_functionals(ctx, build_model, theta, ev)
        bound = (
            transition_log_sup_traced(filt2.model) if per_theta_bound
            else log_density_sup
        )
        score, _, res = paris(
            filt2, k, y_w, h_fn, h_obs_fn=h_obs_fn, n_tilde=n_tilde,
            log_density_sup=bound, max_rounds=max_rounds,
            initial_state=state, first_step=first,
        )
        updates, opt_state = opt.update(-score[None], opt_state)
        theta = theta + updates
        return theta, opt_state, res.latest_state, res.log_likelihood

    # first window initializes the cloud; the REST run as ONE compiled scan.
    # Measured near-neutral on the v5e (8.89 -> 8.56 s at T=1e4/window=25 —
    # async dispatch already pipelined the Python loop's launches), kept for
    # the single-dispatch form: no 400 host round-trips on a slow host, and
    # the whole fit is one executable after the first window
    k_loop, k_w = jax.random.split(k_loop)
    ctx_w = ctx.unstack_parameters(theta0, constrained=False)
    filt_w = base_filt.initialize_model(ctx_w)
    k_w, k_init = jax.random.split(k_w)
    state0 = filt_w.initialize(k_init)
    theta, opt_state, state, ll0 = window_step(
        theta0, opt_state0, state0, k_w, y_win[0], True
    )

    @jax.jit
    def run_rest(theta, opt_state, state, k, y_rest):
        def body(carry, y_w):
            theta, opt_state, state, k = carry
            k, k_w = jax.random.split(k)
            theta, opt_state, state, ll = window_step(
                theta, opt_state, state, k_w, y_w, False
            )
            return (theta, opt_state, state, k), (theta[0], ll)

        (theta, opt_state, state, _), (path, lls) = jax.lax.scan(
            body, (theta, opt_state, state, k), y_rest
        )
        return theta, path, lls

    path0, lls0 = theta[0][None], jnp.asarray(ll0)[None]
    if n_win > 1:
        theta, path_rest, lls_rest = run_rest(
            theta, opt_state, state, k_loop, y_win[1:]
        )
        path = jnp.concatenate([path0, path_rest])
        lls = jnp.concatenate([lls0, lls_rest])
    else:
        path, lls = path0, lls0

    return StreamingMLEResult(theta, path, lls, ctx)
