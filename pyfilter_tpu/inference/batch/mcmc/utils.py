"""The shared PMMH transition (reference pyfilter/inference/batch/mcmc/utils.py).

``run_pmmh`` is a pure host-level orchestration function: it samples a
candidate parameter vector, rebuilds the model, runs a full (jit-compiled)
re-filter of the data, and accept/rejects per lane. All mutation of the
reference version (in-place context/filter exchange) is replaced by returning
the updated objects.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ....distributions import Normal
from ....filters.result import FilterResult
from ...context import InferenceContext, QuasiInferenceContext
from ...state import FilterAlgorithmState, RunningFilterResult, SequentialAlgorithmState


class PMMHStep(NamedTuple):
    accepted: jax.Array
    context: object
    filter_state: object
    proposal_kernel: object
    #: scalar mean acceptance (set by the jitted fast path so callers fetch
    #: one scalar instead of reducing the lane mask eagerly)
    accept_rate: object = None


def _pmmh_transition_body(
    key,
    context,
    w,
    latest_state,
    loglik,
    proposal_kernel,
    filt,
    y_padded,
    n_valid,
    proposal,
    size,
    mutate_kernel,
    qmc_prob=None,
):
    """Traceable body of one PMMH transition — shared by the single-transition
    jit wrapper below and the fully-fused rejuvenation
    (``sequential.kernels.mh._jitted_rejuvenate``). Mirrors the eager body of
    :func:`run_pmmh` exactly (same key splits).

    ``qmc_prob`` (optional, ``(*size, dim)``): pre-drawn scrambled-Sobol
    uniforms for this transition's candidate draw. A quasi context's Sobol
    engine is host state and cannot run under a trace, so the fused
    rejuvenation draws the uniforms host-side and the candidate is produced
    in-trace by the same inversion ``utils.QuasiMultivariateNormal.sample``
    applies (icdf + Cholesky rotation) — bit-compatible with the eager path.
    """
    k_sample, k_filter, k_accept, k_build = jax.random.split(key, 4)

    if qmc_prob is None:
        rvs = proposal_kernel.sample(k_sample, size)
    else:
        probs = qmc_prob.astype(proposal_kernel.loc.dtype)
        eps = Normal(jnp.zeros_like(probs), 1.0).icdf(probs)
        rvs = proposal_kernel.loc + jnp.einsum(
            "...ij,...j->...i", proposal_kernel.scale_tril, eps
        )
    proposal_context = context.unstack_parameters(rvs, constrained=False)
    proposal_filter = filt.initialize_model(proposal_context)
    new_res = proposal_filter.batch_filter_masked(k_filter, y_padded, n_valid)

    diff_logl = new_res.log_likelihood - loglik
    diff_prior = proposal_context.eval_priors(constrained=False) - context.eval_priors(
        constrained=False
    )

    # the proposal is refit on the candidate cloud with uniform weights —
    # the same zero-weight replica the eager path builds via state.replicate
    shim = SequentialAlgorithmState(jnp.zeros_like(w), None)
    new_prop_kernel = proposal.build(
        proposal_context, shim, proposal_filter, y_padded, key=k_build
    )
    params_as_tensor = context.stack_parameters(constrained=False)
    diff_prop = new_prop_kernel.log_prob(params_as_tensor) - proposal_kernel.log_prob(rvs)

    log_acc_prob = diff_prop + diff_prior + diff_logl
    log_u = jnp.log(jax.random.uniform(k_accept, jnp.shape(log_acc_prob)))
    accepted = log_u < log_acc_prob

    new_latest = latest_state.exchange(new_res.latest_state, accepted)
    new_ll = jnp.where(accepted, new_res.log_likelihood, loglik)
    new_context = context.exchange(proposal_context, accepted)

    kernel = proposal_kernel
    if mutate_kernel:
        kernel = proposal.exchange(proposal_kernel, new_prop_kernel, accepted)
    rate = jnp.mean(accepted.astype(jnp.float32))
    return accepted, rate, new_context, new_latest, new_ll, kernel


def _pmmh_full_transition_body(
    key,
    context,
    filter_state,
    proposal_kernel,
    filt,
    y,
    proposal,
    size,
    mutate_kernel,
):
    """Traceable body of one batch-PMMH transition (full re-filter,
    whole-history exchange) — shared by the single-transition jit wrapper and
    the fused chain scan (:func:`_pmmh_chain_scan`)."""
    k_sample, k_filter, k_accept, k_build = jax.random.split(key, 4)

    rvs = proposal_kernel.sample(k_sample, size)
    proposal_context = context.unstack_parameters(rvs, constrained=False)
    proposal_filter = filt.initialize_model(proposal_context)
    new_res = proposal_filter.batch_filter(k_filter, y)

    diff_logl = new_res.log_likelihood - filter_state.log_likelihood
    diff_prior = proposal_context.eval_priors(constrained=False) - context.eval_priors(
        constrained=False
    )

    # matches the eager path's state.replicate(new_res) shim
    shim = FilterAlgorithmState(new_res)
    new_prop_kernel = proposal.build(
        proposal_context, shim, proposal_filter, y, key=k_build
    )
    params_as_tensor = context.stack_parameters(constrained=False)
    diff_prop = new_prop_kernel.log_prob(params_as_tensor) - proposal_kernel.log_prob(rvs)

    log_acc_prob = diff_prop + diff_prior + diff_logl
    log_u = jnp.log(jax.random.uniform(k_accept, jnp.shape(log_acc_prob)))
    accepted = log_u < log_acc_prob

    new_filter_state = filter_state.exchange(new_res, accepted)
    new_context = context.exchange(proposal_context, accepted)

    kernel = proposal_kernel
    if mutate_kernel:
        kernel = proposal.exchange(proposal_kernel, new_prop_kernel, accepted)
    rate = jnp.mean(accepted.astype(jnp.float32))
    return accepted, rate, new_context, new_filter_state, kernel


@functools.partial(jax.jit, static_argnames=("proposal", "size", "mutate_kernel"))
def _run_pmmh_full_core(
    key,
    context,
    filter_state,
    proposal_kernel,
    filt,
    y,
    proposal,
    size,
    mutate_kernel,
):
    """One batch-PMMH transition as one compiled call — the per-iteration
    analogue of the masked core below for :class:`...pmmh.PMMH`'s fit loop,
    whose chains otherwise pay ~80 eager dispatches per sample."""
    return _pmmh_full_transition_body(
        key, context, filter_state, proposal_kernel, filt, y, proposal, size,
        mutate_kernel,
    )


@functools.partial(jax.jit, static_argnames=("proposal", "size", "mutate_kernel", "n_steps"))
def _pmmh_chain_scan(
    keys,
    context,
    filter_state,
    proposal_kernel,
    filt,
    y,
    proposal,
    size,
    mutate_kernel,
    n_steps,
    n_valid=None,
):
    """``n_steps`` batch-PMMH transitions as ONE compiled ``lax.scan`` with
    device-side chain recording — the SMC2 dispatch-fusion recipe applied to
    :meth:`...pmmh.PMMH.fit`'s sample loop (the reference loops host-side,
    pmmh.py:76-104; at thousands of samples on the tunnel-latency host every
    per-sample dispatch costs more than the transition itself).

    ``keys``: ``(n_steps, 2)`` per-transition keys, the same stream the
    per-step loop's ``_next_key()`` consumes (``_split_chain``) so both paths
    are bit-identical. Returns the final carry plus the per-step CONSTRAINED
    stacked parameters ``(n_steps, *batch, D)`` and acceptance rates — the
    chain record, fetched host-side once per chunk instead of once per
    sample.

    ``n_valid`` (traced, optional): steps at positions >= ``n_valid`` are
    device-side NO-OPS (``lax.cond`` passes the carry through untouched).
    This keeps ``n_steps`` — a STATIC shape — pinned to one chunk size for a
    whole fit, so the remainder chunk reuses the compiled executable instead
    of re-tracing the full-re-filter transition graph for its odd length
    (callers pad ``keys`` and slice the record to ``n_valid``)."""

    def transition(op):
        (ctx, fs, kern), k = op
        _, rate, ctx, fs, kern = _pmmh_full_transition_body(
            k, ctx, fs, kern, filt, y, proposal, size, mutate_kernel
        )
        return (ctx, fs, kern), (ctx.stack_parameters(constrained=True), rate)

    def passthrough(op):
        (ctx, fs, kern), _ = op
        return (ctx, fs, kern), (ctx.stack_parameters(constrained=True), jnp.float32(0.0))

    if n_valid is None:

        def body(carry, k):
            return transition((carry, k))

        xs = keys
    else:

        def body(carry, inp):
            k, valid = inp
            return jax.lax.cond(valid, transition, passthrough, (carry, k))

        xs = (keys, jnp.arange(n_steps) < n_valid)

    (ctx, fs, kern), (recs, rates) = jax.lax.scan(
        body, (context, filter_state, proposal_kernel), xs, length=n_steps
    )
    return ctx, fs, kern, recs, rates


@functools.partial(jax.jit, static_argnames=("proposal", "size", "mutate_kernel"))
def _run_pmmh_masked_core(
    key,
    context,
    w,
    latest_state,
    loglik,
    proposal_kernel,
    filt,
    y_padded,
    n_valid,
    proposal,
    size,
    mutate_kernel,
):
    """One PMMH transition as ONE compiled call (context is a pytree).

    Eagerly, a transition is ~80 small device ops (sample, per-parameter
    unstack/exchange, prior evals, MVN refit) and on the bench host each
    eager dispatch pays ~5 ms of TPU-tunnel latency — the re-filter itself
    was only a minority of the measured ~540 ms per rejuvenation (PERF.md).
    Compiled, the transition is one dispatch."""
    return _pmmh_transition_body(
        key,
        context,
        w,
        latest_state,
        loglik,
        proposal_kernel,
        filt,
        y_padded,
        n_valid,
        proposal,
        size,
        mutate_kernel,
    )


def run_pmmh(
    key,
    context,
    state,
    proposal,
    proposal_kernel,
    filter_,
    y: jax.Array,
    size=(),
    mutate_kernel: bool = False,
    y_padded: jax.Array = None,
    n_valid=None,
) -> PMMHStep:
    r"""One vectorized PMMH update over all lanes (reference utils.py:14-77).

    Accept mask from ``diff_proposal + diff_prior + diff_loglik`` vs
    log-uniform; lanes that accept exchange their filter state and context
    values with the proposal side.

    ``y_padded``/``n_valid`` (optional): run the re-filter through the
    bucketed masked scan instead — SMC2's rejuvenations re-filter a history
    that grows every trigger, and a fresh XLA compile per length dwarfs the
    filtering itself (see :func:`pyfilter_tpu.filters.base.pad_observations`).
    """
    constrained = False

    # a quasi context is a pytree too (minus its host-side Sobol engine) and
    # can ride the fused tiers whenever the proposal never consumes the
    # engine (RandomWalk & co.); engine-sampling proposals (SymmetricMH)
    # stay eager here — the fully-fused SMC2 rejuvenation handles those with
    # pre-drawn uniforms (sequential.kernels.mh)
    pytree_ctx = type(context) is InferenceContext or (
        type(context) is QuasiInferenceContext
        and not getattr(proposal, "uses_quasi_engine", False)
    )

    # fast path: the whole transition as one compiled call — eligible when
    # the bucketed masked re-filter applies, the context is a pytree
    # kind, and the proposal builder is traceable (see _run_pmmh_masked_core)
    if (
        y_padded is not None
        and not (filter_.record_states or filter_.record_intermediary)
        and pytree_ctx
        and getattr(proposal, "jit_compatible", False)
        and isinstance(state.filter_state, RunningFilterResult)
        and hasattr(state, "w")
    ):
        accepted, rate, new_context, new_latest, new_ll, kernel = _run_pmmh_masked_core(
            key,
            context,
            state.w,
            state.filter_state.latest_state,
            state.filter_state.log_likelihood,
            proposal_kernel,
            filter_,
            y_padded,
            jnp.int32(n_valid),
            proposal,
            tuple(size),
            bool(mutate_kernel),
        )
        if type(context) is QuasiInferenceContext:
            new_context.quasi_engine = context.quasi_engine
        new_filter_state = RunningFilterResult(
            new_latest, new_ll, state.filter_state.record_moments
        )
        new_filter_state.filter_means = list(state.filter_state.filter_means)
        new_filter_state.filter_variances = list(state.filter_state.filter_variances)
        return PMMHStep(accepted, new_context, new_filter_state, kernel, rate)

    # batch-PMMH fast path: full re-filter + whole-history exchange fused
    # (sequential states carry host-side running results and take the masked
    # tier above instead)
    if (
        y_padded is None
        and pytree_ctx
        and getattr(proposal, "jit_compatible", False)
        and isinstance(state.filter_state, FilterResult)
        and not hasattr(state, "w")
    ):
        accepted, rate, new_context, new_filter_state, kernel = _run_pmmh_full_core(
            key,
            context,
            state.filter_state,
            proposal_kernel,
            filter_,
            jnp.asarray(y),
            proposal,
            tuple(size),
            bool(mutate_kernel),
        )
        if type(context) is QuasiInferenceContext:
            new_context.quasi_engine = context.quasi_engine
        return PMMHStep(accepted, new_context, new_filter_state, kernel, rate)

    k_sample, k_filter, k_accept, k_build = jax.random.split(key, 4)

    # sample candidate parameters and rebuild the proposal model
    rvs = proposal_kernel.sample(k_sample, tuple(size))
    proposal_context = context.unstack_parameters(rvs, constrained=constrained)
    proposal_filter = filter_.initialize_model(proposal_context)

    # full re-filter of the data under the candidate parameters (the hot spot)
    if y_padded is not None and not (
        proposal_filter.record_states or proposal_filter.record_intermediary
    ):
        new_res = proposal_filter.batch_filter_masked(k_filter, y_padded, n_valid)
    else:
        new_res = proposal_filter.batch_filter(k_filter, y)

    diff_logl = new_res.log_likelihood - state.filter_state.log_likelihood
    diff_prior = proposal_context.eval_priors(constrained=constrained) - context.eval_priors(
        constrained=constrained
    )

    new_prop_kernel = proposal.build(
        proposal_context, state.replicate(new_res), proposal_filter, y, key=k_build
    )
    params_as_tensor = context.stack_parameters(constrained=constrained)

    diff_prop = new_prop_kernel.log_prob(params_as_tensor) - proposal_kernel.log_prob(rvs)

    log_acc_prob = diff_prop + diff_prior + diff_logl
    log_u = jnp.log(jax.random.uniform(k_accept, jnp.shape(log_acc_prob)))
    accepted = log_u < log_acc_prob

    new_filter_state = state.filter_state.exchange(new_res, accepted)
    new_context = context.exchange(proposal_context, accepted)

    kernel = proposal_kernel
    if mutate_kernel:
        kernel = proposal.exchange(proposal_kernel, new_prop_kernel, accepted)

    return PMMHStep(accepted, new_context, new_filter_state, kernel)
