"""The shared PMMH transition (reference pyfilter/inference/batch/mcmc/utils.py).

``run_pmmh`` is a pure host-level orchestration function: it samples a
candidate parameter vector, rebuilds the model, runs a full (jit-compiled)
re-filter of the data, and accept/rejects per lane. All mutation of the
reference version (in-place context/filter exchange) is replaced by returning
the updated objects.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PMMHStep(NamedTuple):
    accepted: jax.Array
    context: object
    filter_state: object
    proposal_kernel: object


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
    k_sample, k_filter, k_accept, k_build = jax.random.split(key, 4)
    constrained = False

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
