"""Online (jitter-based) rejuvenation kernel.

Re-design of the reference's ``pyfilter/inference/sequential/kernels/online.py``:
stack unconstrained parameters, systematic-resample lanes, KDE-jitter, unstack
into a fresh context, rebuild the filter model, reset parameter weights.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ....resampling import systematic
from ....utils import normalize
from ...context import InferenceContext, QuasiInferenceContext
from ...state import RunningFilterResult
from .jittering import JitterKernel, NonShrinkingKernel


class OnlineUpdate(NamedTuple):
    context: object
    filter_: object
    state: object


@functools.partial(jax.jit, static_argnames=("kernel", "resampler", "discrete"))
def _jitted_online_update(key, context, w, latest_state, loglik, kernel, resampler, discrete):
    """The whole jitter rejuvenation as ONE compiled call (the context is a
    pytree; jitter kernels are frozen dataclasses, so they are structural
    static arguments). Eagerly this is ~30 device dispatches — stack,
    resample, robust-variance KDE jitter, per-parameter unstack — and each
    eager dispatch pays the TPU-tunnel latency (see
    ``batch.mcmc.utils._run_pmmh_masked_core``). Mirrors the eager body of
    :meth:`OnlineKernel.update` exactly."""
    k_resample, k_jitter, k_disc = jax.random.split(key, 3)

    weights = normalize(w)
    stacked = context.stack_parameters(constrained=False)  # (K, D)
    indices = resampler(k_resample, weights, normalized=True)

    jittered = kernel.jitter(k_jitter, stacked, weights, indices)

    if discrete:
        k = stacked.shape[0]
        to_jitter = (
            jax.random.bernoulli(k_disc, 1.0 / k**0.5, (k,))
            .astype(stacked.dtype)[..., None]
        )
        jittered = (1.0 - to_jitter) * stacked[indices] + to_jitter * jittered

    new_context = context.unstack_parameters(jittered, constrained=False)
    new_latest = latest_state.resample(indices)
    new_ll = jnp.take(loglik, indices, axis=0)
    return new_context, new_latest, new_ll


class OnlineKernel:
    """Reference online.py:7-53. ``discrete`` jitters each lane only with
    probability ``K^{-1/2}``."""

    def __init__(self, kernel: JitterKernel = None, discrete: bool = False, resampler=systematic):
        self._kernel = kernel or NonShrinkingKernel()
        self._disc = discrete
        self._resampler = resampler

    def update(self, key, context, filter_, state) -> OnlineUpdate:
        # jittering never touches the Sobol engine, so a quasi context rides
        # the fused path too (it is a pytree minus the engine — reattached to
        # the returned context below)
        quasi = type(context) is QuasiInferenceContext and context.quasi_engine is not None
        if (type(context) is InferenceContext or quasi) and isinstance(
            state.filter_state, RunningFilterResult
        ):
            new_context, new_latest, new_ll = _jitted_online_update(
                key,
                context,
                state.w,
                state.filter_state.latest_state,
                state.filter_state.log_likelihood,
                self._kernel,
                self._resampler,
                self._disc,
            )
            if quasi:
                new_context.quasi_engine = context.quasi_engine
            # entire_history=False semantics: the recorded moment history is
            # carried over un-resampled (same as the eager path below)
            fs = RunningFilterResult(
                new_latest, new_ll, state.filter_state.record_moments
            )
            fs.filter_means = list(state.filter_state.filter_means)
            fs.filter_variances = list(state.filter_state.filter_variances)
            state.filter_state = fs
        else:
            k_resample, k_jitter, k_disc = jax.random.split(key, 3)

            weights = state.normalized_weights()
            stacked = context.stack_parameters(constrained=False)  # (K, D)
            indices = self._resampler(k_resample, weights, normalized=True)

            jittered = self._kernel.jitter(k_jitter, stacked, weights, indices)

            if self._disc:
                k = stacked.shape[0]
                to_jitter = (
                    jax.random.bernoulli(k_disc, 1.0 / k**0.5, (k,))
                    .astype(stacked.dtype)[..., None]
                )
                jittered = (1.0 - to_jitter) * stacked[indices] + to_jitter * jittered

            new_context = context.unstack_parameters(jittered, constrained=False)
            state.filter_state = state.filter_state.resample(indices, entire_history=False)

        new_filter = filter_.initialize_model(new_context)
        state.w = jnp.zeros_like(state.w)

        return OnlineUpdate(new_context, new_filter, state)
