"""Online (jitter-based) rejuvenation kernel.

Re-design of the reference's ``pyfilter/inference/sequential/kernels/online.py``:
stack unconstrained parameters, systematic-resample lanes, KDE-jitter, unstack
into a fresh context, rebuild the filter model, reset parameter weights.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ....resampling import systematic
from .jittering import JitterKernel, NonShrinkingKernel


class OnlineUpdate(NamedTuple):
    context: object
    filter_: object
    state: object


class OnlineKernel:
    """Reference online.py:7-53. ``discrete`` jitters each lane only with
    probability ``K^{-1/2}``."""

    def __init__(self, kernel: JitterKernel = None, discrete: bool = False, resampler=systematic):
        self._kernel = kernel or NonShrinkingKernel()
        self._disc = discrete
        self._resampler = resampler

    def update(self, key, context, filter_, state) -> OnlineUpdate:
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
