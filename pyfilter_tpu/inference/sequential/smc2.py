"""SMC2 — Chopin et al.'s nested sequential Monte Carlo.

Re-design of the reference's ``pyfilter/inference/sequential/smc2.py``.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp

from ..state import SMC2State
from .base import SequentialParticleAlgorithm
from .kernels import ParticleMetropolisHastings
from .threshold import ConstantThreshold, Thresholder


class SMC2(SequentialParticleAlgorithm):
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
        **kwargs,
    ):
        super().__init__(filter_, particles, context=context, key=key, **kwargs)

        self._threshold = (
            threshold if isinstance(threshold, Thresholder) else ConstantThreshold(threshold)
        )
        self._kernel = ParticleMetropolisHastings(
            proposal=kernel,
            max_increases=max_increases,
            num_steps=num_steps,
            distance_threshold=distance_threshold,
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
        weight goes non-finite."""
        state.append_data(y)
        state = self._filter_step(y, state)

        any_nans = bool(~jnp.isfinite(state.w).all())
        ess = float(state.ess[-1])
        thresh = self._threshold.get_threshold(len(state.ess) - 2)

        if ess < thresh * self.num_particles or any_nans:
            update = self._kernel.update(self._next_key(), self.context, self._filter, state)
            self.context.absorb(update.context)
            self._filter = update.filter_
            state = update.state

        return state
