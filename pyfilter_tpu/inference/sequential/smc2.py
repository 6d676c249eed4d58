"""SMC2 — Chopin et al.'s nested sequential Monte Carlo.

Re-design of the reference's ``pyfilter/inference/sequential/smc2.py``.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

from ..state import SMC2State
from .base import SequentialParticleAlgorithm
from .kernels import ParticleMetropolisHastings
from .threshold import ConstantThreshold, Thresholder


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
