"""NESS / FixedWidthNESS — online jitter-based joint inference.

Re-design of the reference's ``pyfilter/inference/sequential/ness.py``
(Miguez & Crisan).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..state import SequentialAlgorithmState
from .base import SequentialParticleAlgorithm
from .kernels import NonShrinkingKernel, OnlineKernel


class BaseOnlineAlgorithm(SequentialParticleAlgorithm):
    """Reference ness.py:15-59: jitter-rejuvenate the parameter lanes before
    the filter step whenever :meth:`do_update_particles` fires."""

    def __init__(self, filter_, particles, kernel=None, discrete: bool = False, context=None, key=None, **kwargs):
        super().__init__(filter_, particles, context=context, key=key, **kwargs)
        self._kernel = OnlineKernel(kernel=kernel or NonShrinkingKernel(), discrete=discrete)

    def do_update_particles(self, state: SequentialAlgorithmState) -> bool:
        raise NotImplementedError

    def _step(self, y, state):
        if self.do_update_particles(state):
            update = self._kernel.update(self._next_key(), self.context, self._filter, state)
            self.context.absorb(update.context)
            self._filter = update.filter_
            state = update.state

        return self._filter_step(y, state)


class NESS(BaseOnlineAlgorithm):
    """ESS-triggered updates, threshold 0.9 (reference ness.py:62-85)."""

    def __init__(self, filter_, particles, threshold: float = 0.9, **kwargs):
        super().__init__(filter_, particles, **kwargs)
        self._threshold = threshold * particles

    def do_update_particles(self, state):
        ess = state.ess
        triggered = state.current_iteration > 0 and float(ess[-1]) < self._threshold
        return triggered or bool(~jnp.isfinite(state.w).all())


class FixedWidthNESS(BaseOnlineAlgorithm):
    """Block-scheduled updates every ``block_len`` steps (reference ness.py:88-109)."""

    def __init__(self, filter_, particles, block_len: int = 125, **kwargs):
        super().__init__(filter_, particles, **kwargs)
        self._bl = int(block_len)
        self._num_iterations = 0

    def do_update_particles(self, state):
        self._num_iterations += 1
        return (self._num_iterations % self._bl == 0) or bool(
            ~jnp.isfinite(state.w).all()
        )
