"""NESS / FixedWidthNESS — online jitter-based joint inference.

Re-design of the reference's ``pyfilter/inference/sequential/ness.py``
(Miguez & Crisan).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..state import SequentialAlgorithmState
from .base import SequentialParticleAlgorithm
from .kernels import NonShrinkingKernel, OnlineKernel


class BaseOnlineAlgorithm(SequentialParticleAlgorithm):
    """Reference ness.py:15-59: jitter-rejuvenate the parameter lanes before
    the filter step whenever :meth:`do_update_particles` fires.

    The chunked ``fit`` expresses the same pre-step trigger as an
    after-previous-step trigger: "rejuvenate before step t+1" and
    "rejuvenate after step t" are the same event — except after the final
    observation, where step t+1 never happens (``_prestep_trigger``)."""

    _chunk_supported = True
    _prestep_trigger = True

    def __init__(self, filter_, particles, kernel=None, discrete: bool = False, context=None, key=None, **kwargs):
        super().__init__(filter_, particles, context=context, key=key, **kwargs)
        self._kernel = OnlineKernel(kernel=kernel or NonShrinkingKernel(), discrete=discrete)

    def do_update_particles(self, state: SequentialAlgorithmState) -> bool:
        raise NotImplementedError

    def _step(self, y, state):
        if self.do_update_particles(state):
            state = self._do_rejuvenate(state)

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

    def _trigger_rows(self, t0, n):
        return np.full(n, self._threshold, np.float32), np.zeros(n, np.bool_)


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

    def _trigger_rows(self, t0, n):
        # the reference triggers before 1-based step i when i % block_len == 0,
        # i.e. after 0-based global step j when (j + 2) % block_len == 0
        force = np.asarray([(t0 + j + 2) % self._bl == 0 for j in range(n)], np.bool_)
        return np.full(n, -np.inf, np.float32), force
