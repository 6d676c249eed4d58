"""Sequential particle algorithms: the outer layer of nested SMC.

Re-design of the reference's ``pyfilter/inference/sequential/base.py``:
``num_particles`` parameter lanes ride the filter's batch axis; each
observation step runs one jit-compiled filter move over all lanes, and
rejuvenation kernels rebuild the model functionally.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

import jax.numpy as jnp

from ..base import BaseAlgorithm
from ..logging import TQDMWrapper
from ..state import RunningFilterResult, SequentialAlgorithmState


class SequentialParticleAlgorithm(BaseAlgorithm):
    """Reference sequential/base.py:14-102. Wires the filter's lane axis and
    the context's batch shape to the same ``num_particles``."""

    def __init__(self, filter_, num_particles: int, context=None, key=None, record_moments: bool = True):
        super().__init__(filter_, context=context, key=key)

        self.num_particles = int(num_particles)
        self._filter = self._filter.set_batch_shape((self.num_particles,))
        self.context.set_batch_shape((self.num_particles,))
        self.record_moments = record_moments

        self._callbacks: List[Callable] = []

    @property
    def particles(self) -> tuple:
        return (self.num_particles,)

    def register_callback(self, callback):
        if callback is None or callback in self._callbacks:
            return
        self._callbacks.append(callback)

    def initialize(self) -> SequentialAlgorithmState:
        """Build the model from the context (registering priors), initialize
        parameters, initialize the filter cloud (reference base.py:51-62)."""
        self.context.set_key(self._next_key())
        self._filter = self._filter.initialize_model(self.context)
        self.context.initialize_parameters()
        # rebuild with the (possibly re-)initialized values
        self._filter = self._filter.initialize_model(self.context)

        init_state = self._filter.initialize(self._next_key())
        init_weights = jnp.zeros(self.particles)
        return SequentialAlgorithmState(
            init_weights,
            RunningFilterResult(
                init_state, jnp.zeros(self.particles), record_moments=self.record_moments
            ),
        )

    def step(self, y, state: SequentialAlgorithmState) -> SequentialAlgorithmState:
        result = self._step(y, state)
        for cb in self._callbacks:
            cb(self, y, result)
        result.bump_iteration()
        return result

    def _step(self, y, state):
        raise NotImplementedError

    def _filter_step(self, y, state: SequentialAlgorithmState):
        """One jitted filter move over all lanes, appended into the state."""
        correction = self._filter.step(
            self._next_key(),
            y,
            state.filter_state.latest_state,
            first_step=state.current_iteration == 0,
        )
        state.append(correction)
        return state

    def fit(self, y, logging=None) -> SequentialAlgorithmState:
        logging = logging or TQDMWrapper()
        y = jnp.asarray(y)

        with logging.initialize(self, y.shape[0]):
            state = self.initialize()
            for yt in y:
                state = self.step(yt, state)
                logging.do_log(state.current_iteration, state)
            return state


class CombinedSequentialParticleAlgorithm(SequentialParticleAlgorithm):
    """Run one algorithm for the first ``switch`` observations, then another
    (reference sequential/base.py:105-171)."""

    def __init__(
        self,
        filter_,
        num_particles: int,
        switch: int,
        first_kw: Dict[str, Any] = None,
        second_kw: Dict[str, Any] = None,
        context=None,
        key=None,
    ):
        super().__init__(filter_, num_particles, context=context, key=key)

        self._first = self.make_first(filter_, self.context, num_particles, **(first_kw or {}))
        self._second = self.make_second(filter_, self.context, num_particles, **(second_kw or {}))
        self._first.set_key(self._next_key())
        self._second.set_key(self._next_key())

        self._when_to_switch = int(switch)
        self._is_switched = False

    def make_first(self, filter_, context, particles, **kwargs) -> SequentialParticleAlgorithm:
        raise NotImplementedError

    def make_second(self, filter_, context, particles, **kwargs) -> SequentialParticleAlgorithm:
        raise NotImplementedError

    def do_on_switch(self, first, second, state):
        raise NotImplementedError

    def initialize(self):
        return self._first.initialize()

    def _step(self, y, state):
        if not self._is_switched:
            if state.current_iteration <= self._when_to_switch:
                return self._first._step(y, state)
            self._is_switched = True
            state = self.do_on_switch(self._first, self._second, state)
            # the second algorithm takes over the first's rebound filter/context
            self._second.context = self._first.context
            self._second.filter = self._first.filter
        return self._second._step(y, state)
