"""PMMH — particle marginal Metropolis-Hastings.

Re-design of the reference's ``pyfilter/inference/batch/mcmc/pmmh.py``
(Andrieu et al.): ``num_chains`` vectorized chains ride one lane axis through
the filter; every iteration is one :func:`run_pmmh` full re-filter.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...base import BaseAlgorithm
from ...logging import TQDMWrapper
from .proposals import BaseProposal, RandomWalk
from .state import PMMHResult
from .utils import run_pmmh


class PMMH(BaseAlgorithm):
    MONTE_CARLO_SAMPLES = (10_000,)

    def __init__(
        self,
        filter_,
        num_samples: int,
        num_chains: int = 4,
        proposal: BaseProposal = None,
        initializer: str = "mean",
        context=None,
        key=None,
        mesh=None,
        lane_axis: str = "lanes",
    ):
        """``mesh`` (optional): shard the vectorized chains over the mesh's
        ``lane_axis`` — each device runs its own chains' full re-filters."""
        super().__init__(filter_=filter_, context=context, key=key)

        self.num_samples = int(num_samples)
        self.num_chains = int(num_chains)

        self.context.set_batch_shape((self.num_chains,))
        self._filter = self._filter.set_batch_shape((self.num_chains,))

        self._proposal = proposal or RandomWalk()
        if initializer not in ("mean", "seed"):
            raise NotImplementedError(f"`{initializer}` is not configured!")
        self._initializer = initializer
        self._mesh = mesh
        self._lane_axis = (
            lane_axis
            if mesh is not None and lane_axis in getattr(mesh, "axis_names", ())
            else None
        )

    def _place_filter(self, filt):
        if self._mesh is None or self._lane_axis is None:
            return filt
        from ....parallel import lane_sharded_filter

        return lane_sharded_filter(filt, self._mesh, lane_axis=self._lane_axis)

    def initialize(self, y) -> PMMHResult:
        """Build the model, set chains to the prior mean (10k-sample MC
        estimate, reference pmmh.py:59-74), and run the initial full filter."""
        self.context.set_key(self._next_key())
        self._filter = self._filter.initialize_model(self.context)

        if self._initializer == "seed":
            raise NotImplementedError("the reference never implemented 'seed' either (pmmh.py:62-63)")

        for name in list(self.context.parameters):
            prior = self.context.get_prior(name)
            mean = jnp.mean(
                prior.sample(self._next_key(), self.MONTE_CARLO_SAMPLES), axis=0
            )
            mean = jnp.broadcast_to(mean, (self.num_chains,) + tuple(prior.event_shape))
            self.context.update_parameter(name, mean)

        self._filter = self._place_filter(self._filter.initialize_model(self.context))
        prev_res = self._filter.batch_filter(self._next_key(), jnp.asarray(y))
        return PMMHResult(dict(self.context.parameters), prev_res)

    def fit(self, y, logging=None) -> PMMHResult:
        y = jnp.asarray(y)
        state = self.initialize(y)
        logging = logging or TQDMWrapper()

        with logging.initialize(self, self.num_samples):
            prop_kernel = self._proposal.build(
                self.context, state, self._filter, y, key=self._next_key()
            )

            for i in range(self.num_samples):
                step = run_pmmh(
                    self._next_key(),
                    self.context,
                    state,
                    self._proposal,
                    prop_kernel,
                    self._filter,
                    y,
                    mutate_kernel=True,
                )
                self.context.absorb(step.context)
                state.filter_state = step.filter_state
                prop_kernel = step.proposal_kernel
                self._filter = self._place_filter(self._filter.initialize_model(self.context))

                state.update_chain(dict(self.context.parameters))
                logging.do_log(i, state)

        return state
