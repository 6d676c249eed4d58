"""PMMH chain state (reference pyfilter/inference/batch/mcmc/state.py)."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ...state import FilterAlgorithmState


class PMMHResult(FilterAlgorithmState):
    """Collects per-iteration parameter samples of the vectorized chains
    (reference state.py:10-38). ``samples[name]`` stacks to
    ``(num_samples, num_chains, *event)``."""

    def __init__(self, initial_parameters: Dict[str, jax.Array], filter_state):
        super().__init__(filter_state)
        self.samples: Dict[str, List[jax.Array]] = {
            k: [jnp.asarray(v)] for k, v in initial_parameters.items()
        }

    def update_chain(self, parameters: Dict[str, jax.Array]):
        for k, v in parameters.items():
            self.samples[k].append(jnp.asarray(v))

    def as_arrays(self) -> Dict[str, np.ndarray]:
        return {k: np.stack([np.asarray(s) for s in v], axis=0) for k, v in self.samples.items()}
