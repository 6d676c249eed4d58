"""Algorithm state containers.

Re-design of the reference's ``pyfilter/inference/state.py`` and
``sequential/state.py``. These are host-level orchestration objects (the outer
per-observation loop is Python in the reference too); every array they hold is
a ``jnp`` array updated functionally by the jitted kernels.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..filters.result import FilterResult
from ..filters.state import ParticleFilterCorrection
from ..utils import get_ess, normalize


class RunningFilterResult:
    """Accumulating per-lane filter record for online algorithms — the role
    the reference's mutable ``FilterResult`` plays inside sequential
    algorithms (result.py:119-133): latest corrected state + running
    log-likelihood (+ optional recorded moments).

    Lane surgery (:meth:`resample`/:meth:`exchange`) assumes a SINGLE lane
    axis, the same limit the reference imposes on ``batch_shape``
    (filters/base.py:116-117); filters themselves accept arbitrary lane rank,
    but the sequential algorithms always run one lane dim (SURVEY.md §8)."""

    def __init__(
        self,
        latest_state: ParticleFilterCorrection,
        log_likelihood: jax.Array,
        record_moments: bool = True,
    ):
        self.latest_state = latest_state
        self.log_likelihood = log_likelihood
        self.record_moments = record_moments
        self.filter_means: List[jax.Array] = []
        self.filter_variances: List[jax.Array] = []

    @property
    def loglikelihood(self) -> jax.Array:
        return self.log_likelihood

    def append(self, correction: ParticleFilterCorrection):
        self.latest_state = correction
        self.log_likelihood = self.log_likelihood + correction.log_likelihood
        if self.record_moments:
            self.filter_means.append(correction.mean)
            self.filter_variances.append(correction.variance)

    def resample(self, indices, entire_history: bool = True) -> "RunningFilterResult":
        new = RunningFilterResult(
            self.latest_state.resample(indices),
            jnp.take(self.log_likelihood, indices, axis=0),
            self.record_moments,
        )
        if entire_history:
            new.filter_means = [jnp.take(m, indices, axis=0) for m in self.filter_means]
            new.filter_variances = [jnp.take(v, indices, axis=0) for v in self.filter_variances]
        else:
            new.filter_means = list(self.filter_means)
            new.filter_variances = list(self.filter_variances)
        return new

    def exchange(
        self, other: Union["RunningFilterResult", FilterResult], mask
    ) -> "RunningFilterResult":
        """Lanes where ``mask`` take ``other``'s latest state and loglik.
        ``other`` may be a full :class:`FilterResult` from a fresh
        ``batch_filter`` (the PMMH proposal side)."""
        other_latest = other.latest_state
        other_ll = other.log_likelihood
        new = RunningFilterResult(
            self.latest_state.exchange(other_latest, mask),
            jnp.where(mask, other_ll, self.log_likelihood),
            self.record_moments,
        )
        new.filter_means = list(self.filter_means)
        new.filter_variances = list(self.filter_variances)
        return new

    @classmethod
    def from_filter_result(cls, result: FilterResult, record_moments: bool = True) -> "RunningFilterResult":
        new = cls(result.latest_state, result.log_likelihood, record_moments)
        if record_moments and result.filter_means is not None:
            new.filter_means = [m for m in result.filter_means]
            new.filter_variances = [v for v in result.filter_variances]
        return new

    def state_dict(self) -> dict:
        # the correction is a pytree containing custom nodes (TimeseriesState);
        # persist its leaves — the loading side supplies the structure.
        leaves = jax.tree_util.tree_leaves(self.latest_state)
        return {
            "log_likelihood": np.asarray(self.log_likelihood),
            "latest_state_leaves": [np.asarray(l) for l in leaves],
        }

    def load_state_dict(self, state_dict: dict):
        self.log_likelihood = jnp.asarray(state_dict["log_likelihood"])
        treedef = jax.tree_util.tree_structure(self.latest_state)
        loaded = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(l) for l in state_dict["latest_state_leaves"]]
        )
        if loaded.x.value.shape != self.latest_state.x.value.shape:
            raise ValueError(
                f"Seems like you're loading a different shape: "
                f"{self.latest_state.x.value.shape} != {loaded.x.value.shape}"
            )
        self.latest_state = loaded


class AlgorithmState:
    """Base state class (reference inference/state.py:7-10)."""


class FilterAlgorithmState(AlgorithmState):
    """State wrapping a filter record (reference inference/state.py:13-58)."""

    def __init__(self, filter_state):
        self.filter_state = filter_state

    def replicate(self, filter_state) -> "FilterAlgorithmState":
        return FilterAlgorithmState(filter_state)


def scrub_lane_increment(inc: jax.Array) -> jax.Array:
    """NaN/+inf per-lane loglik increments become ``-inf``: a parameter lane
    whose filter step produced non-finite evidence (overflowed bijected
    parameters, collapsed noise scales) is a DEAD lane, not a poison pill —
    ``-inf`` zeroes its weight, keeps ESS/normalize well-defined (both scrub
    ``-inf`` to weight 0 with uniform backfill), and still fires the
    non-finite rejuvenation trigger so the lane is resampled away. Without
    the scrub a single NaN increment propagates ``w -> ESS -> normalize``
    into every lane. The filter's own log-likelihood record stays faithful —
    only the lane-weight accumulation is scrubbed."""
    return jnp.where(jnp.isnan(inc) | (inc == jnp.inf), -jnp.inf, inc)


class SequentialAlgorithmState(FilterAlgorithmState):
    """State for sequential particle algorithms (reference sequential/state.py:8-69):
    per-lane parameter log-weights ``w``, per-step parameter-ESS history, and
    the running filter record."""

    def __init__(self, w: jax.Array, filter_state: RunningFilterResult):
        super().__init__(filter_state)
        self.w = w
        self.ess: List[jax.Array] = [get_ess(w)]
        self.current_iteration: int = 0

    def normalized_weights(self) -> jax.Array:
        return normalize(self.w)

    def append(self, correction: ParticleFilterCorrection):
        """Accumulate the latest filter step: bump parameter weights by the
        per-lane loglik increment and record the ESS."""
        self.filter_state.append(correction)
        self.w = self.w + scrub_lane_increment(correction.log_likelihood)
        self.ess.append(get_ess(self.w))

    def bump_iteration(self):
        self.current_iteration += 1

    def replicate(self, filter_state) -> "SequentialAlgorithmState":
        new = SequentialAlgorithmState(jnp.zeros_like(self.w), filter_state)
        return new

    def state_dict(self) -> dict:
        return {
            "w": np.asarray(self.w),
            "ess": [np.asarray(e) for e in self.ess],
            "current_iteration": self.current_iteration,
            "filter_state": self.filter_state.state_dict(),
        }

    def load_state_dict(self, state_dict: dict):
        self.w = jnp.asarray(state_dict["w"])
        self.ess = [jnp.asarray(e) for e in state_dict["ess"]]
        self.current_iteration = int(state_dict["current_iteration"])
        self.filter_state.load_state_dict(state_dict["filter_state"])


class SMC2State(SequentialAlgorithmState):
    """Adds the parsed-observation history required for SMC2's re-filtering
    rejuvenation (reference sequential/state.py:72-95)."""

    def __init__(self, w, filter_state, parsed_data: Optional[list] = None):
        super().__init__(w, filter_state)
        # rows are kept HOST-side (numpy): ``parsed_data_array`` is then one
        # device_put instead of a t-operand jnp.stack, which XLA would compile
        # as a fresh program for every distinct history length the
        # rejuvenations hit (measured seconds of per-run compile time)
        self.parsed_data: List[np.ndarray] = [np.asarray(y) for y in (parsed_data or [])]

    def append_data(self, y):
        self.parsed_data.append(np.asarray(y))

    @property
    def parsed_data_host(self) -> np.ndarray:
        return np.stack(self.parsed_data, axis=0)

    @property
    def parsed_data_array(self) -> jax.Array:
        return jnp.asarray(self.parsed_data_host)

    def state_dict(self) -> dict:
        res = super().state_dict()
        res["parsed_data"] = [np.asarray(y) for y in self.parsed_data]
        return res

    def load_state_dict(self, state_dict: dict):
        super().load_state_dict(state_dict)
        self.parsed_data = [np.asarray(y) for y in state_dict["parsed_data"]]
