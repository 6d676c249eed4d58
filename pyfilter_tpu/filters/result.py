"""Filter result container.

Functional re-design of the reference's ``pyfilter/filters/result.py``: the
mutable accumulator (running loglik sum + deque histories) becomes an immutable
NamedTuple produced in one shot by the ``lax.scan`` in
:meth:`BaseFilter.batch_filter` — histories are stacked arrays with a leading
time axis instead of deques.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .state import ParticleFilterCorrection


class FilterHistory(NamedTuple):
    """Per-step recorded particle states (reference ``record_states=True``).

    Leaves are time-stacked: ``values`` is ``(T, N, *batch, *event)``,
    ``log_weights``/``prev_indices`` are ``(T, N, *batch)``, ``time_indexes``
    is ``(T,)`` (or ``(T, *batch)``).
    """

    time_indexes: jax.Array
    values: jax.Array
    log_weights: jax.Array
    prev_indices: jax.Array


class FilterResult(NamedTuple):
    """Output of a full filtering pass (reference filters/result.py).

    ``log_likelihood`` is the total data log-likelihood estimate (summed over
    time, reference result.py:130); ``filter_means``/``filter_variances`` are
    the per-step weighted moments stacked over the leading time axis.
    """

    log_likelihood: jax.Array
    step_log_likelihoods: jax.Array
    filter_means: jax.Array
    filter_variances: jax.Array
    latest_state: ParticleFilterCorrection
    states: Optional[FilterHistory] = None
    #: filter-specific per-step extras (time-major, lanes second — e.g. the
    #: IMM's ``(T, K)`` regime log-probabilities). Kept OUT of ``states`` so
    #: ``resample``/``exchange`` never meet a non-FilterHistory there.
    aux: Optional[jax.Array] = None

    @property
    def loglikelihood(self) -> jax.Array:
        return self.log_likelihood

    def resample(self, indices: jax.Array, entire_history: bool = True) -> "FilterResult":
        """Permute batch lanes by ``indices`` (reference result.py:97-117).

        When ``entire_history`` is False only the latest state and the running
        log-likelihood are permuted (the reference's semantics for online
        algorithms, kernels/online.py:49).
        """
        lat = self.latest_state.resample(indices)
        ll = jnp.take(self.log_likelihood, indices, axis=0)
        if not entire_history:
            return self._replace(latest_state=lat, log_likelihood=ll)

        def lane_take(a, lead):
            return None if a is None else jnp.take(a, indices, axis=lead)

        states = self.states
        if states is not None:
            states = FilterHistory(
                states.time_indexes,
                lane_take(states.values, 2),
                lane_take(states.log_weights, 2),
                lane_take(states.prev_indices, 2),
            )
        return FilterResult(
            ll,
            lane_take(self.step_log_likelihoods, 1),
            lane_take(self.filter_means, 1),
            lane_take(self.filter_variances, 1),
            lat,
            states,
            lane_take(self.aux, 1),
        )

    def exchange(self, other: "FilterResult", mask: jax.Array) -> "FilterResult":
        """Lanes where ``mask`` is True take ``other``'s values (reference
        result.py:76-95)."""
        lat = self.latest_state.exchange(other.latest_state, mask)

        def mix(mine, theirs, lead):
            if mine is None:
                return None
            m = mask.reshape((1,) * lead + mask.shape + (1,) * (jnp.ndim(mine) - lead - mask.ndim))
            return jnp.where(m, theirs, mine)

        states = self.states
        if states is not None and other.states is not None:
            states = FilterHistory(
                states.time_indexes,
                mix(states.values, other.states.values, 2),
                mix(states.log_weights, other.states.log_weights, 2),
                mix(states.prev_indices, other.states.prev_indices, 2),
            )
        return FilterResult(
            mix(self.log_likelihood, other.log_likelihood, 0),
            mix(self.step_log_likelihoods, other.step_log_likelihoods, 1),
            mix(self.filter_means, other.filter_means, 1),
            mix(self.filter_variances, other.filter_variances, 1),
            lat,
            states,
            mix(self.aux, other.aux, 1) if other.aux is not None else self.aux,
        )
