"""Filter state pytrees.

Functional JAX re-design of the reference's ``pyfilter/filters/state.py`` and
``pyfilter/filters/particle/state.py``: the mutable ``Prediction``/``Correction``
objects become immutable NamedTuple pytrees; in-place lane surgery
(``resample``/``exchange``, reference particle/state.py:150-168) becomes pure
gather/where over the tuple's leaves.

Axis convention (uniform across the package): particle axis 0, lane/batch axes
next, event axes last. ``log_weights``/``prev_indices`` have shape
``(N, *batch)``; ``log_likelihood``/``mean``/``variance`` have shape
``(*batch, ...)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..distributions import Distribution, MultivariateNormal, Normal
from ..timeseries import TimeseriesState
from ..utils import batched_gather, get_mean_and_variance, normalize


class ParticleFilterPrediction(NamedTuple):
    """Predicted (pre-correction) filter state (reference particle/state.py:14-69).

    ``x`` holds the (possibly resampled) previous particles; ``log_weights`` the
    carried log-weights (reset to 0 on resampled lanes); ``normalized_weights``
    the normalized probabilities; ``indices`` the ancestor indices used.
    """

    x: TimeseriesState
    log_weights: jax.Array
    normalized_weights: jax.Array
    indices: jax.Array

    def get_timeseries_state(self) -> TimeseriesState:
        return self.x

    def create_state_from_prediction(self, key, model, compute_moments: bool = True) -> "ParticleFilterCorrection":
        """Propagate the hidden process without correcting (sub-steps / NaN skip;
        reference particle/state.py:38-42)."""
        x_new = model.hidden.propagate(key, self.x)
        ll = jnp.zeros(self.normalized_weights.shape[1:], dtype=self.normalized_weights.dtype)
        return ParticleFilterCorrection.from_weighted_particles(
            x_new, self.log_weights, ll, self.indices, compute_moments=compute_moments
        )

    def get_predictive_density(self, model, key=None, approximate: bool = False) -> Distribution:
        """Exact (mixture-component) or moment-matched Gaussian predictive density
        (reference particle/state.py:44-69).

        The approximate path propagates the cloud one step (needs ``key``) and
        fits a Gaussian to the weighted propagated cloud.
        """
        if not approximate:
            return model.hidden.build_density(self.x)

        if key is None:
            raise ValueError("approximate predictive density requires a PRNG key")
        x_new = model.hidden.propagate(key, self.x)
        event_ndim = model.hidden.event_ndim
        mean, cov = get_mean_and_variance(
            x_new.value, self.normalized_weights, event_ndim=event_ndim, covariance=True
        )
        if event_ndim == 0:
            return Normal(mean, jnp.sqrt(cov))
        return MultivariateNormal(mean, covariance_matrix=cov)


class ParticleFilterCorrection(NamedTuple):
    """Corrected filter state (reference particle/state.py:72-211).

    ``log_likelihood`` is the *per-step* log-likelihood increment
    :math:`\\log \\hat p(y_t | y_{1:t-1})`; the running sum lives in
    :class:`~pyfilter_tpu.filters.result.FilterResult`. ``mean``/``variance``
    are the weighted filter moments, computed eagerly as in the reference
    (particle/state.py:95).
    """

    x: TimeseriesState
    log_weights: jax.Array
    log_likelihood: jax.Array
    prev_indices: jax.Array
    mean: jax.Array
    variance: jax.Array

    @classmethod
    def from_weighted_particles(
        cls, x: TimeseriesState, log_weights, log_likelihood, prev_indices, compute_moments: bool = True
    ):
        if compute_moments:
            mean, var = get_mean_and_variance(
                x.value, normalize(log_weights), event_ndim=x.event_ndim
            )
        else:
            # placeholder moments (filters built with record_moments=False skip
            # the two per-step reductions over the cloud)
            mean = jnp.zeros_like(log_likelihood)
            var = jnp.zeros_like(log_likelihood)
        return cls(x, log_weights, log_likelihood, prev_indices, mean, var)

    # -- reference Correction protocol --------------------------------------
    @property
    def timeseries_state(self) -> TimeseriesState:
        return self.x

    def get_timeseries_state(self) -> TimeseriesState:
        return self.x

    def get_loglikelihood(self) -> jax.Array:
        return self.log_likelihood

    def get_mean(self) -> jax.Array:
        return self.mean

    def get_variance(self) -> jax.Array:
        return self.variance

    def normalized_weights(self) -> jax.Array:
        return normalize(self.log_weights)

    def get_covariance(self) -> jax.Array:
        """Weighted covariance of the particle cloud (reference state.py:117-137)."""
        ev = self.x.event_ndim
        _, cov = get_mean_and_variance(
            self.x.value, self.normalized_weights(), event_ndim=ev, covariance=ev == 1
        )
        return cov

    def predict_path(self, key, model, num_steps: int):
        """Simulate ``num_steps`` ahead from the corrected cloud
        (reference particle/state.py:173-174)."""
        return model.sample_states(key, num_steps, x_0=self.x)

    # -- lane surgery (pure versions of reference state.py:139-168) ----------
    def resample(self, indices: jax.Array) -> "ParticleFilterCorrection":
        """Gather lane axis 0 of every batch-indexed leaf by ``indices``.

        ``indices`` has shape ``(*batch,)`` — this permutes *lanes* (parameter
        particles / chains), leaving the particle axis intact. Unlike the
        reference (whose ``_ll`` line is a no-op self-assignment, state.py:154 —
        SURVEY.md §8), the log-likelihood IS permuted here.
        """
        def lane_take(a, lead):
            return jnp.take(a, indices, axis=lead)

        return ParticleFilterCorrection(
            self.x.copy(values=lane_take(self.x.value, 1)),
            lane_take(self.log_weights, 1),
            lane_take(self.log_likelihood, 0),
            lane_take(self.prev_indices, 1),
            lane_take(self.mean, 0),
            lane_take(self.variance, 0),
        )

    def exchange(self, other: "ParticleFilterCorrection", mask: jax.Array) -> "ParticleFilterCorrection":
        """Lanes where ``mask`` is True take ``other``'s values (reference
        state.py:156-168), as a pure where over leaves."""

        def mix(mine, theirs, lead):
            m = mask
            target_ndim = jnp.ndim(mine)
            m = m.reshape((1,) * lead + m.shape + (1,) * (target_ndim - lead - m.ndim))
            return jnp.where(m, theirs, mine)

        return ParticleFilterCorrection(
            self.x.copy(values=mix(self.x.value, other.x.value, 1)),
            mix(self.log_weights, other.log_weights, 1),
            mix(self.log_likelihood, other.log_likelihood, 0),
            mix(self.prev_indices, other.prev_indices, 1),
            mix(self.mean, other.mean, 0),
            mix(self.variance, other.variance, 0),
        )

    @staticmethod
    def lane_concat(states) -> "ParticleFilterCorrection":
        """Concatenate several corrections along the LANE axis (axis 1 for
        particle-leading leaves, axis 0 for lane-leading ones) — the
        waste-free SMC2 rejuvenation merges the per-chain states of
        ``chain_len`` stages into one swarm this way."""
        s0 = states[0]
        return ParticleFilterCorrection(
            s0.x.copy(values=jnp.concatenate([s.x.value for s in states], axis=1)),
            jnp.concatenate([s.log_weights for s in states], axis=1),
            jnp.concatenate([s.log_likelihood for s in states], axis=0),
            jnp.concatenate([s.prev_indices for s in states], axis=1),
            jnp.concatenate([s.mean for s in states], axis=0),
            jnp.concatenate([s.variance for s in states], axis=0),
        )

    def resample_particles(self, indices: jax.Array) -> "ParticleFilterCorrection":
        """Gather the PARTICLE axis by ``indices`` of shape ``(N, *batch)``
        (used by rejuvenation kernels that resample state particles)."""
        new_x = self.x.copy(values=batched_gather(self.x.value, indices, self.x.event_ndim))
        lw = jnp.zeros_like(self.log_weights)
        return ParticleFilterCorrection.from_weighted_particles(
            new_x, lw, self.log_likelihood, indices.astype(self.prev_indices.dtype)
        )
