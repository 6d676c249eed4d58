"""APF — auxiliary particle filter of Pitt & Shephard.

Reference: pyfilter/filters/particle/apf.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import batched_gather, log_likelihood
from ..state import ParticleFilterCorrection, ParticleFilterPrediction
from .base import ParticleFilter


class APF(ParticleFilter):
    def predict(self, key, state) -> ParticleFilterPrediction:
        """Pass-through: the APF resamples inside :meth:`correct`
        (reference apf.py:16-23)."""
        identity = jnp.broadcast_to(
            jnp.arange(self.n_particles, dtype=jnp.int32).reshape(
                (self.n_particles,) + (1,) * len(self.batch_shape)
            ),
            self.particles,
        )
        return ParticleFilterPrediction(
            state.x, state.log_weights, state.normalized_weights(), identity
        )

    def correct(self, key, y, prediction) -> ParticleFilterCorrection:
        """Pre-weight with :math:`p(y_t | E[x_t])`, resample on the combined
        weights, propose from resampled particles, subtract the gathered
        pre-weights; per-step loglik adds the auxiliary normalizer
        (reference apf.py:25-46)."""
        k_resample, k_prop = jax.random.split(key)
        ts_state = prediction.get_timeseries_state()

        pre_weights = self.proposal.pre_weight(self.model, y, ts_state)
        resample_weights = pre_weights + prediction.log_weights

        if self._use_fused_resample(ts_state.value):
            # fused Pallas resample+gather (ops/expand.py) pulls the state
            # values AND the pre-weights through one streaming expansion
            (res_vals, res_prew), indices = self._fused_resample(
                k_resample, resample_weights, (ts_state.value, pre_weights)
            )
        else:
            indices = self.resampler(k_resample, resample_weights)
            res_vals = batched_gather(ts_state.value, indices, ts_state.event_ndim)
            res_prew = batched_gather(pre_weights, indices, 0)
        resampled_x = ts_state.copy(values=res_vals)

        if self.differentiable:
            # zero-valued Ścibior–Wood correction on the auxiliary resample
            # (base._ancestor_correction): the carried weights and the
            # uniform normalized weights both keep the ancestor gradient
            corr = self._ancestor_correction(resample_weights, indices)
            resampled_prediction = ParticleFilterPrediction(
                resampled_x, corr, jax.nn.softmax(corr, axis=0), indices
            )
        else:
            corr = 0.0
            zeros = jnp.zeros_like(resample_weights)
            resampled_prediction = ParticleFilterPrediction(
                resampled_x, zeros, zeros + 1.0 / self.n_particles, indices
            )

        x, inc_weights = self.proposal.sample_and_weight(
            k_prop, self.model, y, resampled_prediction
        )
        weights = inc_weights - res_prew + corr

        aux_norm = jnp.log(
            jnp.sum(prediction.normalized_weights * jnp.exp(pre_weights), axis=0)
        )
        ll = log_likelihood(weights) + aux_norm

        return ParticleFilterCorrection.from_weighted_particles(
            x, weights, ll, indices, compute_moments=self.record_moments
        )
