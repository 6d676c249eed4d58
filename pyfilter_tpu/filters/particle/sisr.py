"""SISR — sequential importance sampling with adaptive resampling.

Reference: pyfilter/filters/particle/sisr.py (Gordon et al.). The reference's
data-dependent per-lane ``masked_scatter`` resampling (sisr.py:19-43) becomes a
branchless always-compute + per-lane ``where`` — the XLA-native formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.expand import systematic_expand
from ...utils import batched_gather, get_ess, log_likelihood
from ..state import ParticleFilterCorrection, ParticleFilterPrediction
from .base import ParticleFilter


class SISR(ParticleFilter):
    def predict(self, key, state) -> ParticleFilterPrediction:
        """ESS-gated per-lane resampling (reference sisr.py:14-48): lanes whose
        ESS is below ``ess_threshold * N`` resample and reset their weights;
        the rest pass through untouched.

        Lanes that do NOT resample keep identity ancestor indices (the
        reference carries the stale previous step's indices there,
        sisr.py:26 — conscious fix for correct genealogy tracing, SURVEY.md §8).
        """
        normalized = state.normalized_weights()
        ess = get_ess(normalized, normalized=True)  # (*batch,)

        ts_state = state.x
        weights = state.log_weights
        identity = jnp.broadcast_to(
            jnp.arange(self.n_particles, dtype=jnp.int32).reshape(
                (self.n_particles,) + (1,) * len(self.batch_shape)
            ),
            self.particles,
        )

        def resample_lanes(key):
            # per-lane gates: always-compute + per-lane where
            if self._use_fused_resample(ts_state.value):
                resampled_vals, fresh_idx = self._fused_resample(
                    key, normalized, ts_state.value, normalized=True
                )
            else:
                fresh_idx = self.resampler(key, normalized, normalized=True)
                resampled_vals = batched_gather(
                    ts_state.value, fresh_idx, ts_state.event_ndim
                )
            mask = ess < self.resample_threshold
            mask_p = mask[None]  # broadcast over particle axis
            indices = jnp.where(mask_p, fresh_idx, identity)

            if self.differentiable:
                # zero-valued, gradient-carrying reset (base._ancestor_correction)
                corr = self._ancestor_correction(weights, fresh_idx)
                new_weights = jnp.where(mask_p, corr, weights)
                new_normalized = jnp.where(
                    mask_p, jax.nn.softmax(corr, axis=0), normalized
                )
            else:
                new_weights = jnp.where(mask_p, 0.0, weights)
                new_normalized = jnp.where(
                    mask_p, 1.0 / self.n_particles, normalized
                )

            new_vals = jnp.where(
                mask.reshape((1,) + mask.shape + (1,) * ts_state.event_ndim),
                resampled_vals,
                ts_state.value,
            )
            return ParticleFilterPrediction(
                ts_state.copy(values=new_vals), new_weights, new_normalized, indices
            )

        def resample(key):
            # inside the scalar-gated cond branch the gate is known true:
            # no per-lane where needed
            if self._use_fused_resample(ts_state.value):
                # fused Pallas resample+gather (ops/expand.py): streams the
                # cloud instead of paying the XLA scatter+gather floor
                new_vals, indices = systematic_expand(
                    key, normalized, ts_state.value, normalized=True
                )
            else:
                indices = self.resampler(key, normalized, normalized=True)
                new_vals = batched_gather(ts_state.value, indices, ts_state.event_ndim)
            if self.differentiable:
                corr = self._ancestor_correction(weights, indices)
                new_w, new_norm = corr, jax.nn.softmax(corr, axis=0)
            else:
                new_w = jnp.zeros_like(weights)
                new_norm = jnp.full_like(normalized, 1.0 / self.n_particles)
            return ParticleFilterPrediction(
                ts_state.copy(values=new_vals), new_w, new_norm, indices
            )

        def passthrough(key):
            return ParticleFilterPrediction(ts_state, weights, normalized, identity)

        if self.batch_shape:
            return resample_lanes(key)

        # single filter: the gate is one scalar — lax.cond skips the whole
        # cumsum/sort/gather resampling pipeline on the (typically most)
        # steps where the ESS is healthy. Identical numerics to the reference's
        # host-side `if not mask.any()` early-out (sisr.py:25-26).
        return jax.lax.cond(ess < self.resample_threshold, resample, passthrough, key)

    def correct(self, key, y, prediction) -> ParticleFilterCorrection:
        """Propose, accumulate weights, estimate the per-step log-likelihood
        (reference sisr.py:50-56)."""
        x, inc_weights = self.proposal.sample_and_weight(key, self.model, y, prediction)
        new_weights = inc_weights + prediction.log_weights
        ll = log_likelihood(inc_weights, prediction.normalized_weights)
        return ParticleFilterCorrection.from_weighted_particles(
            x, new_weights, ll, prediction.indices, compute_moments=self.record_moments
        )
