"""GPF — Gaussian particle filter of Kotecha & Djuric.

Reference: pyfilter/filters/particle/gpf.py. Never resamples; propagates the
cloud through a moment-matched Gaussian predictive. Because there is no
resample, its log-likelihood is differentiable w.r.t. model parameters as-is
(``differentiable=True`` is a no-op here — SISR/APF need the stop-gradient
ancestor correction, GPF does not).
"""

from __future__ import annotations

from ..state import ParticleFilterCorrection, ParticleFilterPrediction
from .base import ParticleFilter
from .proposals import GaussianProposal


class GPF(ParticleFilter):
    def __init__(self, model, particles: int, proposal=None, **kwargs):
        proposal = proposal if proposal is not None else GaussianProposal()
        super().__init__(model, particles, proposal=proposal, **kwargs)

    def predict(self, key, state) -> ParticleFilterPrediction:
        return ParticleFilterPrediction(
            state.x, state.log_weights, state.normalized_weights(), state.prev_indices
        )

    def correct(self, key, y, prediction) -> ParticleFilterCorrection:
        from ...utils import log_likelihood

        x_new, weights = self.proposal.sample_and_weight(key, self.model, y, prediction)
        return ParticleFilterCorrection.from_weighted_particles(
            x_new, weights, log_likelihood(weights), prediction.indices,
            compute_moments=self.record_moments,
        )
