"""Nested (auxiliary) proposal of Naesseth et al.

Reference: pyfilter/filters/particle/proposals/nested.py — draw M candidate
samples per particle from the predictive, categorically select by observation
likelihood, weight by the log-mean observation likelihood over the nest.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from .base import Proposal


@dataclasses.dataclass(frozen=True)
class NestedProposal(Proposal):
    num_samples: int = 10

    def sample_and_weight(self, key, model, y, prediction):
        k_nest, k_select = jax.random.split(key)

        hidden_density = prediction.get_predictive_density(model)
        samples = hidden_density.sample(k_nest, (self.num_samples,))  # (M, N, *batch, *event)
        temp_state = prediction.get_timeseries_state().propagate_from(values=samples)

        # NaN-guarded softmax over the nest axis (reference nested.py:34-38)
        log_prob = model.build_density(temp_state).log_prob(y)  # (M, N, *batch)
        log_prob = jnp.nan_to_num(log_prob, nan=-jnp.inf, posinf=-jnp.inf)
        norm = logsumexp(log_prob, axis=0, keepdims=True)
        logits = jnp.where(jnp.isneginf(norm), jnp.zeros_like(log_prob), log_prob - norm)

        # categorical over the nest axis, per particle
        logits_last = jnp.moveaxis(logits, 0, -1)  # (N, *batch, M)
        best = jax.random.categorical(k_select, logits_last, axis=-1)  # (N, *batch)

        idx = best[None]
        if model.hidden.event_ndim > 0:
            idx = idx[..., None]
        idx = jnp.broadcast_to(idx, idx.shape[:1] + samples.shape[1:])
        best_particle = jnp.take_along_axis(samples, idx, axis=0)[0]

        inc_weight = logsumexp(log_prob, axis=0) - jnp.log(
            jnp.asarray(self.num_samples, log_prob.dtype)
        )
        return temp_state.copy(values=best_particle), inc_weight
