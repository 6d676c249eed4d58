"""Interacting Multiple Model (IMM) filter — Markov-switching Gaussian filtering.

New capability beyond the reference (which has no regime-switching machinery):
the IMM estimator (Blom & Bar-Shalom 1988) runs one Gaussian filter (EKF or
UKF) per candidate model ("regime") and lets a latent Markov chain with
transition matrix ``Pi`` switch between them. Each step:

1. **mixing** — every regime's prior is refreshed as the moment-matched
   mixture of all regimes' posteriors, weighted by the Markov transition
   probabilities (this is what distinguishes IMM from a plain GSF bank: the
   regimes EXCHANGE information, so a regime that has been dormant for 100
   steps re-enters with a sane prior instead of a diverged one);
2. **per-regime filtering** — one EKF/UKF predict+correct per regime from its
   mixed prior, each producing an innovation log-likelihood;
3. **regime update** — the Markov-predicted regime probabilities are
   re-weighted by the innovation likelihoods (a K-vector log-sum-exp).

TPU shape: the regime axis is a static leading axis of size K; candidate
models are stacked leaf-wise into ONE pytree and every per-regime operation
is a single ``jax.vmap`` over it — batched matmuls, no Python branching on
regimes. The Markov mixing is one (K, K) log-matmul.

Candidate models must share pytree STRUCTURE (same classes, same static
config — only leaf values may differ), which is exactly the "same dynamics,
different parameters" setting IMM is for (maneuver/volatility regimes).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ._lane import lane_concat, lane_exchange, lane_resample, lane_vmap_batch_filter
from .result import FilterResult


class MarkovSwitchingModel(NamedTuple):
    """Declarative spec of a regime-switching model — a pytree, so its leaves
    (including the transition matrix) may be TRACED inference parameters.

    This is the "model" the marginal adapter's builders return for
    ``kind="imm"`` (filters/marginal.py): learning the transition matrix by
    marginal MCMC means the builder computes ``transition_matrix`` from a
    context parameter (e.g. a softmax of logits — rows then sum to 1 by
    construction) and :class:`InteractingMultipleModel` consumes it in-trace.

    ``models``: tuple of candidate :class:`StateSpaceModel`\\ s (same pytree
    structure, only leaf values differ); ``initial_probs`` optional.
    """

    models: Any
    transition_matrix: jax.Array
    initial_probs: Optional[jax.Array] = None


class IMMState(NamedTuple):
    means: jax.Array      # (K, d) per-regime posterior means
    covs: jax.Array       # (K, d, d)
    log_probs: jax.Array  # (K,) regime probabilities, normalized
    log_likelihood: jax.Array
    time_index: jax.Array

    def get_mean(self):
        """Regime-marginalized mean: sum_k P(regime k) m_k."""
        return jnp.exp(self.log_probs) @ self.means

    def get_variance(self):
        """Diagonal of the regime-marginalized covariance."""
        p = jnp.exp(self.log_probs)
        m_bar = p @ self.means
        within = p @ jnp.diagonal(self.covs, axis1=-2, axis2=-1)
        between = p @ (self.means - m_bar) ** 2
        return within + between

    def most_likely_regime(self):
        return jnp.argmax(self.log_probs)

    # -- lane surgery (leaves lane-leading under the marginal adapter's vmap) --
    def exchange(self, other: "IMMState", mask) -> "IMMState":
        return lane_exchange(self, other, mask)

    def resample(self, indices, entire_history: bool = True) -> "IMMState":
        return lane_resample(self, indices)

    @staticmethod
    def lane_concat(states) -> "IMMState":
        return lane_concat(IMMState, states)


def _stack_models(candidates: Sequence):
    """Stack candidate models leaf-wise into one pytree with a leading K axis.

    Raises if the candidates' pytree structures differ (different classes or
    static config) — the vmapped step requires one shared program. Leaves at
    the same position may differ in SHAPE as long as they broadcast (e.g. one
    candidate's parameter lane-batched, another's a scalar constant).
    """
    treedefs = {str(jax.tree_util.tree_structure(m)) for m in candidates}
    if len(treedefs) != 1:
        raise ValueError(
            "IMM candidate models must share pytree structure (same classes "
            f"and static config); got {len(treedefs)} distinct structures"
        )

    def stack(*leaves):
        leaves = [jnp.asarray(l, jnp.float32) for l in leaves]
        shape = jnp.broadcast_shapes(*(l.shape for l in leaves))
        return jnp.stack([jnp.broadcast_to(l, shape) for l in leaves])

    return jax.tree_util.tree_map(stack, *candidates)


class InteractingMultipleModel:
    """IMM estimator over ``K = len(candidates)`` regime models.

    ``candidates`` is a sequence of candidate models OR a
    :class:`MarkovSwitchingModel` spec (then ``transition_matrix`` /
    ``initial_probs`` come from the spec — the builder-friendly form whose
    leaves may be traced inference parameters).

    ``transition_matrix`` is the (K, K) Markov matrix ``Pi[i, j] =
    P(regime j at t+1 | regime i at t)`` (rows sum to 1; host-validated only
    for concrete arrays — a TRACED matrix, e.g. a softmax of learned logits,
    is trusted to be row-stochastic by construction).
    ``initial_probs`` defaults to uniform. ``base`` selects the per-regime
    filter ("ekf", "ukf" or "ckf" — any Gaussian-step protocol engine, extra
    kwargs pass through), exactly as in :class:`GaussianSumFilter`.
    ``batch_shape=(K,)`` vectorizes independent IMM lanes exactly as in
    :class:`GaussianSumFilter`.
    """

    def __init__(self, candidates, transition_matrix=None,
                 initial_probs=None, base: str = "ekf", batch_shape=(),
                 **base_kwargs):
        if isinstance(candidates, MarkovSwitchingModel):
            spec = candidates
            candidates = spec.models
            transition_matrix = spec.transition_matrix
            if initial_probs is None:
                initial_probs = spec.initial_probs
        if transition_matrix is None:
            raise ValueError("transition_matrix is required (directly or via the spec)")
        k = len(candidates)
        if k < 2:
            raise ValueError("IMM needs at least 2 candidate models")
        trans = jnp.asarray(transition_matrix, jnp.float32)
        if trans.shape != (k, k):
            raise ValueError(f"transition_matrix must be ({k}, {k}); got {trans.shape}")
        if not isinstance(trans, jax.core.Tracer):
            import numpy as np

            if not np.allclose(np.asarray(trans).sum(axis=1), 1.0, atol=1e-5):
                raise ValueError("transition_matrix rows must sum to 1")
        from .gsf import GAUSSIAN_BASES

        if base not in GAUSSIAN_BASES:
            raise ValueError(
                f"unknown base filter {base!r} (want one of {sorted(GAUSSIAN_BASES)})"
            )
        self._base_cls = GAUSSIAN_BASES[base]
        self.base_name = base
        self._base_kwargs = base_kwargs
        self.candidates = tuple(candidates)
        self.models = _stack_models(candidates)
        self.template = candidates[0]
        self.n_regimes = k
        self.batch_shape = tuple(batch_shape)
        self.log_trans = jnp.log(jnp.maximum(trans, 1e-30))
        if initial_probs is None:
            self.log_p0 = jnp.full((k,), -jnp.log(float(k)))
        else:
            p0 = jnp.asarray(initial_probs, jnp.float32)
            self.log_p0 = jnp.log(jnp.maximum(p0, 1e-30)) - jnp.log(p0.sum())

    # -- per-regime base-filter hooks (vmapped over the stacked model axis) ----
    def _regime_filter(self, model):
        return self._base_cls(model, **self._base_kwargs)

    def initialize(self) -> IMMState:
        means, covs = jax.vmap(
            lambda mdl: self._regime_filter(mdl).initialize_moments()
        )(self.models)
        return IMMState(means, covs, self.log_p0, jnp.asarray(0.0), jnp.asarray(0.0))

    def filter(self, y_t, state: IMMState, n_transitions: int = None) -> IMMState:
        """One IMM move: Markov mixing, vmapped per-regime predict+correct,
        regime re-weighting. All-NaN observations skip the correction exactly
        (per-regime ll == 0), leaving regime probabilities on their Markov
        prediction."""
        y_t = jnp.atleast_1d(jnp.asarray(y_t, jnp.float32))
        if n_transitions is None:
            n_transitions = int(self.template.observe_every_step)

        # 1. mixing (moment-matched per-regime priors)
        #    log_mix[i, j] = log P(was i | now j) under the Markov prediction
        logits = self.log_trans + state.log_probs[:, None]       # (K_i, K_j)
        log_p_pred = jax.scipy.special.logsumexp(logits, axis=0)  # (K_j,)
        mix = jnp.exp(logits - log_p_pred[None, :])               # columns sum to 1
        means0 = jnp.einsum("ij,id->jd", mix, state.means)
        dev = state.means[:, None, :] - means0[None, :, :]        # (K_i, K_j, d)
        covs0 = jnp.einsum("ij,ide->jde", mix, state.covs) + jnp.einsum(
            "ij,ijd,ije->jde", mix, dev, dev
        )

        # 2. per-regime predict + correct
        t = state.time_index

        def one_regime(mdl, m, p):
            filt = self._regime_filter(mdl)
            tt = t
            for _ in range(n_transitions):
                m, p, _ = filt.predict_moments(m, p, tt)
                tt = tt + 1.0
            return filt.correct_moments(m, p, y_t, tt)

        means, covs, ll_k = jax.vmap(one_regime)(self.models, means0, covs0)

        # 3. regime update
        post = log_p_pred + ll_k
        norm = jax.scipy.special.logsumexp(post)
        # all-NaN gap: every ll_k is exactly 0, so the increment is the
        # logsumexp of the (normalized) Markov prediction — force the exact 0
        # the family's skip contract promises instead of its float residue
        step_ll = jnp.where(jnp.isnan(y_t).all(), 0.0, norm)
        return IMMState(
            means, covs, post - norm,
            state.log_likelihood + step_ll, t + float(n_transitions),
        )

    def batch_filter(self, y) -> FilterResult:
        """IMM filtering over the whole sequence as one ``lax.scan``; the
        recorded means/variances are the regime-marginalized moments, and the
        per-step regime probabilities are returned in ``aux``."""
        if self.batch_shape:
            spec = MarkovSwitchingModel(
                self.candidates, jnp.exp(self.log_trans), jnp.exp(self.log_p0)
            )
            return lane_vmap_batch_filter(
                lambda s: InteractingMultipleModel(
                    s, base=self.base_name, **self._base_kwargs
                ),
                spec, self.batch_shape, y,
            )
        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 1:
            y = y[:, None]

        state1 = self.filter(y[0], self.initialize(), n_transitions=1)
        first = (
            state1.log_likelihood, state1.get_mean(), state1.get_variance(),
            state1.log_probs,
        )

        def step(state, y_t):
            new = self.filter(y_t, state)
            step_ll = new.log_likelihood - state.log_likelihood
            return new, (step_ll, new.get_mean(), new.get_variance(), new.log_probs)

        last, rest = jax.lax.scan(step, state1, y[1:])
        step_lls, means, variances, regime_lps = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), first, rest
        )
        return FilterResult(
            log_likelihood=last.log_likelihood,
            step_log_likelihoods=step_lls,
            filter_means=means,
            filter_variances=variances,
            latest_state=last,
            states=None,
            aux=regime_lps,  # (T, K) per-step regime log-probabilities
        )
