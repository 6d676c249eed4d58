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

    # -- smoothing ------------------------------------------------------------------
    def smooth(self, y):
        """Kim (1994) smoother for Markov-switching state-space models.

        Forward: the IMM filter records per step the per-regime filtered
        moments and regime probabilities. Backward, for each step ``t``:

        1. **discrete smoothing** — the smoothed joint regime probability
           ``P(r_t=i, r_{t+1}=j | y_{1:T}) ≈ mu_t(i) Pi[i,j]
           mu_{t+1|T}(j) / mu_{t+1|t}(j)`` (Kim's approximation: the regime
           path decouples from the continuous state given the filtered
           summaries), marginalized to ``mu_{t|T}(i)``;
        2. **per-pair RTS** — regime i's filtered moments are predicted
           through regime j's dynamics (``predict_moments_cross`` composes
           the ``observe_every_step`` sub-steps) and smoothed against regime
           j's smoothed moments with the standard RTS gain;
        3. **collapse** — the K² pair moments are moment-matched back to K
           per-regime Gaussians with the conditional weights
           ``P(r_{t+1}=j | r_t=i, y_{1:T})``.

        With identical regimes and any transition matrix this reduces exactly
        to the single-model RTS smoother. Returns ``(means, variances,
        regime_log_probs, per_regime)``: the regime-marginalized smoothed
        moments ``(T, d)``/``(T, d)``, the smoothed regime log-probabilities
        ``(T, K)``, and ``per_regime = (means (T, K, d), covs (T, K, d, d))``.
        """
        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 1:
            y = y[:, None]
        oes = int(self.template.observe_every_step)

        # forward pass: record filtered per-regime moments + regime log-probs
        state1 = self.filter(y[0], self.initialize(), n_transitions=1)
        rec0 = (state1.means, state1.covs, state1.log_probs, state1.time_index)

        def fwd(state, y_t):
            new = self.filter(y_t, state)
            return new, (new.means, new.covs, new.log_probs, new.time_index)

        _, rec_rest = jax.lax.scan(fwd, state1, y[1:])
        m_f, p_f, log_mu, times = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), rec0, rec_rest
        )

        def pair_predict(m_i, p_i, mdl_j, t):
            return self._regime_filter(mdl_j).predict_moments_cross(m_i, p_i, t, oes)

        def backward(carry, inp):
            m_s_next, p_s_next, log_mu_s_next = carry
            m_f_t, p_f_t, log_mu_t, t_t = inp

            # (K_i, K_j) pair predictions of regime i's moments under model j
            mp, pp, cc = jax.vmap(
                lambda mdl_j: jax.vmap(
                    lambda m_i, p_i: pair_predict(m_i, p_i, mdl_j, t_t)
                )(m_f_t, p_f_t)
            )(self.models)
            mp = jnp.swapaxes(mp, 0, 1)  # -> (K_i, K_j, d)
            pp = jnp.swapaxes(pp, 0, 1)
            cc = jnp.swapaxes(cc, 0, 1)

            # 1. discrete backward recursion (Kim's approximation)
            log_mu_pred = jax.scipy.special.logsumexp(
                log_mu_t[:, None] + self.log_trans, axis=0
            )  # (K_j,)
            lj = (
                log_mu_t[:, None] + self.log_trans
                + log_mu_s_next[None, :] - log_mu_pred[None, :]
            )  # (K_i, K_j) smoothed joint log-probs (normalized by construction)
            log_mu_s_t = jax.scipy.special.logsumexp(lj, axis=1)
            w_cond = jnp.exp(lj - log_mu_s_t[:, None])  # P(r_{t+1}=j | r_t=i, y)

            # 2. per-pair RTS smoothing
            gain = jnp.linalg.solve(jnp.swapaxes(pp, -1, -2), jnp.swapaxes(cc, -1, -2))
            gain = jnp.swapaxes(gain, -1, -2)  # cc @ pp^{-1}, batched (K_i, K_j)
            m_pair = m_f_t[:, None] + jnp.einsum(
                "ijab,ijb->ija", gain, m_s_next[None] - mp
            )
            p_pair = p_f_t[:, None] + jnp.einsum(
                "ijab,ijbc,ijdc->ijad", gain, p_s_next[None] - pp, gain
            )

            # 3. moment-matched collapse over the NEXT regime
            m_s_t = jnp.einsum("ij,ija->ia", w_cond, m_pair)
            dev = m_pair - m_s_t[:, None]
            p_s_t = jnp.einsum("ij,ijab->iab", w_cond, p_pair) + jnp.einsum(
                "ij,ija,ijb->iab", w_cond, dev, dev
            )
            return (m_s_t, p_s_t, log_mu_s_t), (m_s_t, p_s_t, log_mu_s_t)

        last = (m_f[-1], p_f[-1], log_mu[-1])
        if y.shape[0] == 1:
            m_s, p_s, lp_s = (leaf[None] for leaf in last)
        else:
            _, (m_rest, p_rest, lp_rest) = jax.lax.scan(
                backward, last, (m_f[:-1], p_f[:-1], log_mu[:-1], times[:-1]),
                reverse=True,
            )
            m_s = jnp.concatenate([m_rest, m_f[-1][None]], axis=0)
            p_s = jnp.concatenate([p_rest, p_f[-1][None]], axis=0)
            lp_s = jnp.concatenate([lp_rest, log_mu[-1][None]], axis=0)

        mu = jnp.exp(lp_s)  # (T, K)
        mean = jnp.einsum("tk,tka->ta", mu, m_s)
        dev = m_s - mean[:, None]
        var = jnp.einsum("tk,tkaa->ta", mu, p_s) + jnp.einsum(
            "tk,tka,tka->ta", mu, dev, dev
        )
        return mean, var, lp_s, (m_s, p_s)
