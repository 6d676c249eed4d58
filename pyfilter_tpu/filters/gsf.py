"""Gaussian-sum filter — a weighted bank of EKF/UKF components.

New capability beyond the reference (which is particle-only): the posterior
is represented as a K-component Gaussian mixture (Alspach & Sorenson 1972),
each component propagated by a base Gaussian filter (EKF or UKF) and
re-weighted by its own innovation likelihood each step. This is the cheapest
filter in the family that can hold a MULTIMODAL posterior — e.g. the sign
ambiguity of a quadratic observation ``y = x^2 + v``, where a single-Gaussian
EKF/UKF collapses onto one mode (or, linearized at 0, never leaves it).

TPU shape: the component axis is a leading batch axis of static size K —
every predict/correct is one ``jax.vmap`` over the base filter's step, so the
whole bank compiles to batched matmuls; the weight update is a K-vector
log-sum-exp. No data-dependent branching, no pruning inside the scan: K is
static, degenerate components simply carry vanishing weight.

The initial mixture moment-matches the prior exactly: components are split
along the dominant eigenvector of ``P0`` with symmetric offsets and a
compensated shared covariance, so mixture mean == ``m0`` and mixture
covariance == ``P0`` for every K (see :meth:`GaussianSumFilter.initialize`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ._lane import lane_concat, lane_exchange, lane_resample, lane_vmap_batch_filter
from .ekf import ExtendedKalmanFilter
from .result import FilterResult
from .ukf import CubatureKalmanFilter, UnscentedKalmanFilter

#: per-component Gaussian step engines (the shared Gaussian-step protocol:
#: initialize_moments / predict_moments / correct_moments)
GAUSSIAN_BASES = {
    "ekf": ExtendedKalmanFilter,
    "ukf": UnscentedKalmanFilter,
    "ckf": CubatureKalmanFilter,
}


class GSFState(NamedTuple):
    means: jax.Array        # (K, d)
    covs: jax.Array         # (K, d, d)
    log_weights: jax.Array  # (K,) normalized: logsumexp == 0
    log_likelihood: jax.Array
    time_index: jax.Array

    def get_mean(self):
        """Mixture mean: sum_k w_k m_k."""
        w = jnp.exp(self.log_weights)
        return w @ self.means

    def get_variance(self):
        """Diagonal of the mixture covariance (law of total variance)."""
        w = jnp.exp(self.log_weights)
        m_bar = w @ self.means
        within = w @ jnp.diagonal(self.covs, axis1=-2, axis2=-1)
        between = w @ (self.means - m_bar) ** 2
        return within + between

    def map_component(self):
        """(mean, cov) of the highest-weight component — the tracked mode."""
        k = jnp.argmax(self.log_weights)
        return self.means[k], self.covs[k]

    # -- lane surgery (leaves lane-leading under the marginal adapter's vmap) --
    def exchange(self, other: "GSFState", mask) -> "GSFState":
        return lane_exchange(self, other, mask)

    def resample(self, indices, entire_history: bool = True) -> "GSFState":
        return lane_resample(self, indices)

    @staticmethod
    def lane_concat(states) -> "GSFState":
        return lane_concat(GSFState, states)


class GaussianSumFilter:
    """Bank of ``n_components`` EKF/UKF filters over a :class:`StateSpaceModel`.

    ``base`` selects the per-component filter: ``"ekf"`` (autodiff Jacobians;
    ``iterations`` passes through for the iterated EKF), ``"ukf"`` (scaled
    unscented transform; ``alpha``/``beta``/``kappa`` pass through), or
    ``"ckf"`` (cubature) — any engine exposing the Gaussian-step protocol
    (``initialize_moments``/``predict_moments``/``correct_moments``).

    ``spread`` is the fraction of the prior's dominant-eigenvector variance
    carried by the component MEANS at initialization (the rest stays in the
    shared component covariance). ``spread=0`` starts all components
    identical — they then remain identical forever (same update), so keep it
    positive when you want the bank to actually disambiguate modes.

    ``batch_shape=(K,)`` vectorizes K independent banks over lane-batched
    model-parameter leaves (one ``jax.vmap`` — see ``filters/_lane.py``).
    """

    def __init__(self, model, n_components: int = 4, base: str = "ekf",
                 spread: float = 0.5, batch_shape=(), **base_kwargs):
        if n_components < 1:
            raise ValueError("n_components must be >= 1")
        if not 0.0 <= spread < 1.0:
            raise ValueError("spread must be in [0, 1)")
        if base not in GAUSSIAN_BASES:
            raise ValueError(
                f"unknown base filter {base!r} (want one of {sorted(GAUSSIAN_BASES)})"
            )
        self.base = GAUSSIAN_BASES[base](model, **base_kwargs)
        self.base_name = base
        self._base_kwargs = base_kwargs
        self.model = model
        self.n_components = int(n_components)
        self.spread = float(spread)
        self.batch_shape = tuple(batch_shape)

    # -- init -------------------------------------------------------------------
    def initialize(self) -> GSFState:
        """Split the Gaussian prior ``N(m0, P0)`` into K moment-matched
        components along the dominant eigenvector of ``P0``.

        Equal weights 1/K; symmetric standardized offsets ``a_k`` scaled so
        ``mean(a_k^2) = spread``; shared covariance ``P0 - spread * lam vv^T``.
        Mixture mean and covariance equal ``(m0, P0)`` exactly for every K.
        """
        k = self.n_components
        m0, p0 = self.base.initialize_moments()
        if k == 1:
            means = m0[None]
            covs = p0[None]
        else:
            lam, vecs = jnp.linalg.eigh(p0)
            lam_max, v = lam[-1], vecs[:, -1]
            u = jnp.linspace(-1.0, 1.0, k)
            a = u * jnp.sqrt(self.spread / jnp.mean(u * u))
            means = m0[None] + a[:, None] * jnp.sqrt(lam_max) * v[None]
            shared = p0 - self.spread * lam_max * jnp.outer(v, v)
            covs = jnp.broadcast_to(shared, (k,) + p0.shape)
        log_w = jnp.full((k,), -jnp.log(float(k)))
        return GSFState(means, covs, log_w, jnp.asarray(0.0), jnp.asarray(0.0))

    # -- one move -----------------------------------------------------------------
    def filter(self, y_t, state: GSFState, n_transitions: int = None) -> GSFState:
        """One predict+update move of the whole bank (all-NaN skip included:
        the masked update returns ll_k == 0 and identity gains for every
        component, so weights and step loglik are untouched)."""
        y_t = jnp.atleast_1d(jnp.asarray(y_t, jnp.float32))
        if n_transitions is None:
            n_transitions = int(self.model.observe_every_step)

        means, covs, t = state.means, state.covs, state.time_index
        for _ in range(n_transitions):
            means, covs, _ = jax.vmap(
                lambda m, p: self.base.predict_moments(m, p, t)
            )(means, covs)
            t = t + 1.0

        means, covs, ll_k = jax.vmap(
            lambda m, p: self.base.correct_moments(m, p, y_t, t)
        )(means, covs)

        # a numerically dead component (lost positive-definiteness -> NaN
        # innovation likelihood) must not poison the bank through the
        # logsumexp: demote it to -inf weight instead
        ll_k = jnp.where(jnp.isfinite(ll_k), ll_k, -jnp.inf)
        logits = state.log_weights + ll_k
        norm = jax.scipy.special.logsumexp(logits)
        # if EVERY component died, keep the previous weights and record a
        # -inf step increment (the mixture genuinely assigns zero density)
        all_dead = ~jnp.isfinite(norm)
        log_w = jnp.where(all_dead, state.log_weights, logits - norm)
        # all-NaN gap: every ll_k is exactly 0 (masked update), so force the
        # exact 0 increment the family's skip contract promises instead of
        # the logsumexp's float residue (mirrors the IMM)
        step_ll = jnp.where(jnp.isnan(y_t).all(), 0.0, norm)
        log_w = jnp.where(jnp.isnan(y_t).all(), state.log_weights, log_w)
        return GSFState(means, covs, log_w, state.log_likelihood + step_ll, t)

    # -- whole sequence ------------------------------------------------------------
    def batch_filter(self, y) -> FilterResult:
        """Gaussian-sum filtering over the whole sequence as one ``lax.scan``.

        ``filter_means``/``filter_variances`` are the MIXTURE moments; grab
        ``latest_state.map_component()`` (or the recorded states) when the
        posterior is genuinely multimodal and the mixture mean is meaningless.
        """
        if self.batch_shape:
            return lane_vmap_batch_filter(
                lambda mdl: GaussianSumFilter(
                    mdl, self.n_components, self.base_name, self.spread,
                    **self._base_kwargs,
                ),
                self.model, self.batch_shape, y,
            )
        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 1:
            y = y[:, None]

        state1 = self.filter(y[0], self.initialize(), n_transitions=1)
        first = (state1.log_likelihood, state1.get_mean(), state1.get_variance())

        def step(state, y_t):
            new = self.filter(y_t, state)
            step_ll = new.log_likelihood - state.log_likelihood
            return new, (step_ll, new.get_mean(), new.get_variance())

        last, rest = jax.lax.scan(step, state1, y[1:])
        step_lls, means, variances = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), first, rest
        )
        return FilterResult(
            log_likelihood=last.log_likelihood,
            step_log_likelihoods=step_lls,
            filter_means=means,
            filter_variances=variances,
            latest_state=last,
            states=None,
        )

    # -- smoothing ------------------------------------------------------------------
    def smooth(self, y):
        """Gaussian-sum RTS smoother.

        GSF components never exchange information (the component index is a
        GLOBAL latent variable: the filter only re-weights the bank), so the
        smoother under the filter's own approximation is component-
        conditional: each component runs its base filter's RTS smoother from
        its own split initialization, and the smoothed-marginal mixture
        weights are the FINAL filtered weights ``w_T^k = P(component k | all
        data)``. A single-component bank therefore reduces exactly to the
        base smoother, and on a linear model the mixture collapses onto the
        exact RTS marginals for every K.

        Returns ``(means, variances, components)``: the mixture smoothed
        moments ``(T, d)``/``(T, d)`` and the per-component triple
        ``(means (K, T, d), covs (K, T, d, d), log_weights (K,))``.
        """
        init = self.initialize()
        log_w = self.batch_filter(y).latest_state.log_weights  # final weights
        sm_means, sm_covs = jax.vmap(
            lambda m0, p0: self.base.smooth(y, initial_moments=(m0, p0))
        )(init.means, init.covs)

        w = jnp.exp(log_w)
        mix_mean = jnp.einsum("k,ktd->td", w, sm_means)
        dev = sm_means - mix_mean[None]
        mix_var = jnp.einsum(
            "k,ktd->td", w, jnp.diagonal(sm_covs, axis1=-2, axis2=-1)
        ) + jnp.einsum("k,ktd->td", w, dev * dev)
        return mix_mean, mix_var, (sm_means, sm_covs, log_w)
