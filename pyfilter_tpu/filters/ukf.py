"""Unscented Kalman filter — derivative-free sigma-point Gaussian filtering.

New capability beyond the reference (which is particle-only): the scaled
unscented transform (Julier & Uhlmann; van der Merwe) propagates 2d+1 sigma
points through the model's transition/observation means instead of
linearizing them, capturing the posterior mean to 2nd order where the EKF is
1st-order. Completes the Gaussian filter family: :class:`KalmanFilter`
(exact, linear), :class:`ExtendedKalmanFilter` (autodiff Jacobians),
``UnscentedKalmanFilter`` (derivative-free). Like the EKF, everything is
traced JAX — differentiable w.r.t. model parameters and vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..timeseries import TimeseriesState
from ._masked import density_covariance, initial_gaussian_moments, masked_gaussian_update
from .ekf import EKFState
from .result import FilterResult


class UnscentedKalmanFilter:
    """Sigma-point filter over a :class:`StateSpaceModel` whose transition and
    observation densities expose ``mean``/``variance`` (noise treated as
    additive, re-evaluated at the running mean; MVN densities contribute
    their full ``covariance_matrix``, others ``diag(variance)``).

    ``alpha``/``beta``/``kappa`` are the scaled-UT parameters; the defaults
    (1.0, 2.0, 0.0) give the classic non-scaled transform with Gaussian
    fourth-moment correction — safe (non-negative mean weights) at any state
    dimension.
    """

    def __init__(self, model, alpha: float = 1.0, beta: float = 2.0, kappa: float = 0.0):
        self.model = model
        hidden = model.hidden
        self._ev = int(hidden.event_ndim)
        init = hidden.initial_distribution()
        self._d_x = int(init.event_shape[0]) if self._ev == 1 else 1
        self._d_y = int(model.event_shape[0]) if model.event_shape else 1

        d = self._d_x
        lam = alpha * alpha * (d + kappa) - d
        self._lam = float(lam)
        wm = jnp.full((2 * d + 1,), 1.0 / (2.0 * (d + lam)))
        self._wm = wm.at[0].set(lam / (d + lam))
        self._wc = self._wm.at[0].add(1.0 - alpha * alpha + beta)

    # -- model probes (vectorized over a sigma-point axis) ---------------------
    def _state(self, v, t) -> TimeseriesState:
        # v: (S, d) sigma points; scalar processes see (S,)
        return TimeseriesState(t, v if self._ev == 1 else v[..., 0], self._ev)

    def _trans_mean(self, v, t):
        d = self.model.hidden.build_density(self._state(v, t))
        m = jnp.asarray(d.mean)
        return m if self._ev == 1 else m[..., None]

    def _trans_cov_at(self, m, t):
        d = self.model.hidden.build_density(self._state(m[None], t))
        return density_covariance(d, self._d_x)

    # -- unscented transform ----------------------------------------------------
    def _sigma_points(self, m, p):
        d = self._d_x
        scaled = jnp.linalg.cholesky((d + self._lam) * p)  # (d, d) lower
        offsets = scaled.T  # rows are the offset vectors
        return jnp.concatenate([m[None], m[None] + offsets, m[None] - offsets], axis=0)

    def _predict(self, m, p, t):
        pts = self._sigma_points(m, p)  # (2d+1, d)
        f_pts = self._trans_mean(pts, t)  # (2d+1, d)
        m_new = self._wm @ f_pts
        diff = f_pts - m_new
        p_new = (self._wc[:, None] * diff).T @ diff + self._trans_cov_at(m, t)
        # cross-covariance Cov(x_t, x_{t+1}) for the unscented RTS smoother
        diff_x = pts - m
        cross = (self._wc[:, None] * diff_x).T @ diff
        return m_new, p_new, cross

    def initialize(self) -> EKFState:
        m0, p0 = initial_gaussian_moments(
            self.model.hidden.initial_distribution(), self._d_x
        )
        return EKFState(m0, p0, jnp.asarray(0.0), jnp.asarray(0.0))

    # -- Gaussian-step protocol (see ExtendedKalmanFilter.initialize_moments) --
    def initialize_moments(self):
        """(m0, P0) of the initial Gaussian belief."""
        return self.initialize()[:2]

    def predict_moments(self, m, p, t):
        """One unscented transition of the belief moments."""
        return self._predict(m, p, t)

    def correct_moments(self, m, p, y_t, t):
        """One unscented measurement update; returns the step log-likelihood."""
        return self._update(m, p, y_t, t)

    def predict_moments_cross(self, m, p, t, n_transitions: int):
        """``n_transitions`` composed transitions plus the sigma-point
        cross-covariance ``Cov(x_t, x_{t+n})``, chained through the Gaussian
        identity ``C_total = C_1 P_1^{-1} C_2 ...`` (same composition as
        :meth:`smooth`'s forward pass)."""
        cross_total = None
        for _ in range(n_transitions):
            m_new, p_new, cross = self._predict(m, p, t)
            cross_total = (
                cross if cross_total is None
                else cross_total @ jnp.linalg.solve(p, cross)
            )
            m, p, t = m_new, p_new, t + 1.0
        return m, p, cross_total

    def _update(self, m, p, y_t, t):
        pts = self._sigma_points(m, p)  # (2d+1, d)
        g_pts = jnp.atleast_2d(jnp.asarray(self._obs_mean_pts(pts, t)))  # (2d+1, d_y)
        y_hat = self._wm @ g_pts
        diff_y = g_pts - y_hat
        r = self._obs_cov_at(m, t)
        s_mat = (self._wc[:, None] * diff_y).T @ diff_y + r
        diff_x = pts - m
        c_xy = (self._wc[:, None] * diff_x).T @ diff_y  # (d, d_y)

        # partial-NaN components are exactly marginalized (all-NaN skip is the
        # degenerate case: zero gain/innovation, ll_t == 0)
        k_gain, innov, ll_t, s_eff = masked_gaussian_update(y_t, y_hat, c_xy, s_mat)
        m_new = m + k_gain @ innov
        p_new = p - k_gain @ s_eff @ k_gain.T
        return m_new, p_new, ll_t

    def _obs_mean_pts(self, pts, t):
        d = self.model.build_density(self._state(pts, t))
        m = jnp.asarray(d.mean)
        if m.ndim == 1:  # scalar observation per sigma point
            m = m[:, None]
        return m

    def _obs_cov_at(self, m, t):
        d = self.model.build_density(self._state(m[None], t))
        return density_covariance(d, self._d_y)

    def filter(self, y_t, state: EKFState, n_transitions: int = None) -> EKFState:
        """One unscented predict+update move with all-NaN observation skip
        (same timing contract as ``KalmanFilter.filter``)."""
        y_t = jnp.atleast_1d(jnp.asarray(y_t, jnp.float32))
        if n_transitions is None:
            n_transitions = int(self.model.observe_every_step)

        m, p, t = state.mean, state.cov, state.time_index
        for _ in range(n_transitions):
            m, p, _ = self._predict(m, p, t)
            t = t + 1.0

        m_new, p_new, ll_t = self._update(m, p, y_t, t)
        ll_new = state.log_likelihood + ll_t
        return EKFState(m_new, p_new, ll_new, t)

    def batch_filter(self, y) -> FilterResult:
        """Sigma-point Gaussian filtering over the whole sequence as one
        ``lax.scan`` (time axis leading)."""
        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 1:
            y = y[:, None]

        state1 = self.filter(y[0], self.initialize(), n_transitions=1)
        first = (state1.log_likelihood, state1.mean, jnp.diagonal(state1.cov))

        def step(state, y_t):
            new = self.filter(y_t, state)
            step_ll = new.log_likelihood - state.log_likelihood
            return new, (step_ll, new.mean, jnp.diagonal(new.cov))

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

    # -- smoothing ---------------------------------------------------------------
    def smooth(self, y, initial_moments=None):
        """Unscented RTS smoother: the backward gain comes from the sigma-point
        cross-covariance ``Cov(x_t, x_{t+1})`` — no Jacobians anywhere.
        Returns ``(means, covs)`` of shapes ``(T, d)`` and ``(T, d, d)``.
        ``initial_moments=(m0, P0)`` overrides the model prior (the
        Gaussian-sum smoother's per-component hook).
        """
        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 1:
            y = y[:, None]
        oes = int(self.model.observe_every_step)

        def forward_move(m, p, t, y_t, n):
            # compose n unscented transitions; the smoother gain needs the
            # cross-covariance from the FILTERED state to the final predicted
            # one, chained as C_total = C_1 P_1^{-1} C_2 ... (Gaussian chain)
            cross_total = None
            for _ in range(n):
                m_new, p_new, cross = self._predict(m, p, t)
                if cross_total is None:
                    cross_total = cross
                else:
                    cross_total = cross_total @ jnp.linalg.solve(p, cross)
                m, p, t = m_new, p_new, t + 1.0
            m_pred, p_pred = m, p
            m_f, p_f, _ = self._update(m, p, y_t, t)
            return (m_pred, p_pred, m_f, p_f, cross_total), t

        m0, p0 = self.initialize_moments() if initial_moments is None else initial_moments
        rec0, t1 = forward_move(m0, p0, jnp.asarray(0.0), y[0], 1)

        def fwd(carry, y_t):
            m, p, t = carry
            rec, t_new = forward_move(m, p, t, y_t, oes)
            return (rec[2], rec[3], t_new), rec

        _, rec_rest = jax.lax.scan(fwd, (rec0[2], rec0[3], t1), y[1:])
        m_pred, p_pred, m_f, p_f, crosses = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), rec0, rec_rest
        )

        def backward(carry, inp):
            ms_next, ps_next = carry
            m_f_t, p_f_t, m_pred_next, p_pred_next, cross_next = inp
            gain = jnp.linalg.solve(p_pred_next, cross_next.T).T
            ms = m_f_t + gain @ (ms_next - m_pred_next)
            ps = p_f_t + gain @ (ps_next - p_pred_next) @ gain.T
            return (ms, ps), (ms, ps)

        if y.shape[0] == 1:
            return m_f, p_f
        _, (ms_rest, ps_rest) = jax.lax.scan(
            backward,
            (m_f[-1], p_f[-1]),
            (m_f[:-1], p_f[:-1], m_pred[1:], p_pred[1:], crosses[1:]),
            reverse=True,
        )
        means = jnp.concatenate([ms_rest, m_f[-1][None]], axis=0)
        covs = jnp.concatenate([ps_rest, p_f[-1][None]], axis=0)
        return means, covs


class CubatureKalmanFilter(UnscentedKalmanFilter):
    """Third-degree spherical-radial cubature filter (Arasaratnam & Haykin
    2009): 2d equally-weighted points at ``m +/- sqrt(d) * chol(P) e_i``.

    Realized as the unscented transform's ``alpha=1, beta=0, kappa=0``
    special case (``lambda = 0``): the center sigma point carries zero mean
    AND zero covariance weight, so the propagated moments are exactly the
    cubature rule's. Compared to the default UT this drops the Gaussian
    fourth-moment correction (``beta=2``) — all weights are strictly
    positive-semidefinite at any state dimension, which is the CKF's selling
    point for high-dimensional or heavy-tailed-prior regimes. Inherits the
    full UKF surface: ``batch_filter``, the square-root-free RTS
    :meth:`smooth`, partial-NaN marginalization, MVN full covariances.
    """

    def __init__(self, model):
        super().__init__(model, alpha=1.0, beta=0.0, kappa=0.0)
