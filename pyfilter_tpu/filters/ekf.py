"""Extended Kalman filter — autodiff-linearized Gaussian filtering.

New capability beyond the reference (which is particle-only; its closest
analogue is the ``Linearized``/``LocalLinearization`` proposals,
reference pyfilter/filters/particle/proposals/linearized.py, which linearize
inside a particle filter rather than replacing it): the EKF propagates a
single Gaussian belief through the model's (possibly nonlinear) transition
and observation means, with Jacobians taken by ``jax.jacfwd`` at every step —
the TPU-native formulation of the classical hand-derived-Jacobian EKF.

Unlike :class:`KalmanFilter` (which extracts constant matrices through numpy
at construction), everything here is traced JAX: the filter re-linearizes at
the running mean each step, handles state-dependent diffusion (evaluated at
the mean), works on any :class:`StateSpaceModel` whose transition and
observation densities expose ``mean``/``variance``, and is differentiable
w.r.t. model parameters (``jax.grad`` through ``batch_filter`` works).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..timeseries import TimeseriesState
from ._lane import lane_concat, lane_exchange, lane_resample
from ._masked import density_covariance, initial_gaussian_moments, masked_gaussian_update
from .result import FilterResult


class EKFState(NamedTuple):
    mean: jax.Array       # (d,)
    cov: jax.Array        # (d, d)
    log_likelihood: jax.Array
    time_index: jax.Array

    @property
    def x(self) -> TimeseriesState:
        return TimeseriesState(self.time_index, self.mean, 1)

    def get_mean(self):
        return self.mean

    def get_variance(self):
        return jnp.diagonal(self.cov, axis1=-2, axis2=-1)

    # -- lane surgery (used when a leading chain/lane axis is present, e.g.
    # GaussianMarginalFilter results inside PMMH) ------------------------------
    def exchange(self, other: "EKFState", mask) -> "EKFState":
        return lane_exchange(self, other, mask)

    def resample(self, indices, entire_history: bool = True) -> "EKFState":
        return lane_resample(self, indices)

    @staticmethod
    def lane_concat(states) -> "EKFState":
        """Concatenate along the (leading) lane axis — every EKFState leaf is
        lane-leading (waste-free SMC2 with GaussianMarginalFilter lanes)."""
        return lane_concat(EKFState, states)


class ExtendedKalmanFilter:
    """First-order EKF over a :class:`StateSpaceModel`.

    Requirements: the hidden transition density and the observation density
    must be (approximately) Gaussian — their ``mean`` is differentiated for
    the Jacobians and their noise covariances are re-evaluated at the running
    mean every step: the exact ``covariance_matrix`` for MVN densities
    (correlated noise preserved), ``diag(variance)`` otherwise.

    ``iterations > 1`` gives the iterated EKF: the measurement update is
    re-linearized at each Gauss-Newton iterate (see :meth:`_correct`), which
    markedly improves the mean under strongly nonlinear observations at the
    cost of ``iterations`` extra observation-Jacobian evaluations per step.
    """

    def __init__(self, model, iterations: int = 1):
        if iterations < 1:
            raise ValueError("iterations must be >= 1")
        self.model = model
        self.iterations = int(iterations)
        hidden = model.hidden
        self._ev = int(hidden.event_ndim)
        init = hidden.initial_distribution()
        self._d_x = int(init.event_shape[0]) if self._ev == 1 else 1
        self._d_y = int(model.event_shape[0]) if model.event_shape else 1

    # -- model probes (vector-canonical views of the densities) ---------------
    def _state(self, v, t) -> TimeseriesState:
        return TimeseriesState(t, v if self._ev == 1 else v[0], self._ev)

    def _trans_mean(self, v, t):
        d = self.model.hidden.build_density(self._state(v, t))
        return jnp.atleast_1d(jnp.asarray(d.mean))

    def _trans_cov(self, v, t):
        d = self.model.hidden.build_density(self._state(v, t))
        return density_covariance(d, self._d_x)

    def _obs_mean(self, v, t):
        d = self.model.build_density(self._state(v, t))
        return jnp.atleast_1d(jnp.asarray(d.mean))

    def _obs_cov(self, v, t):
        d = self.model.build_density(self._state(v, t))
        return density_covariance(d, self._d_y)

    # -- Gaussian-step protocol --------------------------------------------------
    # Every Gaussian filter in the family (EKF/iEKF, UKF, CKF) exposes these
    # three methods — the explicit surface the bank filters (GSF, IMM) and the
    # marginal adapters compose over, so no consumer reaches for private
    # attributes chosen by string:
    #   initialize_moments()          -> (m0, P0)
    #   predict_moments(m, P, t)      -> (m', P', aux)   # aux: smoother gain info
    #   correct_moments(m, P, y_t, t) -> (m', P', ll_t)  # masked-NaN exact
    def initialize_moments(self):
        """(m0, P0) of the initial Gaussian belief."""
        return self.initialize()[:2]

    def predict_moments(self, m, p, t):
        """One Gaussian transition of the belief moments."""
        return self._predict(m, p, t)

    def correct_moments(self, m, p, y_t, t):
        """One Gaussian measurement update; returns the step log-likelihood."""
        return self._correct(m, p, y_t, t)

    def predict_moments_cross(self, m, p, t, n_transitions: int):
        """``n_transitions`` composed transitions, additionally returning the
        cross-covariance ``Cov(x_t, x_{t+n})`` — the quantity every RTS-style
        backward gain is built from (``gain = cross @ P_pred^{-1}``). For the
        EKF the composed cross is ``P_t F_total'`` with the chained step
        Jacobians."""
        p_start = p
        f_total = jnp.eye(self._d_x)
        for _ in range(n_transitions):
            m, p, f_jac = self._predict(m, p, t)
            f_total = f_jac @ f_total
            t = t + 1.0
        return m, p, p_start @ f_total.T

    # -- filter ----------------------------------------------------------------
    def initialize(self) -> EKFState:
        m0, p0 = initial_gaussian_moments(
            self.model.hidden.initial_distribution(), self._d_x
        )
        return EKFState(m0, p0, jnp.asarray(0.0), jnp.asarray(0.0))

    def _correct(self, m_pred, p_pred, y_t, t):
        """Measurement update, iterated ``self.iterations`` times (IEKF).

        Each pass is one Gauss-Newton step on the negative log posterior,
        re-linearizing the observation mean at the current iterate (Bell &
        Cathey 1993): with ``iterations=1`` this is exactly the standard EKF
        update; as iterations grow the mean converges to the MAP of
        ``p(x | y)`` under the Gaussian prior ``N(m_pred, p_pred)``. The
        covariance uses the final linearization, but the likelihood increment
        always comes from the FIRST (prediction-point) pass: later iterates
        choose their linearization point using ``y_t`` itself, so evaluating
        the density there is no longer the one-step-ahead predictive quantity
        the rest of the family reports (it is biased upward — which matters
        when the likelihood feeds model comparison or PMMH).
        """
        m_i = m_pred
        ll_first = None
        for _ in range(self.iterations):
            h_jac = jax.jacfwd(lambda v: self._obs_mean(v, t))(m_i)
            r = self._obs_cov(m_i, t)
            # linearized predicted observation at the iterate:
            # h(m_i) + H_i (m_pred - m_i)
            y_hat = self._obs_mean(m_i, t) + h_jac @ (m_pred - m_i)
            # partial-NaN components are exactly marginalized (all-NaN skip is
            # the degenerate case: zero gain/innovation, ll_t == 0)
            k_gain, innov, ll_t, s_eff = masked_gaussian_update(
                y_t, y_hat, p_pred @ h_jac.T, h_jac @ p_pred @ h_jac.T + r
            )
            if ll_first is None:
                ll_first = ll_t
            m_i = m_pred + k_gain @ innov
        p_new = p_pred - k_gain @ s_eff @ k_gain.T
        return m_i, p_new, ll_first

    def _predict(self, m, p, t):
        """One linearized transition; returns the step Jacobian for smoothing."""
        f_jac = jax.jacfwd(lambda v: self._trans_mean(v, t))(m)
        q = self._trans_cov(m, t)
        m_new = self._trans_mean(m, t)
        p_new = f_jac @ p @ f_jac.T + q
        return m_new, p_new, f_jac

    def filter(self, y_t, state: EKFState, n_transitions: int = None) -> EKFState:
        """One predict+update move with all-NaN observation skip (same timing
        contract as ``KalmanFilter.filter``)."""
        y_t = jnp.atleast_1d(jnp.asarray(y_t, jnp.float32))
        if n_transitions is None:
            n_transitions = int(self.model.observe_every_step)

        m, p, t = state.mean, state.cov, state.time_index
        for _ in range(n_transitions):
            m, p, _ = self._predict(m, p, t)
            t = t + 1.0

        m_new, p_new, ll_t = self._correct(m, p, y_t, t)
        ll_new = state.log_likelihood + ll_t
        return EKFState(m_new, p_new, ll_new, t)

    def batch_filter(self, y) -> FilterResult:
        """Linearized Gaussian filtering over the whole sequence as one
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

    # -- smoothing --------------------------------------------------------------
    def smooth(self, y, initial_moments=None):
        """Extended RTS smoother: the backward pass reuses each step's
        composed transition Jacobian (re-linearization at the filtered means).
        Returns ``(means, covs)`` of shapes ``(T, d)`` and ``(T, d, d)``.

        ``initial_moments=(m0, P0)`` overrides the model prior — the hook the
        Gaussian-sum smoother uses to smooth each mixture component from its
        own split initialization.
        """
        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 1:
            y = y[:, None]
        oes = int(self.model.observe_every_step)

        def forward_move(m, p, t, y_t, n):
            f_total = jnp.eye(self._d_x)
            for _ in range(n):
                m, p, f_jac = self._predict(m, p, t)
                f_total = f_jac @ f_total
                t = t + 1.0
            m_pred, p_pred = m, p
            m_f, p_f, _ = self._correct(m, p, y_t, t)
            return (m_pred, p_pred, m_f, p_f, f_total), t

        m0, p0 = self.initialize_moments() if initial_moments is None else initial_moments
        rec0, t1 = forward_move(m0, p0, jnp.asarray(0.0), y[0], 1)

        def fwd(carry, y_t):
            m, p, t = carry
            rec, t_new = forward_move(m, p, t, y_t, oes)
            return (rec[2], rec[3], t_new), rec

        _, rec_rest = jax.lax.scan(fwd, (rec0[2], rec0[3], t1), y[1:])
        m_pred, p_pred, m_f, p_f, f_steps = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), rec0, rec_rest
        )

        def backward(carry, inp):
            ms_next, ps_next = carry
            m_f_t, p_f_t, m_pred_next, p_pred_next, f_next = inp
            gain = jnp.linalg.solve(p_pred_next, f_next @ p_f_t).T
            ms = m_f_t + gain @ (ms_next - m_pred_next)
            ps = p_f_t + gain @ (ps_next - p_pred_next) @ gain.T
            return (ms, ps), (ms, ps)

        if y.shape[0] == 1:
            return m_f, p_f
        _, (ms_rest, ps_rest) = jax.lax.scan(
            backward,
            (m_f[-1], p_f[-1]),
            (m_f[:-1], p_f[:-1], m_pred[1:], p_pred[1:], f_steps[1:]),
            reverse=True,
        )
        means = jnp.concatenate([ms_rest, m_f[-1][None]], axis=0)
        covs = jnp.concatenate([ps_rest, p_f[-1][None]], axis=0)
        return means, covs
