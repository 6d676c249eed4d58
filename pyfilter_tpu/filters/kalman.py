"""Exact Kalman filter for linear-Gaussian state-space models.

New capability beyond the reference (which is particle-only): when the model
is a ``LinearStateSpaceModel`` over a linear-affine hidden process, the
filtering distribution is available in closed form. The API mirrors
:class:`~pyfilter_tpu.filters.particle.ParticleFilter` — ``batch_filter`` is
one ``lax.scan`` and returns a :class:`~pyfilter_tpu.filters.result.FilterResult`
— so users can swap the exact filter in wherever a particle filter runs.

The transition ``(F, b, Q)`` is extracted NUMERICALLY from the process's
``mean_scale`` by probing basis states (with a linearity/homoscedasticity
check), so any affine parameterization works — ``LinearModel``'s ``(a, b, s)``
as well as e.g. ``models.AR``'s ``(alpha, beta, sigma)`` ordering.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..timeseries import TimeseriesState
from ._masked import initial_gaussian_moments, masked_gaussian_update
from .result import FilterResult


class KalmanState(NamedTuple):
    mean: jax.Array       # (d,)
    cov: jax.Array        # (d, d)
    log_likelihood: jax.Array
    time_index: jax.Array

    # protocol compatibility with ParticleFilterCorrection where meaningful
    @property
    def x(self) -> TimeseriesState:
        return TimeseriesState(self.time_index, self.mean, 1)

    def get_mean(self):
        return self.mean

    def get_variance(self):
        return jnp.diagonal(self.cov, axis1=-2, axis2=-1)


def _extract_affine(hidden):
    """Probe ``mean_scale`` at basis states to recover ``(F, b, Q)``.

    Raises if the drift is not affine or the diffusion depends on the state
    (heteroscedastic models have no exact Kalman recursion).
    """
    ev = hidden.event_ndim
    init = hidden.initial_distribution()
    d = int(init.event_shape[0]) if ev == 1 else 1

    def loc_scale(vec):
        value = vec if ev == 1 else vec[0]
        state = TimeseriesState(jnp.asarray(0.0), jnp.asarray(value, jnp.float32), ev)
        loc, scale = hidden.mean_scale(state)
        return (
            np.atleast_1d(np.asarray(loc, np.float64)),
            np.atleast_1d(np.asarray(scale, np.float64)),
        )

    b, scale0 = loc_scale(np.zeros(d))
    cols = []
    for j in range(d):
        e = np.zeros(d)
        e[j] = 1.0
        loc_j, scale_j = loc_scale(e)
        cols.append(loc_j - b)
        if not np.allclose(scale_j, scale0, rtol=1e-5, atol=1e-7):
            raise ValueError(
                "KalmanFilter requires a state-independent diffusion scale"
            )
    f_mat = np.stack(cols, axis=-1)

    # linearity check at a non-basis point
    probe = np.full(d, 2.0)
    loc_p, _ = loc_scale(probe)
    if not np.allclose(loc_p, b + f_mat @ probe, rtol=1e-4, atol=1e-5):
        raise ValueError("KalmanFilter requires an affine (linear) hidden drift")

    inc = hidden.increment_distribution
    inc_cov = getattr(inc, "covariance_matrix", None)
    if inc_cov is not None:
        # full MVN increment covariance, elementwise-scaled: Q = S C S
        s = np.broadcast_to(np.asarray(scale0, np.float64), (d,))
        c = np.asarray(inc_cov, np.float64).reshape(-1, d, d)[0]
        q_mat = s[:, None] * c * s[None, :]
    else:
        inc_std = np.atleast_1d(np.asarray(inc.stddev, np.float64))
        q_mat = np.diag(np.square(scale0 * inc_std) * np.ones(d))
    return (
        jnp.asarray(f_mat, jnp.float32),
        jnp.asarray(b, jnp.float32),
        jnp.asarray(q_mat, jnp.float32),
        d,
    )


class KalmanFilter:
    """Exact filter for affine-Gaussian models built from
    :class:`LinearStateSpaceModel` over any linear-affine hidden process."""

    def __init__(self, model):
        if len(model.parameters) != 3:
            raise ValueError("KalmanFilter requires LinearModel + LinearStateSpaceModel")
        hidden = model.hidden
        if not hasattr(hidden, "mean_scale") or not hasattr(hidden, "increment_distribution"):
            raise ValueError("KalmanFilter requires LinearModel + LinearStateSpaceModel")
        self.model = model

        self.F, self.b, self.Q, self._d_x = _extract_affine(hidden)
        self._d_y = int(model.event_shape[0]) if model.event_shape else 1

        h, d_off, r = model.parameters
        h = np.asarray(h, np.float64)
        if h.ndim == 2:
            h_mat = h
        elif h.ndim == 0:
            h_mat = (h * np.eye(self._d_x))[: self._d_y]
        elif h.shape[0] == self._d_x and self._d_y == self._d_x:
            # LinearStateSpaceModel's vector coefficients act elementwise
            h_mat = np.diag(h)
        else:
            raise ValueError("observation coefficient must be scalar, matrix, or elementwise")
        self.H = jnp.asarray(h_mat, jnp.float32)
        self.d = jnp.broadcast_to(jnp.asarray(d_off, jnp.float32), (self._d_y,))
        r = np.atleast_1d(np.asarray(r, np.float64))
        self.R = jnp.asarray(np.eye(self._d_y) * np.square(r), jnp.float32)

        self.m0, self.P0 = initial_gaussian_moments(
            hidden.initial_distribution(), self._d_x
        )

    def initialize(self) -> KalmanState:
        return KalmanState(self.m0, self.P0, jnp.asarray(0.0), jnp.asarray(0.0))

    def filter(self, y_t, state: KalmanState, n_transitions: int = None) -> KalmanState:
        """One predict+update move with all-NaN observation skip.

        ``n_transitions`` hidden steps are applied before the update (defaults
        to ``observe_every_step``; the first observation after t=0 uses one —
        the same timing as the particle filters, filters/base.py)."""
        y_t = jnp.atleast_1d(jnp.asarray(y_t, jnp.float32))
        if n_transitions is None:
            n_transitions = int(self.model.observe_every_step)

        m, p = state.mean, state.cov
        for _ in range(n_transitions):
            m = self.F @ m + self.b
            p = self.F @ p @ self.F.T + self.Q

        # partial-NaN components are exactly marginalized (all-NaN skip is the
        # degenerate case: zero gain/innovation, ll_t == 0)
        k_gain, innov, ll_t, s_eff = masked_gaussian_update(
            y_t, self.H @ m + self.d, p @ self.H.T, self.H @ p @ self.H.T + self.R
        )
        m_new = m + k_gain @ innov
        p_new = p - k_gain @ s_eff @ k_gain.T
        ll_new = state.log_likelihood + ll_t

        return KalmanState(m_new, p_new, ll_new, state.time_index + n_transitions)

    def batch_filter(self, y) -> FilterResult:
        """Exact filtering over the whole sequence (time axis leading)."""
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

    # -- smoothing ------------------------------------------------------------
    def _effective_transition(self, n: int):
        """Compose ``n`` hidden transitions into one affine-Gaussian step:
        ``F_eff = F^n``, ``b_eff = Σ F^i b``, ``Q_eff = Σ F^i Q F^i'``."""
        f_eff = jnp.eye(self._d_x, dtype=self.F.dtype)
        b_eff = jnp.zeros(self._d_x, dtype=self.F.dtype)
        q_eff = jnp.zeros((self._d_x, self._d_x), dtype=self.F.dtype)
        for _ in range(int(n)):
            b_eff = self.F @ b_eff + self.b
            q_eff = self.F @ q_eff @ self.F.T + self.Q
            f_eff = self.F @ f_eff
        return f_eff, b_eff, q_eff

    def smooth(self, y):
        """Exact Rauch–Tung–Striebel smoother: posterior marginals
        ``p(x_t | y_{1:T})`` at the observation times.

        Exact counterpart of the particle smoothers (`ParticleFilter.smooth`;
        reference particle/base.py:105-157 — the reference has no exact
        smoother). Returns ``(means, covs)`` of shapes ``(T, d)`` and
        ``(T, d, d)``. All-NaN observations are skipped exactly as in
        :meth:`filter`.
        """
        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 1:
            y = y[:, None]
        oes = int(self.model.observe_every_step)
        f1, b1, q1 = self._effective_transition(1)
        fo, bo, qo = self._effective_transition(oes)

        def forward_step(m, p, y_t, f_mat, b_vec, q_mat):
            m_pred = f_mat @ m + b_vec
            p_pred = f_mat @ p @ f_mat.T + q_mat
            k_gain, innov, _, s_eff = masked_gaussian_update(
                y_t,
                self.H @ m_pred + self.d,
                p_pred @ self.H.T,
                self.H @ p_pred @ self.H.T + self.R,
            )
            m_f = m_pred + k_gain @ innov
            p_f = p_pred - k_gain @ s_eff @ k_gain.T
            return m_pred, p_pred, m_f, p_f

        # first observation: one transition from the initial state (matching
        # batch_filter / the particle filters' timing)
        rec0 = forward_step(self.m0, self.P0, y[0], f1, b1, q1)

        def fwd(carry, y_t):
            m, p = carry
            m_pred, p_pred, m_f, p_f = forward_step(m, p, y_t, fo, bo, qo)
            return (m_f, p_f), (m_pred, p_pred, m_f, p_f)

        _, rec_rest = jax.lax.scan(fwd, (rec0[2], rec0[3]), y[1:])
        m_pred, p_pred, m_f, p_f = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), rec0, rec_rest
        )

        def backward(carry, inp):
            ms_next, ps_next = carry
            m_f_t, p_f_t, m_pred_next, p_pred_next = inp
            # G = P_f F' P_pred^{-1}  (all covariances symmetric)
            gain = jnp.linalg.solve(p_pred_next, fo @ p_f_t).T
            ms = m_f_t + gain @ (ms_next - m_pred_next)
            ps = p_f_t + gain @ (ps_next - p_pred_next) @ gain.T
            return (ms, ps), (ms, ps)

        last = (m_f[-1], p_f[-1])
        if y.shape[0] == 1:
            return m_f, p_f
        _, (ms_rest, ps_rest) = jax.lax.scan(
            backward,
            last,
            (m_f[:-1], p_f[:-1], m_pred[1:], p_pred[1:]),
            reverse=True,
        )
        means = jnp.concatenate([ms_rest, m_f[-1][None]], axis=0)
        covs = jnp.concatenate([ps_rest, p_f[-1][None]], axis=0)
        return means, covs
