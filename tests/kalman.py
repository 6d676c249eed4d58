"""Exact Kalman filter/smoother oracle for linear-Gaussian SSM tests.

Plays the role pykalman plays in the reference's test-suite
(tests/filters/models.py:10-62): particle-filter output must agree with the
exact filter. Pure numpy, float64, supports NaN-masked (missing) observations.
"""

from __future__ import annotations

import numpy as np


class KalmanFilter:
    """x' = F x + b + w,  w ~ N(0, Q);   y = H x + d + v,  v ~ N(0, R)."""

    def __init__(
        self,
        transition_matrices,
        observation_matrices,
        transition_covariance,
        observation_covariance,
        transition_offsets=None,
        observation_offsets=None,
        initial_state_mean=None,
        initial_state_covariance=None,
    ):
        F = np.atleast_2d(np.asarray(transition_matrices, dtype=np.float64))
        H = np.atleast_2d(np.asarray(observation_matrices, dtype=np.float64))
        self.F = F
        self.H = H
        self.Q = np.atleast_2d(np.asarray(transition_covariance, dtype=np.float64))
        self.R = np.atleast_2d(np.asarray(observation_covariance, dtype=np.float64))
        d_x = F.shape[0]
        d_y = H.shape[0]
        self.b = np.zeros(d_x) if transition_offsets is None else np.atleast_1d(np.asarray(transition_offsets, np.float64))
        self.d = np.zeros(d_y) if observation_offsets is None else np.atleast_1d(np.asarray(observation_offsets, np.float64))
        self.m0 = np.zeros(d_x) if initial_state_mean is None else np.atleast_1d(np.asarray(initial_state_mean, np.float64))
        self.P0 = np.eye(d_x) if initial_state_covariance is None else np.atleast_2d(np.asarray(initial_state_covariance, np.float64))

    def filter(self, y):
        """Returns (filtered_means, filtered_covs, loglikelihood).

        ``y``: (T, d_y) or (T,); rows that are entirely NaN are treated as
        missing (prediction only, no update) — matching the reference filter's
        all-NaN skip (filters/base.py:212-216).
        """
        y = np.asarray(y, dtype=np.float64)
        if y.ndim == 1:
            y = y[:, None]
        T = y.shape[0]
        d_x = self.F.shape[0]
        means = np.zeros((T, d_x))
        covs = np.zeros((T, d_x, d_x))
        ll = 0.0
        m, P = self.m0, self.P0
        for t in range(T):
            # predict
            m = self.F @ m + self.b
            P = self.F @ P @ self.F.T + self.Q
            yt = y[t]
            if not np.isnan(yt).all():
                S = self.H @ P @ self.H.T + self.R
                innov = yt - (self.H @ m + self.d)
                Sinv = np.linalg.inv(S)
                K = P @ self.H.T @ Sinv
                m = m + K @ innov
                P = P - K @ self.H @ P
                sign, logdet = np.linalg.slogdet(S)
                ll += -0.5 * (innov @ Sinv @ innov + logdet + len(yt) * np.log(2 * np.pi))
            means[t] = m
            covs[t] = P
        return means, covs, ll

    def sample(self, n, rng=None):
        """Simulate ``(x, y)`` of length ``n`` from the model (plays the role of
        pykalman's ``sample`` in the reference tests, tests/filters/models.py)."""
        rng = np.random.default_rng(0) if rng is None else rng
        d_x, d_y = self.F.shape[0], self.H.shape[0]
        x = np.zeros((n, d_x))
        y = np.zeros((n, d_y))
        xc = rng.multivariate_normal(self.m0, self.P0)
        for t in range(n):
            xc = self.F @ xc + self.b + rng.multivariate_normal(np.zeros(d_x), self.Q)
            x[t] = xc
            y[t] = self.H @ xc + self.d + rng.multivariate_normal(np.zeros(d_y), self.R)
        return x, y

    def smooth(self, y):
        """RTS smoother. Returns (smoothed_means, smoothed_covs)."""
        y = np.asarray(y, dtype=np.float64)
        if y.ndim == 1:
            y = y[:, None]
        T = y.shape[0]
        d_x = self.F.shape[0]
        fm = np.zeros((T, d_x))
        fP = np.zeros((T, d_x, d_x))
        pm = np.zeros((T, d_x))
        pP = np.zeros((T, d_x, d_x))
        m, P = self.m0, self.P0
        for t in range(T):
            mp = self.F @ m + self.b
            Pp = self.F @ P @ self.F.T + self.Q
            pm[t], pP[t] = mp, Pp
            yt = y[t]
            if not np.isnan(yt).all():
                S = self.H @ Pp @ self.H.T + self.R
                K = Pp @ self.H.T @ np.linalg.inv(S)
                m = mp + K @ (yt - (self.H @ mp + self.d))
                P = Pp - K @ self.H @ Pp
            else:
                m, P = mp, Pp
            fm[t], fP[t] = m, P
        sm = np.zeros((T, d_x))
        sP = np.zeros((T, d_x, d_x))
        sm[-1], sP[-1] = fm[-1], fP[-1]
        for t in range(T - 2, -1, -1):
            G = fP[t] @ self.F.T @ np.linalg.inv(pP[t + 1])
            sm[t] = fm[t] + G @ (sm[t + 1] - pm[t + 1])
            sP[t] = fP[t] + G @ (sP[t + 1] - pP[t + 1]) @ G.T
        return sm, sP
