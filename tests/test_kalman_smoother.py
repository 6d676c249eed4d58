"""RTS smoother tests: exact marginals vs a brute-force joint-Gaussian oracle
(numpy conditioning on the full (x, y) covariance), plus FFBS consistency and
NaN-gap handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
from pyfilter_tpu import timeseries as ts
from pyfilter_tpu.timeseries import models

ALPHA, BETA, SIGMA = 0.2, 0.7, 0.4
OBS_COEF, OBS_STD = 1.0, 0.25
T = 30


def build_ssm():
    return ts.LinearStateSpaceModel(models.AR(ALPHA, BETA, SIGMA), (OBS_COEF, OBS_STD))


def joint_gaussian_oracle(y):
    """Posterior p(x_{1:T} | y_obs) by conditioning the full joint Gaussian —
    an implementation-independent oracle. NaN entries of y are unobserved."""
    y = np.asarray(y, np.float64)
    # prior over (x_0 .. x_T): AR(1) recursion moments
    m = np.empty(T + 1)
    p = np.empty(T + 1)
    m[0], p[0] = ALPHA, SIGMA**2
    for t in range(1, T + 1):
        m[t] = ALPHA + BETA * m[t - 1]
        p[t] = BETA**2 * p[t - 1] + SIGMA**2
    cov = np.empty((T + 1, T + 1))
    for s in range(T + 1):
        for t in range(s, T + 1):
            cov[s, t] = cov[t, s] = BETA ** (t - s) * p[s]

    obs = ~np.isnan(y)
    idx = np.flatnonzero(obs) + 1  # y_t observes x_t (x index offset 1)
    c_xy = cov[:, idx] * OBS_COEF
    c_yy = OBS_COEF**2 * cov[np.ix_(idx, idx)] + OBS_STD**2 * np.eye(len(idx))
    gain = np.linalg.solve(c_yy, c_xy.T).T
    mean_post = m + gain @ (y[obs] - OBS_COEF * m[idx])
    cov_post = cov - gain @ c_xy.T
    return mean_post[1:], np.diagonal(cov_post)[1:]  # marginals at obs times


@pytest.fixture(scope="module")
def y_data():
    _, y = build_ssm().sample_states(jax.random.PRNGKey(0), T).get_paths()
    return y


def test_rts_matches_joint_gaussian(y_data):
    means, covs = pf.KalmanFilter(build_ssm()).smooth(y_data)
    om, ov = joint_gaussian_oracle(y_data)
    np.testing.assert_allclose(np.asarray(means)[:, 0], om, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(covs)[:, 0, 0], ov, rtol=1e-4, atol=1e-6)


def test_rts_with_nan_gap(y_data):
    y = np.asarray(y_data).copy()
    y[10:14] = np.nan
    means, covs = pf.KalmanFilter(build_ssm()).smooth(jnp.asarray(y))
    om, ov = joint_gaussian_oracle(y)
    np.testing.assert_allclose(np.asarray(means)[:, 0], om, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(covs)[:, 0, 0], ov, rtol=1e-4, atol=1e-6)
    # uncertainty grows inside the gap
    v = np.asarray(covs)[:, 0, 0]
    assert v[11] > v[9] and v[12] > v[14]


def test_ffbs_agrees_with_rts(y_data):
    """Particle FFBS trajectory mean must track the exact RTS mean."""
    means, _ = pf.KalmanFilter(build_ssm()).smooth(y_data)
    filt = pf.SISR(build_ssm(), 2000, record_states=True)
    res = filt.batch_filter(jax.random.PRNGKey(3), y_data)
    sm = filt.smooth(jax.random.PRNGKey(4), res, method="ffbs")
    ffbs_mean = np.asarray(sm.mean(axis=1))[1:]  # drop the t=0 state
    rmse = np.sqrt(np.mean((ffbs_mean - np.asarray(means)[:, 0]) ** 2))
    assert rmse < 0.05, rmse


def test_rts_final_marginal_equals_filter(y_data):
    """At t=T the smoothed marginal IS the filtered marginal."""
    kf = pf.KalmanFilter(build_ssm())
    res = kf.batch_filter(y_data)
    means, covs = kf.smooth(y_data)
    np.testing.assert_allclose(
        np.asarray(means)[-1], np.asarray(res.filter_means)[-1], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(covs)[-1, 0, 0], np.asarray(res.filter_variances)[-1, 0], rtol=1e-5
    )
