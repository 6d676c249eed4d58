"""Full-covariance noise in the Gaussian filter family.

Correlated MVN transition noise, observation noise, and initial covariance
must be used EXACTLY (round-3 verdict: ``jnp.diag(density.variance)`` silently
replaced a full MVN covariance by its marginals). Oracle: the float64 numpy
Kalman filter in tests/kalman.py, which plays the role pykalman plays in the
reference suite (reference tests/filters/models.py:10-62).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
from pyfilter_tpu import distributions as dist, timeseries as ts
from pyfilter_tpu.filters._masked import density_covariance

from kalman import KalmanFilter as NumpyKalman

A = np.array([[0.9, 0.2], [-0.1, 0.8]])
Q = np.array([[0.30, 0.18], [0.18, 0.25]])  # strongly correlated (rho ~ 0.66)
H = np.array([[1.0, 0.5], [0.0, 1.0]])
R = np.array([[0.20, -0.08], [-0.08, 0.10]])  # negatively correlated
P0 = np.array([[1.0, 0.4], [0.4, 1.0]])


def correlated_ssm():
    """2-D linear SSM with full-covariance MVN noise on every leg."""
    lq = jnp.asarray(np.linalg.cholesky(Q), jnp.float32)
    l0 = jnp.asarray(np.linalg.cholesky(P0), jnp.float32)
    lr = jnp.asarray(np.linalg.cholesky(R), jnp.float32)
    a = jnp.asarray(A, jnp.float32)
    h = jnp.asarray(H, jnp.float32)

    hidden = ts.AffineProcess(
        lambda x, a_mat: (jnp.einsum("ij,...j->...i", a_mat, x.value), 1.0),
        (a,),
        dist.MultivariateNormal(jnp.zeros(2), scale_tril=lq),
        lambda a_mat: dist.MultivariateNormal(jnp.zeros(2), scale_tril=l0),
    )
    return ts.StateSpaceModel(
        hidden,
        lambda x, h_mat, lr_mat: dist.MultivariateNormal(
            jnp.einsum("ij,...j->...i", h_mat, x.value), scale_tril=lr_mat
        ),
        (h, lr),
    )


@pytest.fixture(scope="module")
def oracle_and_data():
    oracle = NumpyKalman(
        A, H, Q, R, initial_state_mean=np.zeros(2), initial_state_covariance=P0
    )
    _, y = oracle.sample(60, rng=np.random.default_rng(7))
    means, covs, ll = oracle.filter(y)
    return oracle, y, means, covs, ll


def test_density_covariance_helper():
    mvn = dist.MultivariateNormal(jnp.zeros(2), covariance_matrix=jnp.asarray(Q, jnp.float32))
    np.testing.assert_allclose(np.asarray(density_covariance(mvn, 2)), Q, rtol=1e-5)
    n = dist.Normal(jnp.zeros(3), jnp.asarray([1.0, 2.0, 3.0])).to_event(1)
    np.testing.assert_allclose(
        np.asarray(density_covariance(n, 3)), np.diag([1.0, 4.0, 9.0]), rtol=1e-5
    )


def test_ekf_matches_oracle_with_correlated_noise(oracle_and_data):
    """Before round 4 this failed: off-diagonal Q/R/P0 entries were dropped."""
    _, y, means, covs, ll = oracle_and_data
    res = pf.ExtendedKalmanFilter(correlated_ssm()).batch_filter(jnp.asarray(y, jnp.float32))
    np.testing.assert_allclose(float(res.log_likelihood), ll, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res.filter_means), means, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res.filter_variances),
        np.diagonal(covs, axis1=-2, axis2=-1),
        rtol=1e-3,
        atol=1e-5,
    )


def test_ukf_matches_oracle_with_correlated_noise(oracle_and_data):
    _, y, means, covs, ll = oracle_and_data
    res = pf.UnscentedKalmanFilter(correlated_ssm()).batch_filter(jnp.asarray(y, jnp.float32))
    np.testing.assert_allclose(float(res.log_likelihood), ll, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res.filter_means), means, rtol=1e-3, atol=1e-4)


def test_kalman_filter_matches_oracle_with_correlated_q():
    """KalmanFilter's probed (F, b, Q) extraction preserves MVN increment
    correlations and the correlated initial covariance (obs leg stays the
    diagonal LinearStateSpaceModel convention)."""
    lq = jnp.asarray(np.linalg.cholesky(Q), jnp.float32)
    l0 = jnp.asarray(np.linalg.cholesky(P0), jnp.float32)
    hidden = ts.AffineProcess(
        lambda x, a_mat: (jnp.einsum("ij,...j->...i", a_mat, x.value), 1.0),
        (jnp.asarray(A, jnp.float32),),
        dist.MultivariateNormal(jnp.zeros(2), scale_tril=lq),
        lambda a_mat: dist.MultivariateNormal(jnp.zeros(2), scale_tril=l0),
    )
    ssm = ts.LinearStateSpaceModel(hidden, (1.0, 0.3), event_shape=(2,))
    filt = pf.KalmanFilter(ssm)
    np.testing.assert_allclose(np.asarray(filt.Q), Q, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(filt.P0), P0, rtol=1e-5, atol=1e-6)

    oracle = NumpyKalman(
        A,
        np.eye(2),
        Q,
        np.eye(2) * 0.09,
        initial_state_mean=np.zeros(2),
        initial_state_covariance=P0,
    )
    _, y = oracle.sample(50, rng=np.random.default_rng(3))
    means, _, ll = oracle.filter(y)
    res = filt.batch_filter(jnp.asarray(y, jnp.float32))
    np.testing.assert_allclose(float(res.log_likelihood), ll, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res.filter_means), means, rtol=1e-3, atol=1e-4)

    # EKF on the same model agrees (shared density_covariance path)
    res_ekf = pf.ExtendedKalmanFilter(ssm).batch_filter(jnp.asarray(y, jnp.float32))
    np.testing.assert_allclose(
        float(res_ekf.log_likelihood), float(res.log_likelihood), rtol=1e-5
    )


def test_enkf_tracks_oracle_with_correlated_noise(oracle_and_data):
    """Large-M stochastic EnKF converges on the exact correlated-noise filter;
    the perturbed observations must be drawn from the FULL R (Cholesky)."""
    _, y, means, covs, ll = oracle_and_data
    filt = pf.EnsembleKalmanFilter(correlated_ssm(), ensemble_size=4000)
    res = filt.batch_filter(jax.random.PRNGKey(0), jnp.asarray(y, jnp.float32))
    ll_est = float(res.log_likelihood)
    assert abs(ll_est - ll) / abs(ll) < 0.05, (ll_est, ll)
    rmse = np.sqrt(np.mean((np.asarray(res.filter_means) - means) ** 2))
    scale = np.sqrt(np.mean(np.diagonal(covs, axis1=-2, axis2=-1)))
    assert rmse < 0.35 * scale, (rmse, scale)
