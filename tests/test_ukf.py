"""Unscented Kalman filter tests: exact agreement with KalmanFilter on linear
models (the UT is exact through affine maps), nonlinear tracking vs the EKF
and a big particle filter, NaN skip, unscented RTS smoothing, and
differentiability."""

import math

import jax
import jax.numpy as jnp
import numpy as np

import pyfilter_tpu as pf
from pyfilter_tpu import timeseries as ts, distributions as dist
from pyfilter_tpu.filters.particle import proposals
from pyfilter_tpu.timeseries import models


def linear_ssm(beta=0.7):
    return ts.LinearStateSpaceModel(models.AR(0.2, beta, 0.4), (1.0, 0.25))


def sine_ssm(dt=0.05):
    f = lambda x, gamma, sigma: (jnp.sin(x.value - gamma), sigma)
    sine = ts.AffineEulerMaruyama(
        f, (0.0, 1.0), dist.Normal(0.0, math.sqrt(dt)),
        lambda g, s: dist.Normal(0.0, 1.0), dt=dt,
    )
    return ts.LinearStateSpaceModel(sine, (1.0, 0.1))


def test_ukf_equals_kalman_on_linear_model():
    """The unscented transform is exact through affine maps: on a linear model
    the UKF must reproduce the exact Kalman filter and RTS smoother."""
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(0), 40).get_paths()
    exact = pf.KalmanFilter(ssm).batch_filter(y)
    ukf = pf.UnscentedKalmanFilter(ssm).batch_filter(y)
    np.testing.assert_allclose(
        float(ukf.log_likelihood), float(exact.log_likelihood), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ukf.filter_means), np.asarray(exact.filter_means), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ukf.filter_variances), np.asarray(exact.filter_variances),
        rtol=1e-3, atol=1e-5,
    )
    um, uc = pf.UnscentedKalmanFilter(ssm).smooth(y)
    km, kc = pf.KalmanFilter(ssm).smooth(y)
    np.testing.assert_allclose(np.asarray(um), np.asarray(km), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(uc), np.asarray(kc), rtol=1e-3, atol=1e-5)


def test_ukf_tracks_nonlinear_sine_diffusion():
    ssm = sine_ssm()
    x, y = ssm.sample_states(jax.random.PRNGKey(1), 200).get_paths()
    x = np.asarray(x)

    ukf_res = pf.UnscentedKalmanFilter(ssm).batch_filter(y)
    ukf_rmse = float(np.sqrt(np.mean((np.asarray(ukf_res.filter_means)[:, 0] - x) ** 2)))

    filt = pf.APF(ssm, 1000, proposal=proposals.LinearGaussianObservations())
    pf_res = filt.batch_filter(jax.random.PRNGKey(2), y)
    pf_rmse = float(np.sqrt(np.mean((np.asarray(pf_res.filter_means) - x) ** 2)))

    assert np.isfinite(float(ukf_res.log_likelihood))
    assert ukf_rmse < 1.2 * pf_rmse + 1e-3, (ukf_rmse, pf_rmse)

    sm, _ = pf.UnscentedKalmanFilter(ssm).smooth(y)
    sm_rmse = float(np.sqrt(np.mean((np.asarray(sm)[:, 0] - x) ** 2)))
    assert sm_rmse <= ukf_rmse + 1e-4, (sm_rmse, ukf_rmse)


def test_ukf_nan_skip():
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(3), 30).get_paths()
    y = np.asarray(y).copy()
    y[10:14] = np.nan
    res = pf.UnscentedKalmanFilter(ssm).batch_filter(jnp.asarray(y))
    exact = pf.KalmanFilter(ssm).batch_filter(jnp.asarray(y))
    np.testing.assert_allclose(
        float(res.log_likelihood), float(exact.log_likelihood), rtol=1e-4
    )
    assert np.asarray(res.step_log_likelihoods)[10:14].sum() == 0.0


def test_ukf_is_differentiable():
    ssm = linear_ssm(0.7)
    _, y = ssm.sample_states(jax.random.PRNGKey(4), 40).get_paths()

    def ll(beta):
        return pf.UnscentedKalmanFilter(linear_ssm(beta)).batch_filter(y).log_likelihood

    g = float(jax.grad(ll)(jnp.asarray(0.5)))
    eps = 1e-3
    fd = (float(ll(jnp.asarray(0.5 + eps))) - float(ll(jnp.asarray(0.5 - eps)))) / (2 * eps)
    assert np.isfinite(g)
    np.testing.assert_allclose(g, fd, rtol=5e-3, atol=1e-2)


def test_ckf_equals_kalman_on_linear_model():
    """The spherical-radial cubature rule is exact through affine maps: on a
    linear model the CKF must reproduce the exact Kalman filter + smoother."""
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(11), 40).get_paths()
    exact = pf.KalmanFilter(ssm).batch_filter(y)
    ckf = pf.CubatureKalmanFilter(ssm).batch_filter(y)
    np.testing.assert_allclose(
        float(ckf.log_likelihood), float(exact.log_likelihood), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ckf.filter_means), np.asarray(exact.filter_means), rtol=1e-4, atol=1e-4
    )
    cm, cc = pf.CubatureKalmanFilter(ssm).smooth(y)
    km, kc = pf.KalmanFilter(ssm).smooth(y)
    np.testing.assert_allclose(np.asarray(cm), np.asarray(km), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cc), np.asarray(kc), rtol=1e-3, atol=1e-5)


def test_ckf_center_point_carries_no_weight():
    """alpha=1, beta=0, kappa=0 => lambda=0: zero mean AND covariance weight on
    the center sigma point — the propagated moments are exactly the 2d-point
    cubature rule's."""
    ckf = pf.CubatureKalmanFilter(linear_ssm())
    assert float(ckf._wm[0]) == 0.0 and float(ckf._wc[0]) == 0.0
    np.testing.assert_allclose(np.asarray(ckf._wm[1:]), 0.5, rtol=1e-6)


def test_ckf_tracks_nonlinear_sine_diffusion():
    ssm = sine_ssm()
    x, y = ssm.sample_states(jax.random.PRNGKey(12), 200).get_paths()
    x = np.asarray(x)
    ckf_res = pf.CubatureKalmanFilter(ssm).batch_filter(y)
    ukf_res = pf.UnscentedKalmanFilter(ssm).batch_filter(y)
    ckf_rmse = float(np.sqrt(np.mean((np.asarray(ckf_res.filter_means)[:, 0] - x) ** 2)))
    ukf_rmse = float(np.sqrt(np.mean((np.asarray(ukf_res.filter_means)[:, 0] - x) ** 2)))
    assert np.isfinite(float(ckf_res.log_likelihood))
    # both are 2nd-order-accurate sigma-point rules; they should track alike
    assert ckf_rmse < 1.2 * ukf_rmse + 1e-3, (ckf_rmse, ukf_rmse)
