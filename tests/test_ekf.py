"""Extended Kalman filter tests: exact agreement with KalmanFilter on linear
models, tracking quality on the nonlinear sine-diffusion flagship, NaN skip,
extended-RTS smoothing, and differentiability w.r.t. model parameters."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_ekf_equals_kalman_on_linear_model():
    """On an exactly linear model the re-linearized EKF IS the Kalman filter."""
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(0), 40).get_paths()
    exact = pf.KalmanFilter(ssm).batch_filter(y)
    ekf = pf.ExtendedKalmanFilter(ssm).batch_filter(y)
    np.testing.assert_allclose(
        float(ekf.log_likelihood), float(exact.log_likelihood), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ekf.filter_means), np.asarray(exact.filter_means), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ekf.filter_variances), np.asarray(exact.filter_variances),
        rtol=1e-4, atol=1e-6,
    )
    # and the extended RTS reduces to the exact RTS
    em, ec = pf.ExtendedKalmanFilter(ssm).smooth(y)
    km, kc = pf.KalmanFilter(ssm).smooth(y)
    np.testing.assert_allclose(np.asarray(em), np.asarray(km), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ec), np.asarray(kc), rtol=1e-4, atol=1e-6)


def test_ekf_tracks_nonlinear_sine_diffusion():
    """On the README flagship (nonlinear drift) the EKF must track the truth
    about as well as a big particle filter with the optimal proposal."""
    ssm = sine_ssm()
    key = jax.random.PRNGKey(1)
    x, y = ssm.sample_states(key, 200).get_paths()
    x = np.asarray(x)

    ekf_res = pf.ExtendedKalmanFilter(ssm).batch_filter(y)
    ekf_rmse = float(np.sqrt(np.mean((np.asarray(ekf_res.filter_means)[:, 0] - x) ** 2)))

    filt = pf.APF(ssm, 1000, proposal=proposals.LinearGaussianObservations())
    pf_res = filt.batch_filter(jax.random.PRNGKey(2), y)
    pf_rmse = float(np.sqrt(np.mean((np.asarray(pf_res.filter_means) - x) ** 2)))

    assert np.isfinite(float(ekf_res.log_likelihood))
    # mild nonlinearity: the EKF should be within 20% of the near-optimal PF
    assert ekf_rmse < 1.2 * pf_rmse + 1e-3, (ekf_rmse, pf_rmse)
    # and the smoother must improve on the filter
    sm, _ = pf.ExtendedKalmanFilter(ssm).smooth(y)
    sm_rmse = float(np.sqrt(np.mean((np.asarray(sm)[:, 0] - x) ** 2)))
    assert sm_rmse <= ekf_rmse + 1e-4, (sm_rmse, ekf_rmse)


def test_ekf_nan_skip():
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(3), 30).get_paths()
    y = np.asarray(y).copy()
    y[10:14] = np.nan
    res = pf.ExtendedKalmanFilter(ssm).batch_filter(jnp.asarray(y))
    exact = pf.KalmanFilter(ssm).batch_filter(jnp.asarray(y))
    np.testing.assert_allclose(
        float(res.log_likelihood), float(exact.log_likelihood), rtol=1e-5
    )
    assert np.asarray(res.step_log_likelihoods)[10:14].sum() == 0.0


def test_ekf_is_differentiable():
    """jax.grad flows through the whole EKF (everything is traced JAX) and
    matches the finite-difference slope of the loglik."""
    ssm = linear_ssm(0.7)
    _, y = ssm.sample_states(jax.random.PRNGKey(4), 40).get_paths()

    def ll(beta):
        return pf.ExtendedKalmanFilter(linear_ssm(beta)).batch_filter(y).log_likelihood

    g = float(jax.grad(ll)(jnp.asarray(0.5)))
    eps = 1e-3
    fd = (float(ll(jnp.asarray(0.5 + eps))) - float(ll(jnp.asarray(0.5 - eps)))) / (2 * eps)
    assert np.isfinite(g)
    np.testing.assert_allclose(g, fd, rtol=5e-3, atol=1e-3)


def arctan_ssm():
    """Strongly nonlinear observation map: y = 4*arctan(x) + small noise.

    The map saturates away from the origin, so the prior-mean linearization
    that the plain EKF uses is badly wrong whenever the predicted mean sits in
    the saturated region — the canonical IEKF showcase."""
    hidden = models.AR(0.0, 0.9, 1.0)

    def obs(x, scale):
        return dist.Normal(4.0 * jnp.arctan(x.value), scale)

    return ts.StateSpaceModel(hidden, obs, (0.3,))


def test_iekf_matches_kalman_on_linear_model():
    """Re-linearizing an already-linear model is a fixed point: any number of
    Gauss-Newton iterations must reproduce the exact Kalman filter."""
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(21), 40).get_paths()
    exact = pf.KalmanFilter(ssm).batch_filter(y)
    iekf = pf.ExtendedKalmanFilter(ssm, iterations=4).batch_filter(y)
    np.testing.assert_allclose(
        float(iekf.log_likelihood), float(exact.log_likelihood), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(iekf.filter_means), np.asarray(exact.filter_means), rtol=1e-4, atol=1e-5
    )


def test_iekf_update_converges_to_the_map():
    """The defining IEKF property (Bell & Cathey 1993): the Gauss-Newton
    iteration converges to the MAP of p(x | y) under the Gaussian predictive
    prior — checked against a dense numeric grid maximization. The plain EKF
    mean (one linearization at the prior mean) must be visibly off the MAP on
    the same update, so the iterations demonstrably buy accuracy."""
    ssm = arctan_ssm()
    m_pred = jnp.asarray([1.5])
    p_pred = jnp.asarray([[0.8]])
    y = jnp.asarray([4.0 * np.arctan(2.4) + 0.1])
    t = jnp.asarray(1.0)

    m_map, _, _ = pf.ExtendedKalmanFilter(ssm, iterations=40)._correct(
        m_pred, p_pred, y, t
    )
    m_ekf, _, _ = pf.ExtendedKalmanFilter(ssm)._correct(m_pred, p_pred, y, t)

    xs = np.linspace(-5.0, 5.0, 400001)
    log_post = (
        -0.5 * (xs - 1.5) ** 2 / 0.8
        - 0.5 * (float(y[0]) - 4.0 * np.arctan(xs)) ** 2 / 0.3**2
    )
    x_map = xs[np.argmax(log_post)]
    np.testing.assert_allclose(float(m_map[0]), x_map, atol=1e-4)
    assert abs(float(m_ekf[0]) - x_map) > 20 * abs(float(m_map[0]) - x_map)

    # the full filter stays finite under the iterated correction
    _, y_path = ssm.sample_states(jax.random.PRNGKey(22), 100).get_paths()
    res = pf.ExtendedKalmanFilter(ssm, iterations=8).batch_filter(y_path)
    assert np.isfinite(float(res.log_likelihood))
    sm, _ = pf.ExtendedKalmanFilter(ssm, iterations=8).smooth(y_path)
    assert np.all(np.isfinite(np.asarray(sm)))


def test_iekf_rejects_bad_iterations():
    with pytest.raises(ValueError):
        pf.ExtendedKalmanFilter(linear_ssm(), iterations=0)


def test_iekf_loglikelihood_is_the_predictive_one():
    """The IEKF's reported step likelihood must be the one-step-ahead
    PREDICTIVE quantity — i.e. exactly what the plain EKF reports (the first
    pass linearizes at the prediction point) — NOT the density under the
    final Gauss-Newton linearization, whose linearization point was chosen
    using y_t itself and is systematically biased upward (matters when the
    likelihood feeds model comparison or PMMH)."""
    ssm = arctan_ssm()
    # on one isolated update the increment is computed from the same
    # prediction-point linearization as the plain EKF's, so it is exact
    # (the totals over a whole pass legitimately differ — the iterated mean
    # improves every later prediction point):
    m_pred, p_pred = jnp.asarray([1.2]), jnp.asarray([[0.6]])
    y1, t = jnp.asarray([2.0]), jnp.asarray(1.0)
    m1, _, ll1 = pf.ExtendedKalmanFilter(ssm)._correct(m_pred, p_pred, y1, t)
    m6, _, ll6 = pf.ExtendedKalmanFilter(ssm, iterations=6)._correct(m_pred, p_pred, y1, t)
    np.testing.assert_allclose(float(ll6), float(ll1), rtol=1e-6)
    # while the ITERATED mean genuinely moved (the fix changed only the ll)
    assert abs(float(m6[0]) - float(m1[0])) > 1e-4
