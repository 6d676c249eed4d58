"""Partial-NaN observation handling across the Gaussian filter family:
missing components must be EXACTLY marginalized (the algebraic oracle is a
filter built with the reduced observation operator), and the log-likelihood
must count only the observed components."""

import jax
import jax.numpy as jnp
import numpy as np

import pyfilter_tpu as pf
from pyfilter_tpu import parallel, timeseries as ts
from pyfilter_tpu.timeseries import models


def _full_ssm():
    """LocalLinearTrend with BOTH components observed (d_y = 2)."""
    llt = models.LocalLinearTrend(0.05, 0.02)
    a = jnp.eye(2)
    return ts.LinearStateSpaceModel(llt, (a, 0.15 * jnp.ones(2)), event_shape=(2,))


def _level_ssm():
    """Same model observing ONLY the level (d_y = 1) — the exact oracle for
    a second component that is always missing."""
    llt = models.LocalLinearTrend(0.05, 0.02)
    a = jnp.asarray([[1.0, 0.0]])
    return ts.LinearStateSpaceModel(llt, (a, jnp.asarray([0.15])), event_shape=(1,))


def _data(n=60):
    path = _full_ssm().sample_states(jax.random.PRNGKey(0), n)
    y = np.asarray(path.y).copy()
    return y


def test_kalman_marginalizes_missing_component_exactly():
    y = _data()
    y_masked = y.copy()
    y_masked[:, 1] = np.nan  # slope observation always missing

    masked = pf.KalmanFilter(_full_ssm()).batch_filter(jnp.asarray(y_masked))
    oracle = pf.KalmanFilter(_level_ssm()).batch_filter(jnp.asarray(y[:, :1]))

    np.testing.assert_allclose(
        float(masked.log_likelihood), float(oracle.log_likelihood), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(masked.filter_means), np.asarray(oracle.filter_means),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(masked.filter_variances), np.asarray(oracle.filter_variances),
        rtol=1e-4, atol=1e-6,
    )


def test_kalman_intermittent_partial_nan():
    """Intermittently missing single components: finite loglik, posterior
    variance of the unobserved component grows vs the fully observed run."""
    y = _data()
    y_masked = y.copy()
    y_masked[10:40, 1] = np.nan

    full = pf.KalmanFilter(_full_ssm()).batch_filter(jnp.asarray(y))
    masked = pf.KalmanFilter(_full_ssm()).batch_filter(jnp.asarray(y_masked))
    assert np.isfinite(float(masked.log_likelihood))
    assert float(masked.log_likelihood) < float(full.log_likelihood) + 1e-3
    v_full = np.asarray(full.filter_variances)
    v_masked = np.asarray(masked.filter_variances)
    assert v_masked[39, 1] > v_full[39, 1]  # slope info was withheld
    np.testing.assert_allclose(v_masked[:10], v_full[:10], rtol=1e-5)


def test_ekf_ukf_match_kalman_under_partial_nan():
    """On a linear model the EKF and UKF masked updates must reproduce the
    exact masked Kalman filter."""
    y = _data()
    y_masked = y.copy()
    y_masked[15:45, 1] = np.nan
    y_j = jnp.asarray(y_masked)

    exact = pf.KalmanFilter(_full_ssm()).batch_filter(y_j)
    ekf = pf.ExtendedKalmanFilter(_full_ssm()).batch_filter(y_j)
    ukf = pf.UnscentedKalmanFilter(_full_ssm()).batch_filter(y_j)
    for res in (ekf, ukf):
        np.testing.assert_allclose(
            float(res.log_likelihood), float(exact.log_likelihood), rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(res.filter_means), np.asarray(exact.filter_means),
            rtol=1e-3, atol=1e-4,
        )


def test_enkf_partial_nan_single_and_spmd():
    """The EnKF's masked gain must ignore missing components (no phantom y=0
    update): with the slope always missing it converges to the level-only
    exact filter; the distributed tier agrees."""
    y = _data()
    y_masked = y.copy()
    y_masked[:, 1] = np.nan
    y_j = jnp.asarray(y_masked)

    oracle = pf.KalmanFilter(_level_ssm()).batch_filter(jnp.asarray(y[:, :1]))
    enkf = pf.EnsembleKalmanFilter(_full_ssm(), ensemble_size=4000).batch_filter(
        jax.random.PRNGKey(1), y_j
    )
    assert abs(float(enkf.log_likelihood) - float(oracle.log_likelihood)) < 2.0
    np.testing.assert_allclose(
        np.asarray(enkf.filter_means), np.asarray(oracle.filter_means), atol=0.08
    )

    mesh = parallel.make_mesh()
    dist = parallel.spmd_enkf(_full_ssm(), 4000, jax.random.PRNGKey(2), y_j, mesh)
    assert abs(float(dist.log_likelihood) - float(oracle.log_likelihood)) < 2.0
    np.testing.assert_allclose(
        np.asarray(dist.filter_means), np.asarray(oracle.filter_means), atol=0.08
    )


def test_smoothers_accept_partial_nan():
    """The RTS-family smoothers ride the same masked update: finite outputs
    and exact agreement between Kalman and EKF on the linear model."""
    y = _data()
    y_masked = y.copy()
    y_masked[20:30, 0] = np.nan
    y_j = jnp.asarray(y_masked)

    km, kc = pf.KalmanFilter(_full_ssm()).smooth(y_j)
    em, ec = pf.ExtendedKalmanFilter(_full_ssm()).smooth(y_j)
    assert np.isfinite(np.asarray(km)).all() and np.isfinite(np.asarray(kc)).all()
    np.testing.assert_allclose(np.asarray(em), np.asarray(km), rtol=1e-3, atol=1e-4)
