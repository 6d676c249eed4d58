"""Ensemble Kalman filter tests: Monte-Carlo convergence to the exact Kalman
filter on linear models, nonlinear tracking on the sine diffusion, 2-D
structural model, NaN skip, inflation, and jit/grad compatibility."""

import math

import jax
import jax.numpy as jnp
import numpy as np

import pyfilter_tpu as pf
from pyfilter_tpu import timeseries as ts, distributions as dist
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


def test_enkf_converges_to_kalman_on_linear_model():
    """With a large ensemble the stochastic EnKF's moments and likelihood
    approach the exact Kalman filter on a linear-Gaussian model."""
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(0), 60).get_paths()
    exact = pf.KalmanFilter(ssm).batch_filter(y)
    enkf = pf.EnsembleKalmanFilter(ssm, ensemble_size=4000).batch_filter(
        jax.random.PRNGKey(1), y
    )
    assert abs(float(enkf.log_likelihood) - float(exact.log_likelihood)) < 1.0
    np.testing.assert_allclose(
        np.asarray(enkf.filter_means), np.asarray(exact.filter_means), atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(enkf.filter_variances),
        np.asarray(exact.filter_variances),
        rtol=0.15,
    )


def test_enkf_2d_local_linear_trend():
    """2-D structural model, partially observed: the state matmul path."""
    llt = models.LocalLinearTrend(0.05, 0.02)
    a = jnp.asarray([[1.0, 0.0]])
    ssm = ts.LinearStateSpaceModel(llt, (a, jnp.asarray([0.1])), event_shape=(1,))
    path = ssm.sample_states(jax.random.PRNGKey(2), 80)
    exact = pf.KalmanFilter(ssm).batch_filter(path.y)
    enkf = pf.EnsembleKalmanFilter(ssm, ensemble_size=3000).batch_filter(
        jax.random.PRNGKey(3), path.y
    )
    assert abs(float(enkf.log_likelihood) - float(exact.log_likelihood)) < 2.0
    np.testing.assert_allclose(
        np.asarray(enkf.filter_means), np.asarray(exact.filter_means), atol=0.08
    )


def test_enkf_tracks_nonlinear_sine_diffusion():
    """Nonlinear transition: the forecast ensemble carries the exact law; the
    filter must track the state at the observation-noise scale."""
    ssm = sine_ssm()
    x, y = ssm.sample_states(jax.random.PRNGKey(4), 200).get_paths()
    res = pf.EnsembleKalmanFilter(ssm, ensemble_size=500).batch_filter(
        jax.random.PRNGKey(5), y
    )
    rmse = float(np.sqrt(np.mean((np.asarray(res.filter_means)[:, 0] - np.asarray(x)) ** 2)))
    assert np.isfinite(float(res.log_likelihood))
    assert rmse < 0.15, rmse


def test_enkf_nan_skip():
    """All-NaN observations contribute exactly 0 to the log-likelihood and
    leave the analysis untouched (the filter coasts on the forecast)."""
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(6), 50).get_paths()
    y = np.asarray(y).copy()
    y[20:30] = np.nan
    res = pf.EnsembleKalmanFilter(ssm, ensemble_size=400).batch_filter(
        jax.random.PRNGKey(7), jnp.asarray(y)
    )
    assert np.isfinite(float(res.log_likelihood))
    np.testing.assert_array_equal(np.asarray(res.step_log_likelihoods)[20:30], 0.0)
    # variance grows through the unobserved gap (no analysis contraction)
    v = np.asarray(res.filter_variances)
    assert v[29] > v[19]


def test_enkf_inflation_widens_ensemble():
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(8), 40).get_paths()
    base = pf.EnsembleKalmanFilter(ssm, ensemble_size=300).batch_filter(
        jax.random.PRNGKey(9), y
    )
    inflated = pf.EnsembleKalmanFilter(ssm, ensemble_size=300, inflation=1.2).batch_filter(
        jax.random.PRNGKey(9), y
    )
    assert np.asarray(inflated.filter_variances).mean() > np.asarray(base.filter_variances).mean()


def test_enks_matches_exact_rts_on_linear_model():
    """The ensemble RTS smoother converges to the exact Kalman RTS smoother
    on a linear-Gaussian model; smoothing tightens the filter marginals."""
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(12), 60).get_paths()
    km, kc = pf.KalmanFilter(ssm).smooth(y)
    enkf = pf.EnsembleKalmanFilter(ssm, ensemble_size=4000)
    sm = enkf.smooth(jax.random.PRNGKey(13), y)  # (T, M, 1)
    np.testing.assert_allclose(
        np.asarray(sm.mean(axis=1)), np.asarray(km), atol=0.06
    )
    np.testing.assert_allclose(
        np.asarray(sm.var(axis=1, ddof=1)), np.asarray(kc)[:, :, 0], rtol=0.2
    )
    # smoothed variance < filtered variance away from the endpoint
    filt = enkf.batch_filter(jax.random.PRNGKey(14), y)
    assert (
        np.asarray(sm.var(axis=1, ddof=1))[:-5].mean()
        < np.asarray(filt.filter_variances)[:-5].mean()
    )


def test_enkf_jit_and_grad():
    """The whole batch_filter traces under jit and differentiates w.r.t. a
    model parameter, with the gradient pointing toward the truth."""
    _, y = linear_ssm(0.7).sample_states(jax.random.PRNGKey(10), 120).get_paths()

    def ll(beta):
        ssm = ts.LinearStateSpaceModel(models.AR(0.2, beta, 0.4), (1.0, 0.25))
        return pf.EnsembleKalmanFilter(ssm, ensemble_size=256).batch_filter(
            jax.random.PRNGKey(11), y
        ).log_likelihood

    g_low = float(jax.jit(jax.grad(ll))(0.4))
    g_high = float(jax.jit(jax.grad(ll))(0.95))
    assert g_low > 0.0 > g_high, (g_low, g_high)


def test_enkf_lane_batching_matches_per_lane_loop():
    """batch_shape=(K,): lane-batched model leaves (different beta per lane)
    run K independent ensembles under one vmap, each reproducing the
    single-lane run with the same per-lane key split."""
    import jax as _jax

    betas = np.asarray([0.5, 0.7, 0.9], np.float32)
    _, y = linear_ssm().sample_states(jax.random.PRNGKey(20), 40).get_paths()
    laned_model = ts.LinearStateSpaceModel(
        ts.models.AR(0.0, jnp.asarray(betas), 0.3), (1.0, 0.2)
    )
    key = jax.random.PRNGKey(21)
    laned = pf.EnsembleKalmanFilter(laned_model, 400, batch_shape=(3,)).batch_filter(key, y)
    assert laned.log_likelihood.shape == (3,)
    assert laned.filter_means.shape[:2] == (40, 3)

    keys = _jax.random.split(key, 3)
    for i, b in enumerate(betas):
        single_model = ts.LinearStateSpaceModel(
            ts.models.AR(0.0, jnp.asarray(float(b)), 0.3), (1.0, 0.2)
        )
        single = pf.EnsembleKalmanFilter(single_model, 400).batch_filter(keys[i], y)
        np.testing.assert_allclose(
            float(laned.log_likelihood[i]), float(single.log_likelihood), rtol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(laned.filter_means)[:, i, 0],
            np.asarray(single.filter_means)[:, 0], rtol=1e-3, atol=1e-4,
        )
    # lane surgery on the vmapped ensemble states
    last = laned.latest_state
    perm = last.resample(jnp.asarray([2, 0, 1]))
    np.testing.assert_allclose(
        np.asarray(perm.log_likelihood), np.asarray(last.log_likelihood)[[2, 0, 1]]
    )


def test_etkf_lane_batching_matches_per_lane_loop():
    import jax as _jax

    betas = np.asarray([0.5, 0.9], np.float32)
    _, y = linear_ssm().sample_states(jax.random.PRNGKey(22), 30).get_paths()
    laned_model = ts.LinearStateSpaceModel(
        ts.models.AR(0.0, jnp.asarray(betas), 0.3), (1.0, 0.2)
    )
    key = jax.random.PRNGKey(23)
    laned = pf.EnsembleTransformKalmanFilter(
        laned_model, 200, batch_shape=(2,)
    ).batch_filter(key, y)
    keys = _jax.random.split(key, 2)
    for i, b in enumerate(betas):
        single_model = ts.LinearStateSpaceModel(
            ts.models.AR(0.0, jnp.asarray(float(b)), 0.3), (1.0, 0.2)
        )
        single = pf.EnsembleTransformKalmanFilter(single_model, 200).batch_filter(keys[i], y)
        np.testing.assert_allclose(
            float(laned.log_likelihood[i]), float(single.log_likelihood), rtol=2e-5
        )
