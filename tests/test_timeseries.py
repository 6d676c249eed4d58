"""Model layer tests: processes, SSMs, joint processes, simulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu.distributions as dist
from pyfilter_tpu import timeseries as ts
from pyfilter_tpu.timeseries import models


def test_ar_process_sampling_and_density(key):
    ar = models.AR(0.0, 0.99, 0.05)
    x0 = ar.initial_sample(key, (1000,))
    assert x0.value.shape == (1000,)
    assert float(x0.time_index) == 0.0

    d = ar.build_density(x0)
    assert isinstance(d, dist.Normal)
    np.testing.assert_allclose(np.asarray(d.mean), 0.99 * np.asarray(x0.value), rtol=1e-5)

    x1 = ar.propagate(jax.random.split(key)[0], x0)
    assert x1.value.shape == (1000,)
    assert float(x1.time_index) == 1.0


def test_ar_stationary_moments(key):
    alpha, beta, sigma = 0.5, 0.9, 0.1
    ar = models.AR(alpha, beta, sigma)
    path = ar.sample_states(key, 5000)
    x = np.asarray(path.x, np.float64)
    # stationary mean alpha / (1 - beta), var sigma^2 / (1 - beta^2)
    np.testing.assert_allclose(x[1000:].mean(), alpha / (1 - beta), atol=0.15)
    np.testing.assert_allclose(x[1000:].var(), sigma**2 / (1 - beta**2), rtol=0.25)


def test_ou_exact_discretization(key):
    kappa, gamma, sigma = 0.5, 1.0, 0.2
    ou = models.OrnsteinUhlenbeck(kappa, gamma, sigma)
    x = ts.TimeseriesState(jnp.asarray(0.0), jnp.asarray(2.0))
    d = ou.build_density(x)
    decay = np.exp(-0.5)
    np.testing.assert_allclose(np.asarray(d.mean), gamma + (2.0 - gamma) * decay, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d.stddev), sigma * np.sqrt((1 - decay**2) / (2 * kappa)), rtol=1e-5
    )
    init = ou.initial_distribution()
    np.testing.assert_allclose(np.asarray(init.stddev), sigma / np.sqrt(2 * kappa), rtol=1e-5)


def test_random_walk(key):
    rw = models.RandomWalk(0.3)
    path = rw.sample_states(key, 1000)
    increments = np.diff(np.asarray(path.x, np.float64))
    np.testing.assert_allclose(increments.std(), 0.3, rtol=0.1)


def test_affine_euler_maruyama_sine_diffusion(key):
    # the README example (README.md:35-82)
    from math import sqrt

    dt = 0.1

    def f(x, gamma, sigma):
        return jnp.sin(x.value - gamma), sigma

    def initial_kernel(gamma, sigma):
        return dist.Normal(jnp.zeros_like(jnp.asarray(gamma)), jnp.ones_like(jnp.asarray(sigma)))

    inc_dist = dist.Normal(0.0, sqrt(dt))
    proc = ts.AffineEulerMaruyama(f, (0.0, 1.0), inc_dist, initial_kernel=initial_kernel, dt=dt)

    x = ts.TimeseriesState(jnp.asarray(0.0), jnp.asarray(1.0))
    d = proc.build_density(x)
    np.testing.assert_allclose(np.asarray(d.mean), 1.0 + np.sin(1.0) * dt, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d.stddev), sqrt(dt), rtol=1e-5)

    path = proc.sample_states(key, 250)
    assert path.x.shape == (250,)
    assert np.isfinite(np.asarray(path.x)).all()


def test_linear_model_vector(key):
    a = jnp.eye(2)
    sigma = jnp.asarray([0.05, 0.1])
    inc = dist.Normal(jnp.zeros(2), jnp.ones(2)).to_event(1)
    rw = ts.LinearModel(
        (a, sigma), inc, lambda a_, b_, s_: dist.Normal(jnp.zeros(2), s_).to_event(1)
    )
    assert rw.event_ndim == 1
    x0 = rw.initial_sample(key, (100,))
    assert x0.value.shape == (100, 2)
    d = rw.build_density(x0)
    assert d.event_shape == (2,)
    lp = d.log_prob(x0.value)
    assert lp.shape == (100,)


def test_state_space_model_sampling(key):
    ar = models.AR(0.0, 0.99, 0.05)
    ssm = ts.LinearStateSpaceModel(ar, (1.0, 0.15), ())
    a, b, s = ssm.parameters
    assert float(b) == 0.0
    path = ssm.sample_states(key, 200)
    x, y = path.get_paths()
    assert x.shape == (200,) and y.shape == (200,)
    assert np.isfinite(np.asarray(y)).all()
    resid = np.asarray(y, np.float64) - np.asarray(x, np.float64)
    np.testing.assert_allclose(resid.std(), 0.15, rtol=0.15)


def test_observe_every_step_nan_masking(key):
    ar = models.AR(0.0, 0.9, 0.1)
    ssm = ts.LinearStateSpaceModel(ar, (1.0, 0.1), (), observe_every_step=10)
    path = ssm.sample_states(key, 100)
    y = np.asarray(path.y)
    observed = ~np.isnan(y)
    assert observed.sum() == 10
    # time indexes of observations are multiples of 10
    tidx = np.asarray(path.time_indexes)[observed]
    assert np.all(tidx % 10 == 0)


def test_nonlinear_ssm_obs_builder(key):
    ar = models.AR(0.0, 0.99, 0.05)

    def build_obs(x, a, s):
        return dist.Normal(a * jnp.square(x.value), s)

    ssm = ts.StateSpaceModel(ar, build_obs, (2.0, 0.1))
    assert ssm.event_shape == ()
    assert ssm.n_dim == 0
    x = ar.initial_sample(key, (50,))
    d = ssm.build_density(x)
    np.testing.assert_allclose(np.asarray(d.mean), 2.0 * np.square(np.asarray(x.value)), rtol=1e-5)


def test_lorenz_style_multivariate_ssm(key):
    # 3-D latent, 2-D partial observation (lorenz.ipynb)
    import math

    def f(x, s, r, b, sigma):
        x1 = -s * (x.value[..., 0] - x.value[..., 1])
        x2 = r * x.value[..., 0] - x.value[..., 1] - x.value[..., 0] * x.value[..., 2]
        x3 = x.value[..., 0] * x.value[..., 1] - b * x.value[..., 2]
        return jnp.stack((x1, x2, x3), axis=-1), sigma

    def initial_kernel(x0, s0):
        return dist.Normal(x0, s0).to_event(1)

    dt = 1e-2
    mean = jnp.asarray([-5.91652, -5.52332, 24.5723])
    scale = math.sqrt(10) * jnp.ones(3)
    inc = dist.Normal(jnp.zeros(3), math.sqrt(dt) * jnp.ones(3)).to_event(1)
    hidden = ts.AffineEulerMaruyama(
        f, (10.0, 28.0, 8.0 / 3.0, 1.0), inc, initial_kernel=initial_kernel, dt=dt,
        initial_parameters=(mean, scale),
    )
    mat = jnp.asarray([[0.8, 0.0, 0.0], [0.0, 0.0, 0.8]])
    ssm = ts.LinearStateSpaceModel(hidden, (mat, jnp.zeros(1), jnp.sqrt(jnp.asarray(0.1)) * jnp.ones(1)), (2,), observe_every_step=10)

    path = ssm.sample_states(key, 500)
    x, y = path.get_paths()
    assert x.shape == (500, 3) and y.shape == (500, 2)
    assert np.isfinite(np.asarray(x)).all()
    obs_rows = ~np.isnan(np.asarray(y)).all(axis=1)
    assert obs_rows.sum() == 50


def test_joint_process(key):
    p1 = models.RandomWalk(0.05)
    p2 = models.RandomWalk(0.1)
    joint = ts.joint_process(proc_1=p1, proc_2=p2)
    assert joint.event_shape == (2,)
    x0 = joint.initial_sample(key, (500,))
    assert x0.value.shape == (500, 2)
    d = joint.build_density(x0)
    lp = d.log_prob(x0.value)
    assert lp.shape == (500,)
    # joint density equals sum of marginals
    n1 = dist.Normal(x0.value[..., 0], 0.05).log_prob(x0.value[..., 0])
    n2 = dist.Normal(x0.value[..., 1], 0.1).log_prob(x0.value[..., 1])
    np.testing.assert_allclose(np.asarray(d.log_prob(x0.value)), np.asarray(n1 + n2), rtol=1e-4)

    m, s = joint.mean_scale(x0)
    assert m.shape == (500, 2) and s.shape == (500, 2)
    np.testing.assert_allclose(np.asarray(s[..., 0]), 0.05, rtol=1e-6)


def test_processes_are_pytrees_and_jit_safe(key):
    ar = models.AR(0.1, 0.9, 0.2)

    @jax.jit
    def run(proc, key):
        x0 = proc.initial_sample(key, (64,))
        return proc.propagate(key, x0).value

    out = run(ar, key)
    assert out.shape == (64,)

    # vmap over batched parameters (the parameter-particle pattern)
    betas = jnp.linspace(0.5, 0.9, 8)

    def make_and_step(beta, key):
        proc = models.AR(0.0, beta, 0.1)
        x0 = proc.initial_sample(key, (16,))
        return proc.propagate(key, x0).value

    out = jax.vmap(make_and_step, in_axes=(0, None))(betas, key)
    assert out.shape == (8, 16)


def test_batched_parameters_broadcast(key):
    # parameters with a lane axis (K,) broadcast against particles (N, K)
    K, N = 4, 32
    betas = jnp.linspace(0.5, 0.9, K)
    ar = models.AR(jnp.zeros(K), betas, 0.1 * jnp.ones(K))
    x0 = ar.initial_sample(key, (N,))
    assert x0.value.shape == (N, K)
    x1 = ar.propagate(key, x0)
    assert x1.value.shape == (N, K)
    d = ar.build_density(x0)
    assert d.log_prob(x1.value).shape == (N, K)


# ---------------------------------------------------------------------------
# stochproc model-zoo equivalents beyond the reference's direct usage
# (SURVEY.md §2.9: the rebuild must ship its own model layer)
# ---------------------------------------------------------------------------


def test_local_linear_trend_matches_kalman(key):
    """LocalLinearTrend is linear-Gaussian: F=[[1,1],[0,1]], Q=diag(sigma^2).
    Filter it with the exact Kalman filter and a particle filter and check
    both the model's law (via the oracle run) and the process mechanics."""
    import pyfilter_tpu as pf
    from pyfilter_tpu.filters.particle import proposals

    sig = (0.05, 0.02)
    llt = models.LocalLinearTrend(*sig)
    x0 = llt.initial_sample(key, (256,))
    assert x0.value.shape == (256, 2)
    x1 = llt.propagate(key, x0)
    # level' - level = slope + noise; slope' - slope = noise
    drift = np.asarray(x1.value - x0.value)
    np.testing.assert_allclose(drift[:, 0], np.asarray(x0.value[:, 1]), atol=4 * sig[0])
    assert np.abs(drift[:, 1]).max() < 6 * sig[1]

    a = jnp.eye(2)
    ssm = ts.LinearStateSpaceModel(llt, (a, 0.15 * jnp.ones(2)), event_shape=(2,))
    y = ssm.sample_states(jax.random.PRNGKey(0), 60).y
    exact = pf.KalmanFilter(ssm).batch_filter(y)
    part = pf.APF(ssm, 1500, proposal=proposals.LinearGaussianObservations()).batch_filter(
        jax.random.PRNGKey(1), y
    )
    assert abs(float(part.log_likelihood) - float(exact.log_likelihood)) < 1.0
    np.testing.assert_allclose(
        np.asarray(part.filter_means), np.asarray(exact.filter_means), atol=0.1
    )


def test_trending_ou_tracks_trend(key):
    kappa, gamma, beta, sigma = 0.8, 1.0, 0.05, 0.1
    proc = models.TrendingOU(kappa, gamma, beta, sigma)
    paths = jax.vmap(lambda k: proc.sample_states(k, 200).x)(jax.random.split(key, 200))
    x = np.asarray(paths, np.float64)  # (200 paths, 201 steps)
    t = np.arange(x.shape[1])
    # late-sample mean reverts to the moving trend gamma + beta * t (the
    # stationary lag is beta/kappa; tolerance covers it plus MC noise)
    late = slice(100, None)
    np.testing.assert_allclose(
        x.mean(0)[late], (gamma + beta * t)[late], atol=beta / kappa + 0.05
    )
    # jit/pytree-safe
    jitted = jax.jit(lambda k: proc.propagate(k, proc.initial_sample(k, (8,))).value)
    assert jitted(key).shape == (8,)


def test_cyclical_matches_kalman(key):
    """Harvey's stochastic cycle is linear-Gaussian (damped rotation):
    F = rho * R(lamda), Q = sigma^2 I. Check the stationary initial law and
    filter it with the exact Kalman filter vs a particle filter."""
    import pyfilter_tpu as pf
    from pyfilter_tpu.filters.particle import proposals

    rho, lamda, sigma = 0.9, 0.5, 0.1
    cyc = models.Cyclical(rho, lamda, sigma)
    x0 = cyc.initial_sample(key, (4096,))
    assert x0.value.shape == (4096, 2)
    # stationary std = sigma / sqrt(1 - rho^2)
    stat = sigma / np.sqrt(1.0 - rho**2)
    assert np.asarray(x0.value).std(0) == pytest.approx(stat, rel=0.1)
    # one step rotates the mean by rho * R(lamda)
    x1 = cyc.propagate(key, x0)
    rot = rho * np.array(
        [[np.cos(lamda), np.sin(lamda)], [-np.sin(lamda), np.cos(lamda)]]
    )
    np.testing.assert_allclose(
        np.asarray(x1.value).mean(0), rot @ np.asarray(x0.value).mean(0), atol=4 * sigma / 64
    )

    a = jnp.asarray([[1.0, 0.0]])  # observe the cycle component only
    ssm = ts.LinearStateSpaceModel(cyc, (a, jnp.asarray([0.05])), event_shape=(1,))
    y = ssm.sample_states(jax.random.PRNGKey(2), 80).y
    exact = pf.KalmanFilter(ssm).batch_filter(y)
    part = pf.APF(ssm, 1500, proposal=proposals.LinearGaussianObservations()).batch_filter(
        jax.random.PRNGKey(3), y
    )
    assert abs(float(part.log_likelihood) - float(exact.log_likelihood)) < 1.0
    np.testing.assert_allclose(
        np.asarray(part.filter_means), np.asarray(exact.filter_means), atol=0.08
    )


def test_ucsv_level_and_volatility(key):
    import pyfilter_tpu as pf

    sv = 0.05
    proc = models.UCSV(sv)
    x0 = proc.initial_sample(key, (512,))
    assert x0.value.shape == (512, 2)
    x1 = proc.propagate(key, x0)
    # log-vol moves by N(0, sv); level moves by exp(log_vol) * N(0,1)
    dv = np.asarray(x1.value[:, 1] - x0.value[:, 1])
    assert dv.std() == pytest.approx(sv, rel=0.3)

    # a bootstrap filter on (level observed + noise) tracks the level
    a = jnp.asarray([[1.0, 0.0]])
    ssm = ts.LinearStateSpaceModel(proc, (a, jnp.asarray([0.1])), event_shape=(1,))
    path = ssm.sample_states(jax.random.PRNGKey(3), 80)
    res = pf.SISR(ssm, 1000).batch_filter(jax.random.PRNGKey(4), path.y)
    means = np.asarray(res.filter_means)[:, 0]
    truth = np.asarray(path.x)[-len(means):, 0]
    level_rmse = float(np.sqrt(np.mean((means - truth) ** 2)))
    assert np.isfinite(float(res.log_likelihood))
    assert level_rmse < 0.25, level_rmse
