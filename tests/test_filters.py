"""Particle filter tests against the exact Kalman oracle.

Mirrors the reference's test strategy (tests/filters/test_particle.py):
linear-Gaussian models paired with an exact Kalman filter; particle means and
log-likelihood must be within median relative deviation < 0.1; parametrized
over filters × proposals × batch shapes × missing-data fractions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu.distributions as dist
from pyfilter_tpu import timeseries as ts
from pyfilter_tpu.filters import APF, GPF, SISR
from pyfilter_tpu.filters.particle import proposals as props
from pyfilter_tpu.timeseries import models

from kalman import KalmanFilter

RELATIVE_TOLERANCE = 0.1
SERIES_LENGTH = 100


def median_relative_deviation(y_true, y):
    return np.median(np.abs((y_true - y) / y_true))


def ar_model():
    """AR(1) + scalar linear obs (reference tests/filters/models.py:11-28)."""
    alpha, beta, sigma = 0.0, 0.99, 0.05
    ar = models.AR(alpha, beta, sigma)
    a, s = 1.0, 0.15
    ssm = ts.LinearStateSpaceModel(ar, (a, s))
    kalman = KalmanFilter(
        beta, a, sigma**2.0, s**2.0,
        transition_offsets=alpha,
        initial_state_mean=alpha,
        initial_state_covariance=sigma**2.0,
    )
    return ssm, kalman


def rw2d_model():
    """2-D linear random walk + 2-D obs (reference models.py:30-53)."""
    sigma = np.array([0.05, 0.1])
    a, s = np.eye(2), 0.15 * np.ones(2)
    inc = dist.Normal(0.0, 1.0).expand((2,)).to_event(1)
    rw = ts.LinearModel(
        (jnp.asarray(a, jnp.float32), jnp.asarray(sigma, jnp.float32)),
        inc,
        lambda m_, _, s_: dist.Normal(0.0, s_).expand((2,)).to_event(1),
        event_ndim=1,
    )
    ssm = ts.LinearStateSpaceModel(
        rw, (jnp.asarray(a, jnp.float32), jnp.asarray(s, jnp.float32)), event_shape=(2,)
    )
    kalman = KalmanFilter(
        a, a, sigma**2.0 * np.eye(2), s**2.0 * np.eye(2),
        initial_state_covariance=sigma**2.0 * np.eye(2),
    )
    return ssm, kalman


def joint2d_model():
    """Joint process of two RandomWalks, equivalent to rw2d (reference models.py:55-62)."""
    sigma = np.array([0.05, 0.1])
    a, s = np.eye(2), 0.15 * np.ones(2)
    joint = ts.joint_process(
        proc_1=models.RandomWalk(0.05), proc_2=models.RandomWalk(0.1)
    )
    ssm = ts.LinearStateSpaceModel(
        joint, (jnp.asarray(a, jnp.float32), jnp.asarray(s, jnp.float32)), event_shape=(2,)
    )
    kalman = KalmanFilter(
        a, a, sigma**2.0 * np.eye(2), s**2.0 * np.eye(2),
        initial_state_covariance=sigma**2.0 * np.eye(2),
    )
    return ssm, kalman


MODELS = {"ar": ar_model, "rw2d": rw2d_model, "joint2d": joint2d_model}

FILTERS = {
    "gpf": lambda m, n, **kw: GPF(m, n, **kw),
    "gpf-glinearized": lambda m, n, **kw: GPF(
        m, n, proposal=props.GaussianLinearized(n_steps=5), **kw
    ),
    "gpf-glinearized2": lambda m, n, **kw: GPF(
        m, n, proposal=props.GaussianLinearized(n_steps=5, use_second_order=True), **kw
    ),
    "gpf-glinear": lambda m, n, **kw: GPF(m, n, proposal=props.GaussianLinear(), **kw),
    "sisr-bootstrap": lambda m, n, **kw: SISR(m, n, proposal=props.Bootstrap(), **kw),
    "apf-bootstrap": lambda m, n, **kw: APF(m, n, proposal=props.Bootstrap(), **kw),
    "sisr-nested": lambda m, n, **kw: SISR(m, n, proposal=props.NestedProposal(50), **kw),
    "apf-nested": lambda m, n, **kw: APF(m, n, proposal=props.NestedProposal(50), **kw),
    "sisr-linearized": lambda m, n, **kw: SISR(
        m, n, proposal=props.Linearized(n_steps=5), **kw
    ),
    "sisr-linearized2": lambda m, n, **kw: SISR(
        m, n, proposal=props.Linearized(n_steps=5, use_second_order=True), **kw
    ),
    "apf-linearized": lambda m, n, **kw: APF(m, n, proposal=props.Linearized(n_steps=5), **kw),
    "sisr-linear": lambda m, n, **kw: SISR(
        m, n, proposal=props.LinearGaussianObservations(), **kw
    ),
    "apf-linear": lambda m, n, **kw: APF(
        m, n, proposal=props.LinearGaussianObservations(), **kw
    ),
}


def make_data(kalman, missing_perc=0.0, seed=123):
    rng = np.random.default_rng(seed)
    x, y = kalman.sample(SERIES_LENGTH, rng)
    if missing_perc > 0:
        idx = rng.integers(1, SERIES_LENGTH, size=int(missing_perc * SERIES_LENGTH))
        y[idx] = np.nan
    return x, y


def run_filter_check(model_name, filter_name, batch_shape=(), missing=0.0, particles=1500):
    ssm, kalman = MODELS[model_name]()
    x, y = make_data(kalman, missing)
    km, _, kll = kalman.filter(y)

    filt = FILTERS[filter_name](ssm, particles).set_batch_shape(batch_shape)
    y_in = jnp.asarray(y[:, 0] if model_name == "ar" else y, jnp.float32)
    result = filt.batch_filter(jax.random.PRNGKey(42), y_in)

    means = np.asarray(result.filter_means, np.float64)
    if means.ndim == 1 + len(batch_shape):  # scalar event
        means = means[..., None]
    if batch_shape:
        km_b = km[:, None]
    else:
        km_b = km

    ll = np.asarray(result.log_likelihood, np.float64)
    assert np.all(np.abs((ll - kll) / kll) < RELATIVE_TOLERANCE), (ll, kll)
    dev = median_relative_deviation(km_b, means)
    assert dev < RELATIVE_TOLERANCE, dev
    return ssm, filt, result, kalman, y


@pytest.mark.parametrize("filter_name", sorted(FILTERS))
def test_filter_vs_kalman_ar(filter_name):
    run_filter_check("ar", filter_name)


@pytest.mark.parametrize("model_name", ["rw2d", "joint2d"])
@pytest.mark.parametrize(
    "filter_name",
    [
        "sisr-bootstrap",
        "apf-linear",
        "sisr-linearized",
        "sisr-linearized2",
        "gpf",
        "gpf-glinear",
        "gpf-glinearized",
        "gpf-glinearized2",
        "apf-nested",
    ],
)
def test_filter_vs_kalman_2d(model_name, filter_name):
    run_filter_check(model_name, filter_name)


@pytest.mark.parametrize("filter_name", ["sisr-bootstrap", "apf-linear"])
@pytest.mark.parametrize("batch_shape", [(3,)])
@pytest.mark.parametrize("missing", [0.0, 0.1])
def test_filter_batched_and_missing(filter_name, batch_shape, missing):
    run_filter_check("ar", filter_name, batch_shape=batch_shape, missing=missing)


@pytest.mark.parametrize("model_name", ["ar", "rw2d"])
@pytest.mark.parametrize("filter_name", ["sisr-bootstrap", "apf-linear"])
@pytest.mark.parametrize("method", ["ffbs", "fl"])
def test_smooth(model_name, filter_name, method):
    ssm, kalman = MODELS[model_name]()
    x, y = make_data(kalman, 0.0)
    ksm, _ = kalman.smooth(y)

    filt = FILTERS[filter_name](ssm, 1500, record_states=True)
    y_in = jnp.asarray(y[:, 0] if model_name == "ar" else y, jnp.float32)
    result = filt.batch_filter(jax.random.PRNGKey(7), y_in)
    assert result.states.values.shape[0] == SERIES_LENGTH + 1

    smoothed = filt.smooth(jax.random.PRNGKey(8), result, method=method)
    means = np.asarray(smoothed[1:].mean(axis=1), np.float64)
    if means.ndim == 1:
        means = means[:, None]

    cut = int(0.9 * SERIES_LENGTH) if method == "ffbs" else 10
    dev = median_relative_deviation(ksm[-cut:], means[-cut:])
    assert dev < RELATIVE_TOLERANCE, dev


def test_predict_path(key):
    ssm, kalman = ar_model()
    _, y = make_data(kalman)
    filt = SISR(ssm, 200)
    result = filt.batch_filter(key, jnp.asarray(y[:, 0], jnp.float32))
    path = result.latest_state.predict_path(key, ssm, 10)
    xs, ys = path.get_paths()
    assert xs.shape == (10, 200)


def test_all_nan_skip(key):
    """All-NaN observations contribute zero log-likelihood and only propagate."""
    ssm, kalman = ar_model()
    _, y = make_data(kalman)
    y[10] = np.nan
    filt = SISR(ssm, 500)
    result = filt.batch_filter(key, jnp.asarray(y[:, 0], jnp.float32))
    assert float(result.step_log_likelihoods[10]) == 0.0
    assert np.isfinite(float(result.log_likelihood))


def test_impute_strategy(key):
    ssm, kalman = rw2d_model()
    _, y = make_data(kalman)
    y[5, 0] = np.nan  # partial missing
    filt = SISR(ssm, 500, nan_strategy="impute")
    result = filt.batch_filter(key, jnp.asarray(y, jnp.float32))
    assert np.isfinite(float(result.log_likelihood))
    assert np.all(np.isfinite(np.asarray(result.filter_means)))


def test_increase_particles(key):
    ssm, _ = ar_model()
    filt = SISR(ssm, 100)
    bigger = filt.increase_particles(2)
    assert bigger.n_particles == 200
    assert bigger.initialize(key).x.value.shape == (200,)


def test_result_lane_surgery(key):
    """resample/exchange permute lanes functionally (reference result.py:76-117)."""
    ssm, kalman = ar_model()
    _, y = make_data(kalman)
    filt = SISR(ssm, 300, batch_shape=(4,), record_states=True)
    result = filt.batch_filter(key, jnp.asarray(y[:, 0], jnp.float32))

    perm = jnp.asarray([3, 2, 1, 0])
    permuted = result.resample(perm)
    np.testing.assert_allclose(
        np.asarray(permuted.log_likelihood), np.asarray(result.log_likelihood)[::-1]
    )
    np.testing.assert_allclose(
        np.asarray(permuted.filter_means), np.asarray(result.filter_means)[:, ::-1]
    )

    mask = jnp.asarray([True, False, True, False])
    other = result.resample(perm)
    mixed = result.exchange(other, mask)
    np.testing.assert_allclose(
        np.asarray(mixed.log_likelihood),
        np.where(np.asarray(mask), np.asarray(other.log_likelihood), np.asarray(result.log_likelihood)),
    )


def test_observe_every_step(key):
    """SDE sub-stepping: observations every k-th process step.

    Exact oracle: a scalar Kalman recursion with the filter's own gap-variance
    schedule — 1 hidden step before the first observation, ``oes`` steps
    between subsequent ones (reference base.py:204-210 timing semantics).
    """
    sigma_h, sigma_o = 0.1, 0.05
    oes = 5
    rw = models.RandomWalk(sigma_h)
    ssm = ts.LinearStateSpaceModel(rw, (1.0, sigma_o), observe_every_step=oes)

    # generate data from the very same gap schedule
    rng = np.random.default_rng(11)
    qs = [sigma_h**2.0] + [oes * sigma_h**2.0] * (SERIES_LENGTH - 1)
    xc = rng.normal(0.0, sigma_h)  # initial kernel N(0, sigma_h)
    y = np.zeros(SERIES_LENGTH)
    for t, q in enumerate(qs):
        xc = xc + rng.normal(0.0, np.sqrt(q))
        y[t] = xc + rng.normal(0.0, sigma_o)

    # exact scalar Kalman with time-varying Q
    m, P = 0.0, sigma_h**2.0
    kll = 0.0
    km = np.zeros(SERIES_LENGTH)
    for t, q in enumerate(qs):
        P = P + q
        S = P + sigma_o**2.0
        k_gain = P / S
        innov = y[t] - m
        kll += -0.5 * (innov**2 / S + np.log(S) + np.log(2 * np.pi))
        m = m + k_gain * innov
        P = P - k_gain * P
        km[t] = m

    filt = SISR(ssm, 2000)
    result = filt.batch_filter(key, jnp.asarray(y, jnp.float32))
    # time index advances oes steps per observation (after the first)
    t_last = float(result.latest_state.x.time_index)
    assert t_last == 1 + (SERIES_LENGTH - 1) * oes

    ll = float(result.log_likelihood)
    assert abs((ll - kll) / kll) < RELATIVE_TOLERANCE
    dev = median_relative_deviation(km, np.asarray(result.filter_means))
    assert dev < RELATIVE_TOLERANCE


def test_local_linearization(key):
    """Working LocalLinearization (the reference's is disabled,
    local_linearization.py:40): the UKF-style nonlinear benchmark model
    (reference tests/filters/models.py:65-104) filtered with the linearized
    optimal proposal must match a large bootstrap filter on loglik and means,
    with and without a user-supplied derivative."""
    import math

    sigma, s = math.sqrt(10.0), 1.0

    def mean_scale(x, s_):
        xt = x.value
        return xt / 2.0 + 25 * xt / (1 + xt**2.0) + 8.0 * jnp.cos(1.2 * x.time_index), s_

    def obs_mean(x, s_):
        return x.value**2.0 / 20.0

    def obs_deriv(x, s_):
        return x.value / 10.0

    hidden = ts.AffineProcess(
        mean_scale, (sigma,), dist.Normal(0.0, 1.0), lambda *a: dist.Normal(0.0, math.sqrt(5.0))
    )
    ssm = ts.StateSpaceModel(hidden, lambda x, s_: dist.Normal(obs_mean(x, s_), s_), (s,))

    _, y = ssm.sample_states(jax.random.PRNGKey(33), 60).get_paths()

    oracle = SISR(ssm, 20_000).batch_filter(key, y)

    for lin_f in (obs_deriv, None):  # explicit derivative and autodiff
        prop = props.LocalLinearization(f=obs_mean, linearized_f=lin_f)
        for filt_cls in (SISR, APF):
            filt = filt_cls(ssm, 1_000, proposal=prop)
            res = filt.batch_filter(key, y)
            ll_o, ll = float(oracle.log_likelihood), float(res.log_likelihood)
            assert abs(ll - ll_o) / abs(ll_o) < 0.1, (filt_cls.__name__, lin_f, ll, ll_o)


def test_kalman_filter_exact(key):
    """The built-in exact KalmanFilter (new vs reference) matches the numpy
    oracle on means, variances and loglik, including NaN skips."""
    from pyfilter_tpu.filters import KalmanFilter as JKF

    sigma = np.array([0.05, 0.1])
    a, s = np.eye(2), 0.15 * np.ones(2)
    inc = dist.Normal(0.0, 1.0).expand((2,)).to_event(1)
    rw = ts.LinearModel(
        (jnp.asarray(a, jnp.float32), jnp.asarray(sigma, jnp.float32)),
        inc,
        lambda m_, _, s_: dist.Normal(0.0, s_).expand((2,)).to_event(1),
        event_ndim=1,
    )
    ssm = ts.LinearStateSpaceModel(
        rw, (jnp.asarray(a, jnp.float32), jnp.asarray(s, jnp.float32)), event_shape=(2,)
    )
    oracle = KalmanFilter(
        a, a, sigma**2.0 * np.eye(2), s**2.0 * np.eye(2),
        initial_state_covariance=sigma**2.0 * np.eye(2),
    )
    rng = np.random.default_rng(3)
    _, y = oracle.sample(80, rng)
    y[10] = np.nan
    km, kc, kll = oracle.filter(y)

    res = JKF(ssm).batch_filter(y)
    np.testing.assert_allclose(float(res.log_likelihood), kll, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res.filter_means), km, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(res.filter_variances),
        np.stack([np.diag(c) for c in kc]),
        rtol=1e-3,
        atol=1e-7,
    )


def test_record_intermediary(key):
    """Sub-step state recording (reference record_intermediary_states,
    base.py:206-208): the history timeline contains every hidden step, and
    FFBS over it uses genuine single-step densities."""
    sigma_h, sigma_o, oes = 0.1, 0.05, 4
    rw = models.RandomWalk(sigma_h)
    ssm = ts.LinearStateSpaceModel(rw, (1.0, sigma_o), observe_every_step=oes)

    path = ssm.sample_states(jax.random.PRNGKey(5), 20 * oes)
    ys = path.y
    y = ys[~jnp.isnan(ys)]
    assert y.shape[0] == 20

    filt = SISR(ssm, 400, record_states=True, record_intermediary=True)
    res = filt.batch_filter(key, y)

    hist = res.states
    # timeline: init + first correction + (oes per remaining observation)
    expected_len = 1 + 1 + (20 - 1) * oes
    assert hist.values.shape[0] == expected_len
    times = np.asarray(hist.time_indexes)
    np.testing.assert_allclose(times, np.arange(expected_len, dtype=np.float64) + 0.0 - (times[0]))
    assert float(times[-1]) == 1 + 19 * oes

    # FFBS over the dense history runs and produces the dense timeline
    smoothed = filt.smooth(jax.random.PRNGKey(6), res, method="ffbs")
    assert smoothed.shape[0] == expected_len
    assert np.isfinite(np.asarray(smoothed)).all()

    # without the flag, only corrected states are recorded
    filt2 = SISR(ssm, 400, record_states=True)
    res2 = filt2.batch_filter(key, y)
    assert res2.states.values.shape[0] == 21


def test_bounded_record_states(key):
    """record_states=k keeps exactly the last k states in chronological order
    (the reference's maxlen-deque mode, container.py:10-18), enabling
    memory-bounded fixed-lag smoothing."""
    ssm, kalman = ar_model()
    _, y = make_data(kalman)
    y_in = jnp.asarray(y[:, 0], jnp.float32)

    full = SISR(ssm, 300, record_states=True).batch_filter(key, y_in)
    k = 12
    bounded = SISR(ssm, 300, record_states=k).batch_filter(key, y_in)

    assert bounded.states.values.shape[0] == k
    # identical keys -> identical trajectories: bounded history == tail of full
    np.testing.assert_array_equal(
        np.asarray(bounded.states.values), np.asarray(full.states.values)[-k:]
    )
    np.testing.assert_array_equal(
        np.asarray(bounded.states.time_indexes), np.asarray(full.states.time_indexes)[-k:]
    )
    np.testing.assert_allclose(
        np.asarray(bounded.log_likelihood), np.asarray(full.log_likelihood)
    )

    # fixed-lag smoothing over the bounded window runs
    filt = SISR(ssm, 300, record_states=k)
    sm = filt.smooth(jax.random.PRNGKey(1), bounded, method="fl")
    assert sm.shape[0] == k

    with pytest.raises(ValueError, match="record_states"):
        SISR(ssm, 300, record_states=500).batch_filter(key, y_in)


def test_masked_batch_filter_matches_prefix(key):
    """``batch_filter_masked`` on a padded buffer must reproduce
    ``batch_filter`` on the valid prefix bit-for-bit: the fori_loop consumes
    the identical per-step key stream (``split`` prefixes are stable across
    lengths), and padded steps contribute exactly nothing."""
    from pyfilter_tpu.filters.base import pad_observations

    ssm, _ = MODELS["ar"]()
    _, y = ssm.sample_states(key, 37).get_paths()
    y = jnp.asarray(y, jnp.float32)
    filt = SISR(ssm, 300)

    ref = filt.batch_filter(jax.random.PRNGKey(8), y)

    for bucket in (64, 128):
        y_padded, n_valid = pad_observations(np.asarray(y), bucket=bucket)
        got = filt.batch_filter_masked(jax.random.PRNGKey(8), y_padded, n_valid)
        # the total is summed over the padded length (zeros beyond n_valid):
        # a different reduction tree, so ULP-level only
        np.testing.assert_allclose(
            np.asarray(got.log_likelihood), np.asarray(ref.log_likelihood), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(got.latest_state.x.value), np.asarray(ref.latest_state.x.value)
        )
        # padded rows contribute exactly zero step loglik
        np.testing.assert_array_equal(
            np.asarray(got.step_log_likelihoods)[37:], 0.0
        )
        np.testing.assert_array_equal(
            np.asarray(got.step_log_likelihoods)[:37],
            np.asarray(ref.step_log_likelihoods),
        )


def test_poisson_count_observations(key):
    """Non-Gaussian count SSM: AR(1) log-intensity observed through Poisson
    counts — the pyro discrete observation-density use case the reference
    gets for free (SURVEY.md §2.9). Bootstrap SISR and APF both filter the
    counts; the filtered log-intensity tracks the simulated truth."""
    hidden = models.AR(0.3, 0.9, 0.25)
    ssm = ts.StateSpaceModel(hidden, lambda x: dist.Poisson(jnp.exp(x.value)), ())

    x_true, y = ssm.sample_states(jax.random.PRNGKey(77), 150).get_paths()
    assert np.all(np.asarray(y) >= 0.0)

    for filt_cls in (SISR, APF):
        res = filt_cls(ssm, 3_000).batch_filter(key, y)
        assert np.isfinite(float(res.log_likelihood))
        means = np.asarray(res.filter_means, np.float64).ravel()
        truth = np.asarray(x_true, np.float64).ravel()
        corr = np.corrcoef(means, truth)[0, 1]
        assert corr > 0.75, (filt_cls.__name__, corr)


def test_negative_binomial_observations(key):
    """Over-dispersed counts: NegativeBinomial observation density through the
    bootstrap filter (log-mean random walk; torch parameterization)."""
    hidden = models.RandomWalk(0.15)
    r = 8.0

    def obs(x):
        # mean = r * p/(1-p) = exp(x.value + 1.0)  ->  logits = x + 1 - log r
        return dist.NegativeBinomial(r, logits=x.value + 1.0 - jnp.log(r))

    ssm = ts.StateSpaceModel(hidden, obs, ())
    x_true, y = ssm.sample_states(jax.random.PRNGKey(5), 120).get_paths()

    res = SISR(ssm, 3_000).batch_filter(key, y)
    assert np.isfinite(float(res.log_likelihood))
    means = np.asarray(res.filter_means, np.float64).ravel()
    truth = np.asarray(x_true, np.float64).ravel()
    assert np.corrcoef(means, truth)[0, 1] > 0.6
