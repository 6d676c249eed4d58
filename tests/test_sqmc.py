"""SQMC (Gerber-Chopin sequential quasi-Monte Carlo) and the Hilbert kernel.

The Hilbert-curve tests are exhaustive structural checks (bijectivity +
unit-step adjacency over every grid cell — the property that DEFINES the
curve). The filter tests measure the capability claim itself: replicate
variance of the log-likelihood estimate well below the bootstrap filter's at
equal N, with the mean pinned to the exact Kalman value.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
from pyfilter_tpu import distributions as dist, timeseries as ts
from pyfilter_tpu.ops.hilbert import hilbert_argsort, hilbert_keys
from pyfilter_tpu.timeseries import models

from kalman import KalmanFilter as NumpyKalman

A, B, S, O = 0.2, 0.7, 0.4, 0.3


def ar_ssm():
    return ts.LinearStateSpaceModel(models.AR(A, B, S), (1.0, O))


def ar_oracle():
    return NumpyKalman(
        [[B]], [[1.0]], [[S**2]], [[O**2]], transition_offsets=[A],
        initial_state_mean=[A], initial_state_covariance=[[S**2]],
    )


@pytest.mark.parametrize("d,bits", [(2, 4), (3, 3), (2, 2), (4, 3)])
def test_hilbert_curve_is_bijective_with_unit_steps(d, bits):
    cells = np.array(list(itertools.product(range(1 << bits), repeat=d)), np.uint32)
    hi, lo = hilbert_keys(jnp.asarray(cells), bits)
    h = (np.asarray(hi, np.int64) << 32) | np.asarray(lo, np.int64)
    n_cells = (1 << bits) ** d
    assert sorted(h.tolist()) == list(range(n_cells))
    path = cells[np.argsort(h)].astype(np.int64)
    assert (np.abs(np.diff(path, axis=0)).sum(axis=1) == 1).all()


def test_hilbert_argsort_scalar_is_plain_sort():
    v = jnp.asarray([3.0, -1.0, 2.0, 0.5])
    np.testing.assert_array_equal(
        np.asarray(hilbert_argsort(v)), np.argsort(np.asarray(v))
    )


def test_hilbert_argsort_orders_clusters_contiguously():
    """Points from two well-separated 2-D clusters must come out grouped."""
    rng = np.random.default_rng(0)
    a = rng.normal(0.0, 0.05, size=(50, 2))
    b = rng.normal(5.0, 0.05, size=(50, 2)) + np.array([5.0, 0.0])
    pts = jnp.asarray(np.concatenate([a, b]), jnp.float32)
    order = np.asarray(hilbert_argsort(pts))
    labels = (order >= 50).astype(int)
    assert (np.abs(np.diff(labels)) > 0).sum() == 1  # one cluster boundary


@pytest.fixture(scope="module")
def ar_data():
    kf = ar_oracle()
    _, y = kf.sample(50, rng=np.random.default_rng(3))
    fm, _, ll = kf.filter(y[:, 0])
    return jnp.asarray(y[:, 0], jnp.float32), fm[:, 0], ll


def test_sqmc_variance_reduction_and_exactness(ar_data):
    """The headline property: at N=512 the RQMC replicate variance of the
    log-likelihood beats the always-resample bootstrap SISR by >= 3x (7.5x
    measured), and the replicate mean pins the exact Kalman value."""
    y, kalman_means, ll_exact = ar_data
    n, reps = 512, 16

    sq = pf.SQMC(ar_ssm(), n)
    bf = jax.jit(sq.batch_filter)
    lls = np.array([float(bf(jax.random.PRNGKey(i), y).log_likelihood) for i in range(reps)])

    si = pf.SISR(ar_ssm(), n, ess_threshold=1.1, fused_resample=False)
    bs = jax.jit(si.batch_filter)
    lls_s = np.array([float(bs(jax.random.PRNGKey(i), y).log_likelihood) for i in range(reps)])

    assert np.var(lls) < np.var(lls_s) / 3.0, (np.var(lls), np.var(lls_s))
    assert abs(np.mean(lls) - ll_exact) < 4.0 * np.sqrt(np.var(lls) / reps) + 0.05

    res = bf(jax.random.PRNGKey(0), y)
    rmse = float(jnp.sqrt(jnp.mean((res.filter_means - kalman_means) ** 2)))
    assert rmse < 0.02


def test_sqmc_multivariate_hilbert_path():
    """2-D independent chains: the Hilbert-sorted filter matches the
    factorized Kalman oracle."""
    d = 2

    def mean_scale(x, beta, q):
        return A + beta * x.value, q

    hidden = ts.AffineProcess(
        mean_scale,
        (jnp.asarray(B), jnp.asarray(S)),
        dist.Normal(jnp.zeros(d), jnp.ones(d)).to_event(1),
        lambda *_: dist.Normal(jnp.full(d, A), jnp.full(d, S)).to_event(1),
    )
    ssm = ts.LinearStateSpaceModel(hidden, (1.0, O), event_shape=(d,))
    x, y = ssm.sample_states(jax.random.PRNGKey(7), 40).get_paths()

    sq = pf.SQMC(ssm, 1024)
    res = jax.jit(sq.batch_filter)(jax.random.PRNGKey(1), y)

    ll_sum, means = 0.0, []
    for k in range(d):
        kf = ar_oracle()
        fm, _, ll_k = kf.filter(np.asarray(y)[:, k])
        ll_sum += ll_k
        means.append(fm[:, 0])
    means = np.stack(means, axis=-1)
    assert abs(float(res.log_likelihood) - ll_sum) / abs(ll_sum) < 0.01
    rel = np.abs(np.asarray(res.filter_means) - means) / (np.abs(means) + 1e-2)
    assert np.median(rel) < 0.05


def test_guided_sqmc_beats_bootstrap_sqmc(ar_data):
    """proposal='linear_gaussian': the optimal-proposal SQMC with peaky
    observations (obs std 0.15) — replicate variance orders of magnitude
    under bootstrap SQMC (1249x measured; asserted >= 20x), mean pinned to
    the exact Kalman value, partial-NaN steps exactly marginalized."""
    obs_std = 0.15
    ssm = ts.LinearStateSpaceModel(models.AR(A, B, S), (1.0, obs_std))
    kf = NumpyKalman(
        [[B]], [[1.0]], [[S**2]], [[obs_std**2]], transition_offsets=[A],
        initial_state_mean=[A], initial_state_covariance=[[S**2]],
    )
    _, y = kf.sample(50, rng=np.random.default_rng(3))
    yj = jnp.asarray(y[:, 0], jnp.float32)
    _, _, ll_exact = kf.filter(y[:, 0])

    reps = 12
    bf_b = jax.jit(pf.SQMC(ssm, 512).batch_filter)
    bf_g = jax.jit(pf.SQMC(ssm, 512, proposal="linear_gaussian").batch_filter)
    lls_b = np.array([float(bf_b(jax.random.PRNGKey(i), yj).log_likelihood) for i in range(reps)])
    lls_g = np.array([float(bf_g(jax.random.PRNGKey(i), yj).log_likelihood) for i in range(reps)])

    assert np.var(lls_g) < np.var(lls_b) / 20.0, (np.var(lls_g), np.var(lls_b))
    assert abs(np.mean(lls_g) - ll_exact) < 0.1

    # NaN gap: increments exactly zero, posterior falls back to the prior
    yn = np.array(yj)
    yn[10:13] = np.nan
    r = bf_g(jax.random.PRNGKey(0), jnp.asarray(yn))
    assert np.isfinite(float(r.log_likelihood))
    np.testing.assert_allclose(np.asarray(r.step_log_likelihoods[10:13]), 0.0, atol=1e-6)


def test_guided_sqmc_rejects_matrix_observation():
    a_mat = jnp.eye(2)
    hidden = ts.AffineProcess(
        lambda x, b: (b * x.value, 0.4),
        (jnp.asarray(0.7),),
        dist.Normal(jnp.zeros(2), jnp.ones(2)).to_event(1),
        lambda *_: dist.Normal(jnp.zeros(2), jnp.ones(2)).to_event(1),
    )
    ssm = ts.LinearStateSpaceModel(hidden, (a_mat, 0.2), event_shape=(2,))
    with pytest.raises(ValueError, match="scalar/per-component"):
        pf.SQMC(ssm, 64, proposal="linear_gaussian")


def test_sqmc_nan_skip(ar_data):
    y, _, _ = ar_data
    y = np.array(y)
    y[10:15] = np.nan
    y = jnp.asarray(y)
    sq = pf.SQMC(ar_ssm(), 256)
    res = jax.jit(sq.batch_filter)(jax.random.PRNGKey(0), y)
    assert np.isfinite(float(res.log_likelihood))
    np.testing.assert_allclose(np.asarray(res.step_log_likelihoods[10:15]), 0.0, atol=1e-6)


def test_sqmc_history_feeds_smoothing_and_variance(ar_data):
    """record_states=True yields a standard FilterHistory: FFBSi smoothing
    and the genealogy variance estimators run on an SQMC pass unchanged."""
    y, _, _ = ar_data
    from pyfilter_tpu.filters.particle import ffbsi_smooth, log_likelihood_variance
    from pyfilter_tpu.ops import systematic_counts

    sq = pf.SQMC(ar_ssm(), 256, record_states=True)
    res = jax.jit(sq.batch_filter)(jax.random.PRNGKey(2), y)
    assert res.states is not None
    assert res.states.values.shape[0] == y.shape[0] + 1

    sm = ffbsi_smooth(
        jax.random.PRNGKey(3), ar_ssm(), res.states, systematic_counts,
        n_trajectories=128,
    )
    assert np.isfinite(np.asarray(sm)).all()

    v = log_likelihood_variance(res)
    assert np.isfinite(float(v.variance[-1])) and float(v.variance[-1]) >= 0


def test_pmmh_with_sqmc_likelihood():
    """SQMC as the PMMH likelihood estimator (valid pseudo-marginal: the
    RQMC likelihood estimate is unbiased, Gerber-Chopin Thm 2): builder
    construction, per-chain lanes, traced model rebuilds inside the fused
    chain scan, FilterResult lane exchange. With the near-noiseless guided
    SQMC at only N=128 the random-walk chain both recovers the parameters
    and keeps a healthy acceptance rate."""
    from pyfilter_tpu import inference as inf
    from pyfilter_tpu.timeseries import models as tsm

    def true_model():
        return ts.LinearStateSpaceModel(
            tsm.OrnsteinUhlenbeck(0.5, 1.0, 0.1), (1.0, 0.05)
        )

    def build_model(ctx):
        k = ctx.named_parameter("kappa", dist.Exponential(1.0))
        g = ctx.named_parameter("gamma", dist.Normal(0.0, 1.0))
        s = ctx.named_parameter("sigma", dist.LogNormal(-2.0, 1.0))
        return ts.LinearStateSpaceModel(
            tsm.OrnsteinUhlenbeck(k, g, s), (1.0, 0.05)
        )

    _, y = true_model().sample_states(jax.random.PRNGKey(5), 100).get_paths()
    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
        filt = pf.SQMC(build_model, 128, proposal="linear_gaussian")
        alg = inf.PMMH(
            filt, num_samples=120, num_chains=4,
            proposal=inf.RandomWalk(scale=5e-2),
            context=ctx, key=jax.random.PRNGKey(2),
        )
        res = alg.fit(y, logging=inf.logging.DefaultLogger())
    ch = res.as_arrays()
    assert ch["gamma"][80:].mean() > 0.5          # moved from the 0.0 start
    assert ch["sigma"][80:].mean() < 0.2
    # near-noiseless marginal: RW acceptance stays high at tiny N (measured
    # ~0.49; a noisy pseudo-marginal at N=128 would stick)
    move_rate = np.mean(ch["gamma"][1:] != ch["gamma"][:-1])
    assert move_rate > 0.2


def test_sqmc_rejects_unsupported_models():
    # MVN increment with matrix scale has no componentwise icdf
    lq = jnp.asarray(np.linalg.cholesky([[0.3, 0.1], [0.1, 0.2]]), jnp.float32)
    hidden = ts.AffineProcess(
        lambda x, a: (a * x.value, 1.0),
        (jnp.asarray(0.9),),
        dist.MultivariateNormal(jnp.zeros(2), scale_tril=lq),
        lambda a: dist.MultivariateNormal(jnp.zeros(2), scale_tril=lq),
    )
    ssm = ts.LinearStateSpaceModel(hidden, (1.0, 0.2), event_shape=(2,))
    with pytest.raises(ValueError, match="icdf"):
        pf.SQMC(ssm, 64)
