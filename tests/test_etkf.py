"""ETKF / LETKF / Gaspari-Cohn localization tests.

Oracles: the float64 numpy Kalman filter (tests/kalman.py) for exact-filter
convergence, and a d-dimensional ring-diffusion model where the UNLOCALIZED
M ≪ d filter diverges on spurious sample correlations while the localized
filters track — the regime localization exists for.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
from pyfilter_tpu import distributions as dist, timeseries as ts
from pyfilter_tpu.filters.etkf import gaspari_cohn
from pyfilter_tpu.timeseries import models

from kalman import KalmanFilter as NumpyKalman

ALPHA, BETA, SIGMA, OBS_STD = 0.2, 0.7, 0.4, 0.25


def ar_ssm():
    return ts.LinearStateSpaceModel(models.AR(ALPHA, BETA, SIGMA), (1.0, OBS_STD))


def test_gaspari_cohn_shape():
    """GC taper: 1 at 0, monotone to 0 at 2c, exactly 0 beyond, and close to
    the Gaussian it mimics in the near field (Gaspari & Cohn 1999 §4)."""
    r = np.linspace(0.0, 3.0, 301)
    rho = np.asarray(gaspari_cohn(jnp.asarray(r)))
    assert abs(rho[0] - 1.0) < 1e-6
    assert (np.diff(rho[:201]) <= 1e-6).all()  # nonincreasing on [0, 2]
    assert abs(rho[200]) < 1e-5  # zero at r = 2
    assert (rho[201:] == 0.0).all()  # compact support
    # exact values from eq. 4.10: rho(1) = -1/4 + 1/2 + 5/8 - 5/3 + 1 = 5/24;
    # rho(0.5) from the near branch
    np.testing.assert_allclose(float(gaspari_cohn(jnp.asarray(1.0))), 5.0 / 24.0, rtol=1e-5)
    np.testing.assert_allclose(
        float(gaspari_cohn(jnp.asarray(0.5))),
        -0.25 * 0.5**5 + 0.5 * 0.5**4 + 0.625 * 0.5**3 - (5.0 / 3.0) * 0.25 + 1.0,
        rtol=1e-5,
    )


def test_etkf_converges_to_exact_kalman():
    """Global ETKF at large M: mean, variance, and loglik all converge on the
    exact filter — tighter than the stochastic EnKF at the same M because
    the update is deterministic (no perturbed-obs noise)."""
    oracle = NumpyKalman(
        [[BETA]], [[1.0]], [[SIGMA**2]], [[OBS_STD**2]],
        transition_offsets=[ALPHA],
        initial_state_mean=[ALPHA],
        initial_state_covariance=[[SIGMA**2]],
    )
    _, y = oracle.sample(60, rng=np.random.default_rng(5))
    means, covs, ll = oracle.filter(y)
    yj = jnp.asarray(y[:, 0], jnp.float32)

    # M stays in the hundreds: the (M, M) eigh scales ~M^3 and the M=3000
    # version of this test cost 266 s of the fast tier for no extra law
    # coverage (MC tolerances below scale with 1/sqrt(M))
    m_size = 800
    res = pf.EnsembleTransformKalmanFilter(ar_ssm(), m_size).batch_filter(
        jax.random.PRNGKey(0), yj
    )
    assert abs(float(res.log_likelihood) - ll) / abs(ll) < 0.05
    err_mean = np.abs(np.asarray(res.filter_means)[:, 0] - means[:, 0]).mean()
    err_var = np.abs(
        np.asarray(res.filter_variances)[:, 0] - covs[:, 0, 0]
    ).mean()
    assert err_mean < 0.06, err_mean
    assert err_var < 0.02, err_var

    # deterministic-update advantage: at small M the ETKF's variance
    # estimate beats the stochastic EnKF's on the same budget and data
    def var_err(filt):
        r = filt.batch_filter(jax.random.PRNGKey(1), yj)
        return np.abs(np.asarray(r.filter_variances)[:, 0] - covs[:, 0, 0]).mean()

    seeds = [pf.EnsembleTransformKalmanFilter(ar_ssm(), 40), pf.EnsembleKalmanFilter(ar_ssm(), 40)]
    assert var_err(seeds[0]) < var_err(seeds[1]), "square-root update should be tighter"


def _ring_ssm(d, q_std=0.3, obs_std=0.25, decay=0.95, mix=0.2):
    """Linear ring diffusion: x' = decay * ((1-mix) x + mix/2 (roll(x,1) +
    roll(x,-1))) + q eps, observed elementwise. The local coupling gives a
    short true correlation length — spurious long-range sample correlations
    at M << d are pure noise, the setting localization exists for."""

    def mean_scale(x, decay_, mix_, q_):
        v = x.value
        neigh = 0.5 * (jnp.roll(v, 1, axis=-1) + jnp.roll(v, -1, axis=-1))
        return decay_ * ((1.0 - mix_) * v + mix_ * neigh), q_

    hidden = ts.AffineProcess(
        mean_scale,
        (jnp.asarray(decay), jnp.asarray(mix), jnp.asarray(q_std)),
        dist.Normal(jnp.zeros(d), jnp.ones(d)).to_event(1),
        lambda *_: dist.Normal(jnp.zeros(d), jnp.ones(d)).to_event(1),
    )
    return ts.LinearStateSpaceModel(hidden, (1.0, obs_std), event_shape=(d,))


def _ring_localization(d, radius):
    idx = jnp.arange(d, dtype=jnp.float32)

    def ring_metric(a, b):
        diff = jnp.abs(a - b).sum(-1)
        return jnp.minimum(diff, d - diff)

    return pf.Localization.from_coords(idx, radius=radius, metric=ring_metric)


@pytest.mark.slow
def test_localized_etkf_tracks_where_unlocalized_enkf_diverges():
    """d=512, M=40: the unlocalized stochastic EnKF's RMSE degrades toward
    (or past) the prior scale on spurious long-range correlations; Gaspari-
    Cohn localized ETKF and localized stochastic EnKF both track near the
    observation noise floor."""
    d, m_size, t_steps = 512, 40, 12
    ssm = _ring_ssm(d)
    key = jax.random.PRNGKey(0)
    x_path, y_path = ssm.sample_states(key, t_steps).get_paths()
    x_np = np.asarray(x_path)
    y = jnp.asarray(y_path, jnp.float32)
    loc = _ring_localization(d, radius=4.0)

    def last_rmse(filt):
        res = filt.batch_filter(jax.random.PRNGKey(1), y)
        means = np.asarray(res.filter_means)
        return float(np.sqrt(np.mean((means[-4:] - x_np[-4:]) ** 2)))

    rmse_unloc = last_rmse(pf.EnsembleKalmanFilter(ssm, m_size))
    rmse_letkf = last_rmse(
        pf.EnsembleTransformKalmanFilter(ssm, m_size, localization=loc, inflation=1.05)
    )
    rmse_loc_enkf = last_rmse(
        pf.EnsembleKalmanFilter(ssm, m_size, localization=loc, inflation=1.05)
    )

    # the localized filters must beat the unlocalized one decisively and sit
    # near the observation-noise floor
    assert rmse_letkf < 0.6 * rmse_unloc, (rmse_letkf, rmse_unloc)
    assert rmse_loc_enkf < 0.75 * rmse_unloc, (rmse_loc_enkf, rmse_unloc)
    assert rmse_letkf < 2.0 * 0.25, rmse_letkf


def test_letkf_with_infinite_radius_matches_global_etkf():
    """A taper radius far beyond the domain makes every GC weight 1 — the
    LETKF solves must then reproduce the global ETKF analysis (same
    whitened-space algebra, solved per-component)."""
    d, m_size = 8, 200
    ssm = _ring_ssm(d)
    _, y_path = ssm.sample_states(jax.random.PRNGKey(2), 10).get_paths()
    y = jnp.asarray(y_path, jnp.float32)
    loc = _ring_localization(d, radius=1e6)

    res_g = pf.EnsembleTransformKalmanFilter(ssm, m_size).batch_filter(
        jax.random.PRNGKey(3), y
    )
    res_l = pf.EnsembleTransformKalmanFilter(ssm, m_size, localization=loc).batch_filter(
        jax.random.PRNGKey(3), y
    )
    np.testing.assert_allclose(
        np.asarray(res_l.filter_means), np.asarray(res_g.filter_means), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        float(res_l.log_likelihood), float(res_g.log_likelihood), rtol=1e-4
    )


def test_etkf_partial_nan_skip():
    """Missing observation components are excised; all-NaN rows propagate
    only (ll increment 0)."""
    ssm = ar_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(4), 30).get_paths()
    y = np.asarray(y).copy()
    y[10:13] = np.nan
    res = pf.EnsembleTransformKalmanFilter(ssm, 400).batch_filter(
        jax.random.PRNGKey(5), jnp.asarray(y)
    )
    lls = np.asarray(res.step_log_likelihoods)
    assert (lls[10:13] == 0.0).all()
    assert np.isfinite(float(res.log_likelihood))


def test_spmd_enkf_localized_matches_single_device():
    """The sharded EnKF with a localization taper (elementwise after the
    psum) agrees with the single-device localized filter's moments."""
    from jax.sharding import Mesh
    from pyfilter_tpu.parallel import spmd_enkf

    d, m_size = 16, 64
    ssm = _ring_ssm(d)
    _, y_path = ssm.sample_states(jax.random.PRNGKey(6), 8).get_paths()
    y = jnp.asarray(y_path, jnp.float32)
    loc = _ring_localization(d, radius=3.0)

    mesh = Mesh(np.array(jax.devices()[:4]), ("particles",))
    res = spmd_enkf(
        ssm, m_size, jax.random.PRNGKey(7), y, mesh, localization=loc
    )
    assert np.isfinite(float(res.log_likelihood))
    single = pf.EnsembleKalmanFilter(ssm, m_size, localization=loc).batch_filter(
        jax.random.PRNGKey(7), y
    )
    # different member key streams -> statistical, not bitwise, agreement
    np.testing.assert_allclose(
        np.asarray(res.filter_means), np.asarray(single.filter_means), atol=0.4
    )


def test_etks_matches_exact_rts_on_linear_model():
    """Ensemble transform Kalman smoother at large M converges on the exact
    float64 RTS smoother (same contract as the stochastic EnKS,
    tests/test_enkf.py) and improves on the filter marginals."""
    oracle = NumpyKalman(
        [[BETA]], [[1.0]], [[SIGMA**2]], [[OBS_STD**2]],
        transition_offsets=[ALPHA],
        initial_state_mean=[ALPHA],
        initial_state_covariance=[[SIGMA**2]],
    )
    _, y = oracle.sample(50, rng=np.random.default_rng(9))
    sm_mean, sm_cov = oracle.smooth(y)
    yj = jnp.asarray(y[:, 0], jnp.float32)

    # M stays ETKF-realistic: the transform is an (M, M) eigh per step, so
    # thousands of members is the wrong regime (and minutes of CPU eigh)
    filt = pf.EnsembleTransformKalmanFilter(ar_ssm(), 800)
    smoothed = filt.smooth(jax.random.PRNGKey(3), yj)  # (T, M, 1)
    m = np.asarray(smoothed).mean(axis=1)[:, 0]
    v = np.asarray(smoothed).var(axis=1, ddof=1)[:, 0]
    assert np.abs(m - sm_mean[:, 0]).mean() < 0.05
    np.testing.assert_allclose(v, sm_cov[:, 0, 0], rtol=0.35, atol=0.01)

    # the smoother must beat the filter against the exact smoothing means
    f_means, _, _ = oracle.filter(y)
    res = filt.batch_filter(jax.random.PRNGKey(3), yj)
    err_f = np.abs(np.asarray(res.filter_means)[:, 0] - sm_mean[:, 0]).mean()
    err_s = np.abs(m - sm_mean[:, 0]).mean()
    assert err_s < err_f, (err_s, err_f)


@pytest.mark.slow
def test_letks_localized_smoother_tracks_at_small_ensemble():
    """d ≫ M smoothing: the rho_xx-tapered backward gain keeps the LETKS
    tracking (near the filter's noise floor or better) where the smoother
    math at M=40 would otherwise feed spurious long-range correlations back
    through the reverse pass."""
    d, m_size, t_steps = 256, 40, 12
    ssm = _ring_ssm(d)
    x_path, y_path = ssm.sample_states(jax.random.PRNGKey(4), t_steps).get_paths()
    x_np = np.asarray(x_path)
    y = jnp.asarray(y_path, jnp.float32)
    loc = _ring_localization(d, radius=4.0)
    assert loc.rho_xx is not None and loc.rho_xx.shape == (d, d)

    filt = pf.EnsembleTransformKalmanFilter(ssm, m_size, localization=loc, inflation=1.05)
    res = filt.batch_filter(jax.random.PRNGKey(5), y)
    smoothed = filt.smooth(jax.random.PRNGKey(5), y)
    rmse_f = float(np.sqrt(np.mean((np.asarray(res.filter_means) - x_np) ** 2)))
    m = np.asarray(smoothed).mean(axis=1)
    rmse_s = float(np.sqrt(np.mean((m - x_np) ** 2)))
    assert np.isfinite(rmse_s)
    assert rmse_s < 1.1 * rmse_f + 1e-3, (rmse_s, rmse_f)


def test_newton_schulz_transform_matches_eigh():
    """sqrt_method='newton' (pure-matmul inverse square root — the
    MXU-native path; TPU eigh is the measured LETKF bottleneck) must match
    the eigendecomposition transform to float tolerance, globally and
    localized."""
    oracle = NumpyKalman(
        [[BETA]], [[1.0]], [[SIGMA**2]], [[OBS_STD**2]],
        transition_offsets=[ALPHA],
        initial_state_mean=[ALPHA],
        initial_state_covariance=[[SIGMA**2]],
    )
    _, y = oracle.sample(40, rng=np.random.default_rng(13))
    yj = jnp.asarray(y[:, 0], jnp.float32)

    a = pf.EnsembleTransformKalmanFilter(ar_ssm(), 64).batch_filter(
        jax.random.PRNGKey(6), yj
    )
    b = pf.EnsembleTransformKalmanFilter(
        ar_ssm(), 64, sqrt_method="newton"
    ).batch_filter(jax.random.PRNGKey(6), yj)
    np.testing.assert_allclose(
        float(b.log_likelihood), float(a.log_likelihood), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b.filter_means), np.asarray(a.filter_means), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(b.filter_variances), np.asarray(a.filter_variances),
        rtol=5e-3, atol=1e-5,
    )

    # localized: same agreement on a short d >> M run
    d, m_size = 64, 20
    ssm = _ring_ssm(d)
    _, y2 = ssm.sample_states(jax.random.PRNGKey(7), 6).get_paths()
    loc = _ring_localization(d, radius=4.0)
    r1 = pf.EnsembleTransformKalmanFilter(
        ssm, m_size, localization=loc, inflation=1.05
    ).batch_filter(jax.random.PRNGKey(8), jnp.asarray(y2, jnp.float32))
    r2 = pf.EnsembleTransformKalmanFilter(
        ssm, m_size, localization=loc, inflation=1.05, sqrt_method="newton"
    ).batch_filter(jax.random.PRNGKey(8), jnp.asarray(y2, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(r2.filter_means), np.asarray(r1.filter_means), rtol=1e-3, atol=5e-4
    )
