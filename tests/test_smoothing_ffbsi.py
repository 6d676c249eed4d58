"""O(N) smoothing: rejection-sampling FFBSi and PaRIS online smoothing.

Law-equivalence against the exact FFBS and the float64 RTS oracle
(tests/kalman.py) on a linear-Gaussian AR model where the smoothing marginals
are available in closed form. Covers: the auto-derived transition-density
bound, the capped-rejection + exact-streaming-fallback combination (the
fallback path is forced with max_rounds=0), lane batching, sub-stepped
(observe_every_step > 1) histories, and PaRIS additive functionals.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
from pyfilter_tpu import distributions as dist, timeseries as ts
from pyfilter_tpu.filters.particle import paris, transition_log_sup
from pyfilter_tpu.timeseries import models

from kalman import KalmanFilter as NumpyKalman

ALPHA, BETA, SIGMA, OBS_STD = 0.2, 0.7, 0.4, 0.25


def ar_ssm():
    return ts.LinearStateSpaceModel(models.AR(ALPHA, BETA, SIGMA), (1.0, OBS_STD))


@pytest.fixture(scope="module")
def data_and_oracle():
    oracle = NumpyKalman(
        [[BETA]],
        [[1.0]],
        [[SIGMA**2]],
        [[OBS_STD**2]],
        transition_offsets=[ALPHA],
        initial_state_mean=[ALPHA],
        initial_state_covariance=[[SIGMA**2]],
    )
    _, y = oracle.sample(70, rng=np.random.default_rng(11))
    sm, sP = oracle.smooth(y)
    return jnp.asarray(y[:, 0], jnp.float32), sm[:, 0], sP[:, 0, 0]


def test_transition_log_sup_values():
    """AR: sup log p = -log(sigma) - 0.5 log 2pi. MVN increments: use the
    full covariance determinant. Heteroscedastic models refuse with a
    pointer to log_density_sup."""
    val = float(transition_log_sup(ar_ssm()))
    expect = -np.log(SIGMA) - 0.5 * np.log(2 * np.pi)
    np.testing.assert_allclose(val, expect, rtol=1e-5)

    q = np.array([[0.3, 0.18], [0.18, 0.25]])
    lq = jnp.asarray(np.linalg.cholesky(q), jnp.float32)
    hidden = ts.AffineProcess(
        lambda x, a: (a * x.value, 1.0),
        (jnp.asarray(0.9),),
        dist.MultivariateNormal(jnp.zeros(2), scale_tril=lq),
        lambda a: dist.MultivariateNormal(jnp.zeros(2), scale_tril=lq),
    )
    mvn_ssm = ts.LinearStateSpaceModel(hidden, (1.0, 0.1), event_shape=(2,))
    expect_mvn = -np.log(2 * np.pi) - 0.5 * np.linalg.slogdet(q)[1]
    np.testing.assert_allclose(float(transition_log_sup(mvn_ssm)), expect_mvn, rtol=1e-5)

    # state-dependent diffusion (Verhulst-style scale prop. to x) must refuse
    hetero = ts.AffineProcess(
        lambda x, s: (x.value, s * (1.0 + jnp.abs(x.value))),
        (jnp.asarray(0.3),),
        dist.Normal(0.0, 1.0),
        lambda s: dist.Normal(0.0, 1.0),
    )
    with pytest.raises(ValueError, match="log_density_sup"):
        transition_log_sup(ts.LinearStateSpaceModel(hetero, (1.0, 0.1)))


def _smoothed_moments(traj):
    """(T, N, ...) trajectories -> per-step mean/std over the trajectory axis."""
    arr = np.asarray(traj)
    return arr.mean(axis=1), arr.std(axis=1)


def test_ffbsi_matches_exact_ffbs_and_rts_oracle(data_and_oracle):
    """Rejection FFBSi samples the same law as exact FFBS: both must hit the
    RTS oracle's smoothing marginals within MC error at N=2000."""
    y, sm_mean, sm_var = data_and_oracle
    filt = pf.SISR(ar_ssm(), 2000, record_states=True)
    res = filt.batch_filter(jax.random.PRNGKey(0), y)

    exact = filt.smooth(jax.random.PRNGKey(1), res, method="ffbs")
    rej = filt.smooth(jax.random.PRNGKey(1), res, method="ffbsi")

    mc_tol = 4.5 * np.sqrt(sm_var / 2000).max() + 0.02
    m_exact, _ = _smoothed_moments(exact)
    m_rej, s_rej = _smoothed_moments(rej)
    # drop the t=0 prior state: the oracle's smoother starts at the first obs
    np.testing.assert_allclose(m_exact[1:], sm_mean, atol=mc_tol)
    np.testing.assert_allclose(m_rej[1:], sm_mean, atol=mc_tol)
    np.testing.assert_allclose(
        s_rej[1:] ** 2, sm_var, rtol=0.5, atol=0.01
    )  # marginal variances in the right regime


def test_ffbsi_forced_fallback_is_exact(data_and_oracle):
    """max_rounds=0 forces every draw through the streaming Gumbel-max
    fallback — the law must still match the RTS oracle (and an odd block size
    exercises the padding path)."""
    y, sm_mean, sm_var = data_and_oracle
    filt = pf.SISR(ar_ssm(), 1500, record_states=True)
    res = filt.batch_filter(jax.random.PRNGKey(2), y)
    sm = filt.smooth(jax.random.PRNGKey(3), res, method="ffbsi", max_rounds=0, block=37)
    m, _ = _smoothed_moments(sm)
    mc_tol = 4.5 * np.sqrt(sm_var / 1500).max() + 0.025
    np.testing.assert_allclose(m[1:], sm_mean, atol=mc_tol)


def test_ffbsi_with_lanes(data_and_oracle):
    """Lane-batched history: every lane smooths to the oracle marginals."""
    y, sm_mean, _ = data_and_oracle
    filt = pf.SISR(ar_ssm(), 1000, record_states=True, batch_shape=(3,))
    res = filt.batch_filter(jax.random.PRNGKey(4), y)
    sm = filt.smooth(jax.random.PRNGKey(5), res, method="ffbsi")
    assert sm.shape == (y.shape[0] + 1, 1000, 3)
    m = np.asarray(sm).mean(axis=1)  # (T+1, 3)
    for lane in range(3):
        np.testing.assert_allclose(m[1:, lane], sm_mean, atol=0.12)


def test_ffbsi_substepped_history():
    """observe_every_step > 1 with record_intermediary: the recorded chain has
    one transition per sub-step, so FFBSi applies unchanged. Cross-check the
    exact FFBS on the same history."""
    hidden = models.AR(0.0, 0.9, 0.3)
    ssm = ts.LinearStateSpaceModel(hidden, (1.0, 0.2), observe_every_step=3)
    key = jax.random.PRNGKey(6)
    path = ssm.sample_states(key, 60)
    y = path.get_paths()[1][2::3]  # observed every 3rd step
    filt = pf.SISR(ssm, 800, record_states=True, record_intermediary=True)
    res = filt.batch_filter(jax.random.PRNGKey(7), y)
    exact = filt.smooth(jax.random.PRNGKey(8), res, method="ffbs")
    rej = filt.smooth(jax.random.PRNGKey(8), res, method="ffbsi")
    assert rej.shape == exact.shape
    m_e, _ = _smoothed_moments(exact)
    m_r, _ = _smoothed_moments(rej)
    np.testing.assert_allclose(m_r, m_e, atol=0.12)


def test_smooth_m_trajectories(data_and_oracle):
    """n_trajectories=M != N: both smoothers return (T, M) and still hit the
    RTS oracle marginals — the realistic configuration at large N, where the
    per-step cost scales with M, not N."""
    y, sm_mean, sm_var = data_and_oracle
    filt = pf.SISR(ar_ssm(), 2000, record_states=True)
    res = filt.batch_filter(jax.random.PRNGKey(20), y)
    for method in ("ffbs", "ffbsi"):
        sm = filt.smooth(jax.random.PRNGKey(21), res, method=method, n_trajectories=300)
        assert sm.shape == (y.shape[0] + 1, 300)
        m, _ = _smoothed_moments(sm)
        mc_tol = 4.5 * np.sqrt(sm_var / 300).max() + 0.03
        np.testing.assert_allclose(m[1:], sm_mean, atol=mc_tol)

    # lane-batched histories refuse (systematic_m is 1-D only)
    laned = pf.SISR(ar_ssm(), 200, record_states=True, batch_shape=(2,))
    res_l = laned.batch_filter(jax.random.PRNGKey(22), y)
    for method in ("ffbs", "ffbsi"):
        with pytest.raises(ValueError, match="laneless"):
            laned.smooth(jax.random.PRNGKey(23), res_l, method=method, n_trajectories=50)


def test_paris_matches_rts_cumulative_mean(data_and_oracle):
    """PaRIS online additive functional S = sum_t x_t must match the sum of
    the RTS smoothed means (no recorded history anywhere)."""
    y, sm_mean, sm_var = data_and_oracle
    filt = pf.SISR(ar_ssm(), 3000)
    est, stats, res = paris(
        filt, jax.random.PRNGKey(9), y, lambda xp, xc, t: xc, n_tilde=2
    )
    assert stats.shape == (3000,)
    target = sm_mean.sum()
    # MC error of a smoothed SUM grows with T; bound via the oracle variances
    tol = 5.0 * np.sqrt(sm_var.sum() / 3000) + 0.05 * abs(target)
    assert abs(float(est) - target) < max(tol, 0.6), (float(est), target)
    assert np.isfinite(float(res.log_likelihood))


def test_paris_substepped_matches_ffbsi_law():
    """observe_every_step > 1: PaRIS runs its backward update at SUB-STEP
    granularity (each propagation is one closed-form transition, the PGAS
    pinning trick). The online estimate of the sum of OBSERVATION-time states
    must match the same functional computed offline from FFBSi trajectories
    over a recorded-intermediary history."""
    ssm = ts.LinearStateSpaceModel(
        models.AR(0.0, 0.9, 0.3), (1.0, 0.2), observe_every_step=3
    )
    y = ssm.sample_states(jax.random.PRNGKey(6), 60).get_paths()[1][2::3]

    # observation times are t = 1, 4, 7, ... (first correction after ONE
    # transition, then oes per observation) — gate the functional on them
    h = lambda xp, xc, t: jnp.where(jnp.mod(t, 3.0) == 1.0, xc, jnp.zeros_like(xc))
    est, stats, res = paris(pf.SISR(ssm, 2000), jax.random.PRNGKey(7), y, h, n_tilde=2)
    assert np.isfinite(float(est))
    assert np.isfinite(float(res.log_likelihood))

    # offline law oracle: FFBSi over the recorded sub-step history
    filt_r = pf.SISR(ssm, 2000, record_states=True, record_intermediary=True)
    res_r = filt_r.batch_filter(jax.random.PRNGKey(8), y)
    traj = filt_r.smooth(jax.random.PRNGKey(9), res_r, method="ffbsi")
    m = np.asarray(traj).mean(axis=1)  # history rows: [x0, t=1, t=2, ...]
    target = m[1 + 3 * np.arange(len(y))].sum()
    assert abs(float(est) - target) < 0.6, (float(est), target)


@pytest.mark.slow
def test_paris_on_flagship_stochvol():
    """The oes=5 stochastic-volatility flagship (Verhulst vol: state-DEPENDENT
    diffusion, so the bound must come from the caller) smooths online: the
    PaRIS estimate of the summed observation-time volatility matches the
    offline FFBSi functional, and the bound guard stays quiet under the
    supplied bound."""
    from pyfilter_tpu.examples import stochastic_volatility_model

    model = stochastic_volatility_model(dt=0.2)  # observe_every_step = 5
    _, y_all = model.sample_states(jax.random.PRNGKey(40), 30 * 5).get_paths()
    y = y_all[4::5]

    # practical density bound: scale = sigma * x * sqrt(dt); the Verhulst
    # state stays near gamma=1 — bound via a conservative x_min
    x_min = 0.05
    log_sup = float(-np.log(0.05 * x_min * np.sqrt(0.2)) - 0.5 * np.log(2 * np.pi))

    h = lambda xp, xc, t: jnp.where(jnp.mod(t, 5.0) == 1.0, xc, jnp.zeros_like(xc))
    est, _, res = paris(
        pf.SISR(model, 1000), jax.random.PRNGKey(41), y, h,
        n_tilde=2, log_density_sup=log_sup,
    )
    assert np.isfinite(float(est)), "bound guard fired (or divergence)"
    assert np.isfinite(float(res.log_likelihood))

    filt_r = pf.SISR(model, 1000, record_states=True, record_intermediary=True)
    res_r = filt_r.batch_filter(jax.random.PRNGKey(42), y)
    traj = filt_r.smooth(
        jax.random.PRNGKey(43), res_r, method="ffbsi", log_density_sup=log_sup
    )
    m = np.asarray(traj).mean(axis=1)
    target = m[1 + 5 * np.arange(len(y))].sum()
    assert abs(float(est) - target) < 0.15 * abs(target) + 0.5, (float(est), target)


def test_vi_factor_rides_ffbsi(data_and_oracle):
    """smoothed_log_likelihood(smoothing="ffbsi") produces the same factor as
    the exact-FFBS bridge within MC error, and jax.grad flows through it
    (inside jit the transition-scale probe can't run — the explicit
    log_density_sup kwarg covers that path)."""
    y, _, _ = data_and_oracle
    filt = pf.SISR(ar_ssm(), 400)
    k = jax.random.PRNGKey(10)
    exact = float(filt.smoothed_log_likelihood(k, y))
    rej = float(filt.smoothed_log_likelihood(k, y, smoothing="ffbsi"))
    assert abs(rej - exact) < 0.05 * abs(exact) + 3.0, (rej, exact)

    log_sup = float(transition_log_sup(ar_ssm()))

    def factor(beta):
        ssm = ts.LinearStateSpaceModel(models.AR(ALPHA, beta, SIGMA), (1.0, OBS_STD))
        return pf.SISR(ssm, 200).smoothed_log_likelihood(
            jax.random.PRNGKey(11), y, smoothing="ffbsi", log_density_sup=log_sup
        )

    g_low = float(jax.grad(factor)(jnp.asarray(0.3)))
    g_high = float(jax.grad(factor)(jnp.asarray(0.95)))
    assert g_low > 0.0 > g_high, (g_low, g_high)  # points toward the truth


def test_ffbsi_bound_violation_is_loud():
    """A state-dependent scale engineered to agree with the homoscedastic
    probes of transition_log_sup at its probe states (0.0, 0.7, -1.3) slips
    past the check and yields a bound that is NOT an upper bound on the
    transition density. The smoother must poison its output with NaN instead
    of silently truncating acceptance probabilities above 1 (a biased law
    with no runtime signal)."""

    def mean_scale(x, b):
        v = x.value
        poly = v * (v - 0.7) * (v + 1.3)
        # == SIGMA at every probe state, down to 0.4 * SIGMA in between
        return b * v, SIGMA * (1.0 - 0.6 * jnp.tanh(poly * poly))

    hidden = ts.AffineProcess(
        mean_scale, (jnp.asarray(BETA),), dist.Normal(0.0, SIGMA),
        lambda b: dist.Normal(0.0, 1.0),
    )
    ssm = ts.LinearStateSpaceModel(hidden, (1.0, OBS_STD))

    log_sup = transition_log_sup(ssm)  # the WRONG bound, derived silently
    _, y = ssm.sample_states(jax.random.PRNGKey(30), 50).get_paths()
    filt = pf.SISR(ssm, 1000, record_states=True)
    res = filt.batch_filter(jax.random.PRNGKey(31), y)

    sm = filt.smooth(jax.random.PRNGKey(32), res, method="ffbsi")
    assert np.isnan(np.asarray(sm)).all()  # poisoned, not silently biased

    # the escape hatch accepts the bias explicitly
    sm_biased = filt.smooth(
        jax.random.PRNGKey(32), res, method="ffbsi", check_bound=False
    )
    assert np.isfinite(np.asarray(sm_biased)).all()

    # a CORRECT explicit bound (density sup under the true minimum scale)
    # smooths fine through the same call
    good = float(log_sup) + float(np.log(1.0 / 0.4)) + 0.05
    sm_good = filt.smooth(
        jax.random.PRNGKey(32), res, method="ffbsi", log_density_sup=good
    )
    assert np.isfinite(np.asarray(sm_good)).all()


def test_ffbsi_rbg_key(data_and_oracle):
    """An rbg-implementation key (the measured-faster PRNG for this
    RNG-bound pass — PERF.md) produces the same smoothing law."""
    y, sm_mean, sm_var = data_and_oracle
    filt = pf.SISR(ar_ssm(), 1500, record_states=True)
    res = filt.batch_filter(jax.random.PRNGKey(50), y)
    sm = filt.smooth(jax.random.key(51, impl="rbg"), res, method="ffbsi")
    m = np.asarray(sm).mean(axis=1)
    mc_tol = 4.5 * np.sqrt(sm_var / 1500).max() + 0.025
    np.testing.assert_allclose(m[1:], sm_mean, atol=mc_tol)
