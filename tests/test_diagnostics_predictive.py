"""Predictive model-criticism tests: PIT uniformity under the true model,
detection of misspecification, and CRPS propriety (vs the closed-form
Gaussian CRPS from the exact Kalman predictive)."""

import jax
import numpy as np
from scipy import stats

import pyfilter_tpu as pf
from pyfilter_tpu import timeseries as ts
from pyfilter_tpu.filters import crps, predictive_pit


def ar_ssm(obs_scale=0.2):
    return ts.LinearStateSpaceModel(ts.models.AR(0.0, 0.7, 0.3), (1.0, obs_scale))


def _filtered(ssm, y, seed):
    return pf.SISR(ssm, 500, record_states=True).batch_filter(
        jax.random.PRNGKey(seed), y
    )


def test_pit_uniform_under_true_model():
    ssm = ar_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(0), 400).get_paths()
    u = np.asarray(predictive_pit(jax.random.PRNGKey(2), ssm, _filtered(ssm, y, 1), y))
    assert u.shape == (400,)
    assert ((0.0 <= u) & (u <= 1.0)).all()
    # iid Uniform(0,1): KS test must not reject at the 1% level
    assert stats.kstest(u, "uniform").pvalue > 0.01
    assert abs(u.mean() - 0.5) < 0.05
    assert abs(u.var() - 1.0 / 12.0) < 0.02


def test_pit_detects_overdispersed_model():
    """A model with inflated observation noise produces a too-wide predictive:
    the PIT concentrates around 0.5 (variance far below 1/12)."""
    true_ssm = ar_ssm(0.2)
    _, y = true_ssm.sample_states(jax.random.PRNGKey(3), 300).get_paths()
    bad = ar_ssm(0.8)
    u = np.asarray(predictive_pit(jax.random.PRNGKey(5), bad, _filtered(bad, y, 4), y))
    assert u.var() < 0.05
    assert stats.kstest(u, "uniform").pvalue < 1e-6


def test_pit_first_step_timing_with_substeps():
    """observe_every_step > 1: the FIRST observation's predictive uses ONE
    transition from t=0 (the filters' first_step timing), the rest use oes —
    the PF PIT values must match the exact Kalman predictive CDFs
    (regression for the over-diffused first-step predictive)."""
    ou = ts.LinearStateSpaceModel(
        ts.models.OrnsteinUhlenbeck(0.5, 1.0, 0.3), (1.0, 0.2), observe_every_step=2
    )
    path = ou.sample_states(jax.random.PRNGKey(11), 60)
    y = path.y
    res = pf.SISR(ou, 3000, record_states=True).batch_filter(jax.random.PRNGKey(12), y)
    u = np.asarray(predictive_pit(jax.random.PRNGKey(13), ou, res, y))

    # exact one-step-ahead predictive from the Kalman recursion
    kf = pf.KalmanFilter(ou)
    f_mat, b, q = np.asarray(kf.F), np.asarray(kf.b), np.asarray(kf.Q)
    h, d_off, r = np.asarray(kf.H), np.asarray(kf.d), np.asarray(kf.R)
    state = kf.initialize()
    exact_u = []
    for i, y_t in enumerate(np.asarray(y)):
        n = 1 if i == 0 else 2
        m, p = np.asarray(state.mean), np.asarray(state.cov)
        for _ in range(n):
            m, p = f_mat @ m + b, f_mat @ p @ f_mat.T + q
        mu = float((h @ m + d_off)[0])
        sd = float(np.sqrt((h @ p @ h.T + r)[0, 0]))
        exact_u.append(stats.norm.cdf(y_t, mu, sd))
        state = kf.filter(y_t, state, n_transitions=n)
    np.testing.assert_allclose(u, np.asarray(exact_u), atol=0.03)


def test_crps_matches_gaussian_closed_form_and_is_proper():
    """On a linear-Gaussian model the one-step predictive is the exact Kalman
    N(mu_t, s_t): the particle CRPS must match the closed form
    ``s (z(2Φ(z)-1) + 2φ(z) - 1/√π)``, and the true model must beat a
    misspecified one on average (propriety)."""
    ssm = ar_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(6), 300).get_paths()
    c = np.asarray(crps(jax.random.PRNGKey(8), ssm, _filtered(ssm, y, 7), y))
    assert c.shape == (300,) and (c > 0).all()

    # closed-form Gaussian CRPS from the exact Kalman one-step predictive
    kf = pf.KalmanFilter(ssm)
    f_mat, b, q = np.asarray(kf.F), np.asarray(kf.b), np.asarray(kf.Q)
    h, d_off, r = np.asarray(kf.H), np.asarray(kf.d), np.asarray(kf.R)
    state = kf.initialize()
    mus, sds = [], []
    for y_t in np.asarray(y):
        m, p = np.asarray(state.mean), np.asarray(state.cov)
        m_pred, p_pred = f_mat @ m + b, f_mat @ p @ f_mat.T + q
        mus.append(float((h @ m_pred + d_off)[0]))
        sds.append(float(np.sqrt((h @ p_pred @ h.T + r)[0, 0])))
        state = kf.filter(y_t, state, n_transitions=1)
    z = (np.asarray(y) - np.asarray(mus)) / np.asarray(sds)
    exact = np.asarray(sds) * (
        z * (2 * stats.norm.cdf(z) - 1) + 2 * stats.norm.pdf(z) - 1 / np.sqrt(np.pi)
    )
    # sample estimator at N=500: per-step noisy, time-average tight
    assert abs(c.mean() - exact.mean()) < 0.02, (c.mean(), exact.mean())

    bad = ar_ssm(0.8)
    cb = np.asarray(crps(jax.random.PRNGKey(10), bad, _filtered(bad, y, 9), y))
    assert c.mean() < cb.mean()
