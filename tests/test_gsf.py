"""Gaussian-sum filter tests: moment-matched initialization, single-component
reduction to the base EKF, near-exact agreement with the Kalman filter on
linear models, multimodal tracking under a sign-ambiguous quadratic
observation (where the single-Gaussian EKF is stuck), and NaN skip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
from pyfilter_tpu import timeseries as ts, distributions as dist
from pyfilter_tpu.timeseries import models


def linear_ssm(beta=0.7):
    return ts.LinearStateSpaceModel(models.AR(0.2, beta, 0.4), (1.0, 0.25))


def quadratic_ssm():
    """Random walk observed through y = x^2 + noise: the sign of x is not
    identifiable from any single observation, so the exact posterior is
    bimodal (+/-|x|) — the canonical Gaussian-sum showcase. The hidden prior
    N(0, 2) straddles both modes; EKF linearized at the prior mean 0 has
    H = 2x = 0, i.e. zero gain forever."""
    rw = ts.AffineProcess(
        lambda x, s: (x.value, s),
        (0.05,),
        dist.Normal(0.0, 1.0),
        lambda s: dist.Normal(0.0, jnp.sqrt(2.0)),
    )

    def obs(x, scale):
        return dist.Normal(x.value**2, scale)

    return ts.StateSpaceModel(rw, obs, (0.2,))


def test_gsf_initialize_moment_matches_the_prior():
    """Mixture mean/covariance of the split initialization must equal the
    prior's (m0, P0) exactly, for any K and spread."""
    llt = models.LocalLinearTrend(0.3, 0.1)
    ssm = ts.LinearStateSpaceModel(llt, (jnp.eye(2)[0], jnp.asarray([0.15])), event_shape=(1,))
    for k in (1, 2, 5):
        gsf = pf.GaussianSumFilter(ssm, n_components=k, spread=0.6 if k > 1 else 0.0)
        st = gsf.initialize()
        m0, p0 = gsf.base.initialize()[:2]
        w = np.exp(np.asarray(st.log_weights))
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
        mix_mean = w @ np.asarray(st.means)
        diff = np.asarray(st.means) - mix_mean
        mix_cov = np.einsum("k,kij->ij", w, np.asarray(st.covs)) + np.einsum(
            "k,ki,kj->ij", w, diff, diff
        )
        np.testing.assert_allclose(mix_mean, np.asarray(m0), atol=1e-6)
        np.testing.assert_allclose(mix_cov, np.asarray(p0), atol=1e-6)
        # every component covariance must stay positive definite
        assert np.all(np.linalg.eigvalsh(np.asarray(st.covs)) > 0)


def test_gsf_single_component_is_the_base_filter():
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(0), 40).get_paths()
    ekf = pf.ExtendedKalmanFilter(ssm).batch_filter(y)
    gsf = pf.GaussianSumFilter(ssm, n_components=1, spread=0.0).batch_filter(y)
    np.testing.assert_allclose(
        float(gsf.log_likelihood), float(ekf.log_likelihood), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gsf.filter_means), np.asarray(ekf.filter_means), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gsf.filter_variances), np.asarray(ekf.filter_variances),
        rtol=1e-5, atol=1e-7,
    )


@pytest.mark.parametrize("base", ["ekf", "ukf"])
def test_gsf_agrees_with_kalman_on_linear_model(base):
    """Through linear maps each component stays exactly Gaussian and the
    mixture moment-matches the true posterior; after a few steps the
    components merge in effect and the loglik/means track the exact filter."""
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(1), 60).get_paths()
    exact = pf.KalmanFilter(ssm).batch_filter(y)
    gsf = pf.GaussianSumFilter(ssm, n_components=4, base=base, spread=0.5).batch_filter(y)
    np.testing.assert_allclose(
        float(gsf.log_likelihood), float(exact.log_likelihood), rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(gsf.filter_means), np.asarray(exact.filter_means), atol=0.05
    )


def test_gsf_holds_both_modes_of_a_quadratic_observation():
    ssm = quadratic_ssm()
    key = jax.random.PRNGKey(2)
    x, y = ssm.sample_states(key, 120).get_paths()
    x = np.asarray(x)

    gsf_filt = pf.GaussianSumFilter(ssm, n_components=6, spread=0.8)
    gsf = gsf_filt.batch_filter(y)
    ekf = pf.ExtendedKalmanFilter(ssm).batch_filter(y)

    # the mixture likelihood must beat the single-Gaussian one decisively
    assert float(gsf.log_likelihood) > float(ekf.log_likelihood) + 10.0

    # the dominant component must track one of the two modes (+|x| or -|x|)
    m_map, _ = gsf.latest_state.map_component()
    err = min(abs(float(m_map[0]) - x[-1]), abs(float(m_map[0]) + x[-1]))
    assert err < 0.5, (float(m_map[0]), x[-1])

    # and the mixture variance must recognize the bimodality: larger than any
    # single component's
    v_mix = float(gsf.latest_state.get_variance()[0])
    v_comp = float(np.max(np.diagonal(np.asarray(gsf.latest_state.covs), axis1=-2, axis2=-1)))
    lw = np.asarray(gsf.latest_state.log_weights)
    if np.exp(lw).max() < 0.95:  # both modes still alive
        assert v_mix > v_comp


def test_gsf_nan_skip_leaves_weights_untouched():
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(3), 30).get_paths()
    y = np.asarray(y).copy()
    y[10:14] = np.nan
    gsf = pf.GaussianSumFilter(ssm, n_components=3, spread=0.5)
    res = gsf.batch_filter(jnp.asarray(y))
    assert np.isfinite(float(res.log_likelihood))
    assert np.asarray(res.step_log_likelihoods)[10:14].sum() == 0.0
    # against the exact filter on the same gappy data
    exact = pf.KalmanFilter(ssm).batch_filter(jnp.asarray(y))
    np.testing.assert_allclose(
        float(res.log_likelihood), float(exact.log_likelihood), rtol=5e-3
    )


def test_gsf_validates_arguments():
    ssm = linear_ssm()
    with pytest.raises(ValueError):
        pf.GaussianSumFilter(ssm, n_components=0)
    with pytest.raises(ValueError):
        pf.GaussianSumFilter(ssm, spread=1.0)
    with pytest.raises(ValueError):
        pf.GaussianSumFilter(ssm, base="enkf")


def test_gsf_dead_component_cannot_poison_the_bank():
    """A component whose covariance lost positive-definiteness produces a NaN
    innovation likelihood; the bank must demote it to -inf weight instead of
    letting the NaN propagate through the logsumexp to every weight."""
    ssm = linear_ssm()
    gsf = pf.GaussianSumFilter(ssm, n_components=3, spread=0.5)
    st = gsf.initialize()
    bad_covs = st.covs.at[0].set(-jnp.eye(st.covs.shape[-1]))  # negative definite
    st = st._replace(covs=bad_covs)
    new = gsf.filter(jnp.asarray(0.3), st)
    lw = np.asarray(new.log_weights)
    assert np.isneginf(lw[0])  # the dead component is demoted, not NaN
    assert np.all(np.isfinite(lw[1:]))
    np.testing.assert_allclose(np.exp(lw).sum(), 1.0, rtol=1e-5)
    assert np.isfinite(float(new.log_likelihood))
    # the surviving components keep filtering
    assert np.all(np.isfinite(np.asarray(new.means)[1:]))


def test_gsf_all_components_dead_keeps_previous_weights():
    ssm = linear_ssm()
    gsf = pf.GaussianSumFilter(ssm, n_components=2, spread=0.5)
    st = gsf.initialize()
    st = st._replace(covs=-jnp.broadcast_to(jnp.eye(st.covs.shape[-1]), st.covs.shape))
    new = gsf.filter(jnp.asarray(0.3), st)
    np.testing.assert_allclose(
        np.asarray(new.log_weights), np.asarray(st.log_weights), atol=1e-6
    )
    assert np.isneginf(float(new.log_likelihood))  # faithfully reported


def test_gsf_lane_batching_matches_per_lane_loop():
    """batch_shape=(K,): one vmapped bank per lane-batched model leaf must
    reproduce K independent single-lane runs exactly."""
    betas = np.asarray([0.5, 0.7, 0.9], np.float32)
    _, y = linear_ssm().sample_states(jax.random.PRNGKey(7), 40).get_paths()

    laned_model = ts.LinearStateSpaceModel(
        models.AR(0.2, jnp.asarray(betas), 0.4), (1.0, 0.25)
    )
    laned = pf.GaussianSumFilter(
        laned_model, n_components=3, spread=0.5, batch_shape=(3,)
    ).batch_filter(y)
    assert laned.log_likelihood.shape == (3,)
    assert laned.filter_means.shape[:2] == (40, 3)

    for i, b in enumerate(betas):
        single = pf.GaussianSumFilter(
            linear_ssm(float(b)), n_components=3, spread=0.5
        ).batch_filter(y)
        np.testing.assert_allclose(
            float(laned.log_likelihood[i]), float(single.log_likelihood), rtol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(laned.filter_means)[:, i],
            np.asarray(single.filter_means), rtol=2e-4, atol=1e-5,
        )

    # lane surgery on the vmapped states
    last = laned.latest_state
    perm = last.resample(jnp.asarray([2, 0, 1]))
    np.testing.assert_allclose(
        np.asarray(perm.log_likelihood),
        np.asarray(last.log_likelihood)[[2, 0, 1]],
    )
    both = type(last).lane_concat([last, perm])
    assert both.means.shape[0] == 6


def test_gsf_ckf_base():
    """base='ckf' rides the same Gaussian-step protocol; on a linear model
    every base agrees with the exact Kalman likelihood."""
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(8), 40).get_paths()
    exact = pf.KalmanFilter(ssm).batch_filter(y)
    for base in ("ekf", "ukf", "ckf"):
        res = pf.GaussianSumFilter(ssm, n_components=3, base=base).batch_filter(y)
        np.testing.assert_allclose(
            float(res.log_likelihood), float(exact.log_likelihood), rtol=1e-3
        )


def test_gsf_smoother_reduces_and_tracks():
    """K=1 reduces exactly to the base RTS smoother; K=3 with a moment-matched
    split prior lands on the same smoothing marginals up to the (weak) prior
    mismatch; smoothed means beat filtered means against the exact smoother."""
    ssm = linear_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(9), 40).get_paths()
    me, pe = pf.ExtendedKalmanFilter(ssm).smooth(y)

    m1, v1, comps1 = pf.GaussianSumFilter(ssm, n_components=1, spread=0.0).smooth(y)
    np.testing.assert_allclose(np.asarray(m1)[:, 0], np.asarray(me)[:, 0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(v1)[:, 0], np.diagonal(np.asarray(pe), axis1=-2, axis2=-1)[:, 0],
        rtol=1e-4, atol=1e-7,
    )

    gsf = pf.GaussianSumFilter(ssm, n_components=3, spread=0.5)
    m3, v3, comps = gsf.smooth(y)
    np.testing.assert_allclose(np.asarray(m3)[:, 0], np.asarray(me)[:, 0], atol=0.05)
    # the component weights are the FINAL filtered weights
    np.testing.assert_allclose(
        np.asarray(comps[2]),
        np.asarray(gsf.batch_filter(y).latest_state.log_weights),
        atol=1e-6,
    )
    # smoothing beats filtering against the exact smoothed means
    res = gsf.batch_filter(y)
    err_f = np.abs(np.asarray(res.filter_means)[:, 0] - np.asarray(me)[:, 0]).mean()
    err_s = np.abs(np.asarray(m3)[:, 0] - np.asarray(me)[:, 0]).mean()
    assert err_s < err_f, (err_s, err_f)
