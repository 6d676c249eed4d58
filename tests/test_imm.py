"""IMM filter tests: reduction to the single-model filter with identical
regimes, regime classification on Markov-switching volatility data,
likelihood dominance over every single-regime filter, NaN skip, and argument
validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
from pyfilter_tpu import timeseries as ts
from pyfilter_tpu.timeseries import models

OBS_STD = 0.1


def ar_ssm(sigma, beta=0.9):
    return ts.LinearStateSpaceModel(models.AR(0.0, beta, sigma), (1.0, OBS_STD))


def switching_data(seed, t_obs=300, block=75, sigmas=(0.1, 1.0), beta=0.9):
    """Markov-switching AR(1): the diffusion scale jumps between regimes every
    ``block`` steps; observation y = x + OBS_STD * noise."""
    rng = np.random.default_rng(seed)
    regime = (np.arange(t_obs) // block) % len(sigmas)
    x = np.zeros(t_obs, np.float32)
    prev = rng.normal(0.0, sigmas[0])
    for t in range(t_obs):
        prev = beta * prev + sigmas[regime[t]] * rng.normal()
        x[t] = prev
    y = x + OBS_STD * rng.normal(size=t_obs).astype(np.float32)
    return regime, x, jnp.asarray(y)


def sticky(k, stay=0.95):
    return np.full((k, k), (1.0 - stay) / (k - 1)) + np.eye(k) * (stay - (1.0 - stay) / (k - 1))


def test_imm_identical_regimes_reduce_to_single_filter():
    """With identical candidate models the mixing is a no-op and the IMM must
    reproduce the single EKF exactly (loglik and marginal moments)."""
    ssm = ar_ssm(0.4)
    _, y = ssm.sample_states(jax.random.PRNGKey(0), 50).get_paths()
    single = pf.ExtendedKalmanFilter(ssm).batch_filter(y)
    imm = pf.InteractingMultipleModel(
        [ar_ssm(0.4), ar_ssm(0.4)], sticky(2)
    ).batch_filter(y)
    np.testing.assert_allclose(
        float(imm.log_likelihood), float(single.log_likelihood), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(imm.filter_means), np.asarray(single.filter_means), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(imm.filter_variances), np.asarray(single.filter_variances),
        rtol=1e-4, atol=1e-7,
    )


@pytest.mark.parametrize("base", ["ekf", "ukf"])
def test_imm_classifies_volatility_regimes(base):
    regime, x, y = switching_data(1)
    imm = pf.InteractingMultipleModel(
        [ar_ssm(0.1), ar_ssm(1.0)], sticky(2), base=base
    )
    res = imm.batch_filter(y)
    # aux carries the per-step regime log-probabilities (T, K)
    hard = np.argmax(np.asarray(res.aux), axis=1)
    acc = float(np.mean(hard == regime))
    assert acc > 0.85, acc

    # the IMM must dominate BOTH single-regime filters in likelihood
    for s in (0.1, 1.0):
        single = pf.ExtendedKalmanFilter(ar_ssm(s)).batch_filter(y)
        assert float(res.log_likelihood) > float(single.log_likelihood), s

    # and track the state through both regimes
    rmse = float(np.sqrt(np.mean((np.asarray(res.filter_means)[:, 0] - x) ** 2)))
    assert rmse < 3.0 * OBS_STD, rmse


def test_imm_mixing_revives_dormant_regimes():
    """After 100 quiet steps the high-vol regime's prior must remain sane
    (mixing pulls it toward the active regime) — its per-regime covariance
    stays bounded instead of diverging."""
    regime, _, y = switching_data(2, t_obs=200, block=100)
    imm = pf.InteractingMultipleModel([ar_ssm(0.1), ar_ssm(1.0)], sticky(2))
    res = imm.batch_filter(y)
    last = res.latest_state
    assert np.all(np.isfinite(np.asarray(last.covs)))
    assert float(np.max(np.asarray(last.covs))) < 10.0


def test_imm_nan_skip_keeps_markov_prediction():
    _, _, y = switching_data(3, t_obs=60, block=30)
    y = np.asarray(y).copy()
    y[20:24] = np.nan
    res = pf.InteractingMultipleModel(
        [ar_ssm(0.1), ar_ssm(1.0)], sticky(2)
    ).batch_filter(jnp.asarray(y))
    assert np.isfinite(float(res.log_likelihood))
    assert np.asarray(res.step_log_likelihoods)[20:24].sum() == 0.0
    # regime probabilities stay normalized through the gap
    lp = np.asarray(res.aux)[20:24]
    np.testing.assert_allclose(np.exp(lp).sum(axis=1), 1.0, rtol=1e-5)


def test_imm_validates_arguments():
    with pytest.raises(ValueError):
        pf.InteractingMultipleModel([ar_ssm(0.1)], np.eye(1))
    with pytest.raises(ValueError):
        pf.InteractingMultipleModel([ar_ssm(0.1), ar_ssm(1.0)], np.ones((2, 2)))
    with pytest.raises(ValueError):
        pf.InteractingMultipleModel([ar_ssm(0.1), ar_ssm(1.0)], np.eye(3))
    # structurally different candidates are rejected
    other = ts.LinearStateSpaceModel(models.RandomWalk(0.3), (1.0, OBS_STD))
    with pytest.raises(ValueError):
        pf.InteractingMultipleModel([ar_ssm(0.1), other], sticky(2))


def test_imm_lane_batching_matches_per_lane_loop():
    """batch_shape=(K,): lane-batched candidate leaves (different low-vol
    sigma per lane) must reproduce independent single-lane IMM runs."""
    sig_lanes = np.asarray([0.05, 0.1, 0.2], np.float32)
    _, _, y = switching_data(5, t_obs=80, block=40)

    laned = pf.InteractingMultipleModel(
        [ar_ssm(jnp.asarray(sig_lanes)), ar_ssm(1.0)], sticky(2), batch_shape=(3,)
    ).batch_filter(y)
    assert laned.log_likelihood.shape == (3,)
    assert laned.aux.shape == (80, 3, 2)

    for i, s in enumerate(sig_lanes):
        single = pf.InteractingMultipleModel(
            [ar_ssm(float(s)), ar_ssm(1.0)], sticky(2)
        ).batch_filter(y)
        np.testing.assert_allclose(
            float(laned.log_likelihood[i]), float(single.log_likelihood), rtol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(laned.aux)[:, i], np.asarray(single.aux), rtol=1e-3, atol=1e-4
        )


def test_imm_markov_switching_spec_and_traced_transition():
    """The MarkovSwitchingModel spec constructs the same filter, and a TRACED
    transition matrix (softmax of logits, as a learned parameter would be)
    filters under jit without host validation."""
    _, _, y = switching_data(6, t_obs=60, block=30)
    spec = pf.MarkovSwitchingModel(
        (ar_ssm(0.1), ar_ssm(1.0)), jnp.asarray(sticky(2), jnp.float32)
    )
    a = pf.InteractingMultipleModel(spec).batch_filter(y)
    b = pf.InteractingMultipleModel([ar_ssm(0.1), ar_ssm(1.0)], sticky(2)).batch_filter(y)
    np.testing.assert_allclose(float(a.log_likelihood), float(b.log_likelihood), rtol=1e-6)

    @jax.jit
    def ll_of_logit(logit):
        p = jax.nn.sigmoid(logit)
        trans = jnp.stack([jnp.stack([p, 1 - p]), jnp.stack([1 - p, p])])
        m = pf.MarkovSwitchingModel((ar_ssm(0.1), ar_ssm(1.0)), trans)
        return pf.InteractingMultipleModel(m).batch_filter(y).log_likelihood

    lls = [float(ll_of_logit(jnp.asarray(v))) for v in (0.0, 2.0, 3.7)]
    assert np.isfinite(lls).all()
    # stickier transitions fit block-switching data better
    assert lls[2] > lls[0]


def test_imm_smoother_identical_regimes_reduce_to_rts():
    """With identical candidates the Kim smoother must reproduce the
    single-model extended RTS smoother exactly (mixing, pair prediction and
    collapse are all no-ops)."""
    ssm = ar_ssm(0.4)
    _, y = ssm.sample_states(jax.random.PRNGKey(10), 40).get_paths()
    me, pe = pf.ExtendedKalmanFilter(ssm).smooth(y)
    imm = pf.InteractingMultipleModel([ar_ssm(0.4), ar_ssm(0.4)], sticky(2))
    mean, var, lp_s, _ = imm.smooth(y)
    np.testing.assert_allclose(np.asarray(mean)[:, 0], np.asarray(me)[:, 0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(var)[:, 0],
        np.diagonal(np.asarray(pe), axis1=-2, axis2=-1)[:, 0],
        rtol=1e-3, atol=1e-6,
    )


def test_imm_smoother_sharpens_regime_classification():
    """On block-switching volatility data the smoothed regime probabilities
    must classify at least as well as the filtered ones (hindsight resolves
    the lag right after each switch), and smoothed state estimates must not
    be worse than filtered ones."""
    regime, x, y = switching_data(7)
    imm = pf.InteractingMultipleModel([ar_ssm(0.1), ar_ssm(1.0)], sticky(2))
    res = imm.batch_filter(y)
    mean, var, lp_s, _ = imm.smooth(y)

    acc_f = float(np.mean(np.argmax(np.asarray(res.aux), axis=1) == regime))
    acc_s = float(np.mean(np.argmax(np.asarray(lp_s), axis=1) == regime))
    assert acc_s >= acc_f - 0.01, (acc_s, acc_f)
    assert acc_s > 0.85, acc_s

    rmse_f = float(np.sqrt(np.mean((np.asarray(res.filter_means)[:, 0] - x) ** 2)))
    rmse_s = float(np.sqrt(np.mean((np.asarray(mean)[:, 0] - x) ** 2)))
    assert rmse_s <= rmse_f + 1e-3, (rmse_s, rmse_f)
    # smoothed regime probs stay normalized
    np.testing.assert_allclose(np.exp(np.asarray(lp_s)).sum(axis=1), 1.0, rtol=1e-4)
