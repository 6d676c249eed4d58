"""Online score estimation (Poyiadjis et al. 2011 via PaRIS) and streaming MLE.

Oracle: the score of a linear-Gaussian model is the exact gradient of the
Kalman log-likelihood — jax.grad through the EKF (exact on linear models)
gives it to float precision, generalizing tests/test_differentiable.py's
harness to the O(1)-memory online estimator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
from pyfilter_tpu import distributions as dist, inference as inf, timeseries as ts
from pyfilter_tpu.inference.score import fit_mle_streaming, online_score
from pyfilter_tpu.timeseries import models

ALPHA, BETA, SIGMA, OBS_STD = 0.2, 0.7, 0.4, 0.25


def make_data(n, seed=0):
    ssm = ts.LinearStateSpaceModel(models.AR(ALPHA, BETA, SIGMA), (1.0, OBS_STD))
    return ssm.sample_states(jax.random.PRNGKey(seed), n).get_paths()[1]


def build(ctx):
    beta = ctx.named_parameter("beta", dist.Normal(0.0, 2.0))
    sigma = ctx.named_parameter("sigma", dist.LogNormal(-1.0, 1.0))
    return ts.LinearStateSpaceModel(models.AR(ALPHA, beta, sigma), (1.0, OBS_STD))


def test_online_score_matches_kalman_oracle():
    """The PaRIS score at a parameter point must match the exact Kalman
    score (gradient of the EKF log-likelihood, exact on linear models)
    within MC error — with NO recorded history anywhere."""
    y = make_data(150)
    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
        ctx.set_batch_shape(())
        build(ctx)
        ctx.update_parameter("beta", jnp.asarray(0.5))
        ctx.update_parameter("sigma", jnp.asarray(0.5))
        res = online_score(
            build, y, lambda b: pf.SISR(b, 2000), jax.random.PRNGKey(2), context=ctx
        )
        theta0 = ctx.stack_parameters(constrained=False)

        def kalman_ll(th):
            ctx2 = ctx.unstack_parameters(th, constrained=False)
            with ctx2.no_prior_verification():
                m = build(ctx2)
            return pf.ExtendedKalmanFilter(m).batch_filter(y).log_likelihood

        oracle = np.asarray(jax.grad(kalman_ll)(theta0)[0])

    score = np.asarray(res.score)
    assert score.shape == oracle.shape
    # relative MC tolerance: the score components here are O(10-100)
    np.testing.assert_allclose(score, oracle, rtol=0.18, atol=2.5)
    assert np.isfinite(float(res.log_likelihood))
    by_name = res.by_parameter()
    assert set(by_name) == {"beta", "sigma"}


def test_streaming_mle_recovers_short():
    """Fast end-to-end: T=2000, one Adam step per 25-observation window,
    carrying only the particle cloud — both parameters move decisively
    toward the truth from a deliberately wrong start."""
    y = make_data(2000, seed=5)
    with inf.make_context(key=jax.random.PRNGKey(6)) as ctx:
        ctx.set_batch_shape(())
        build(ctx)
        ctx.update_parameter("beta", jnp.asarray(0.2))
        ctx.update_parameter("sigma", jnp.asarray(0.8))
        res = fit_mle_streaming(
            build, y, lambda b: pf.SISR(b, 500), jax.random.PRNGKey(7),
            window=25, learning_rate=3e-2, context=ctx,
        )
    fitted = res.parameters()
    assert abs(float(fitted["beta"]) - BETA) < 0.12, fitted
    assert abs(float(fitted["sigma"]) - SIGMA) < 0.1, fitted
    assert np.isfinite(np.asarray(res.window_log_likelihoods)).all()
    assert res.theta_path.shape[0] == 2000 // 25


@pytest.mark.slow
def test_streaming_mle_long_stream():
    """T=10,000 — a stream whose recorded history (10^4 steps x N particles)
    no recorded-history gradient method holds; the streaming estimator
    carries O(N) state and converges tightly."""
    y = make_data(10_000, seed=8)
    with inf.make_context(key=jax.random.PRNGKey(9)) as ctx:
        ctx.set_batch_shape(())
        build(ctx)
        ctx.update_parameter("beta", jnp.asarray(0.3))
        ctx.update_parameter("sigma", jnp.asarray(0.7))
        res = fit_mle_streaming(
            build, y, lambda b: pf.SISR(b, 500), jax.random.PRNGKey(10),
            window=50, learning_rate=2e-2, context=ctx,
        )
    fitted = res.parameters()
    assert abs(float(fitted["beta"]) - BETA) < 0.06, fitted
    assert abs(float(fitted["sigma"]) - SIGMA) < 0.06, fitted
