"""Differentiable particle filtering (Ścibior–Wood stop-gradient resampling).

New capability beyond the reference (its only gradient path is the
FFBS-smoothed pyro factor, reference filters/particle/base.py:176-229): with
``differentiable=True`` the filters carry a zero-valued, gradient-carrying
ancestor correction through every resample (arXiv:2106.10314; PAPERS.md
arXiv:2111.01409), making ``result.log_likelihood`` differentiable w.r.t.
model parameters with the correct expected gradient.

Tests: (1) forward values are identical with the flag on/off; (2) the mean
gradient over seeds matches the exact Kalman score on a linear-Gaussian AR(1)
within Monte-Carlo error; (3) ``fit_mle`` climbs to the true parameter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
import pyfilter_tpu.distributions as dist
from pyfilter_tpu import inference as inf, timeseries as ts
from pyfilter_tpu.timeseries import models

ALPHA, BETA, SIGMA = 0.0, 0.8, 0.5
OBS_COEF, OBS_STD = 1.0, 0.3


def build_ssm(beta):
    return ts.LinearStateSpaceModel(models.AR(ALPHA, beta, SIGMA), (OBS_COEF, OBS_STD))


def kalman_loglik(beta, y):
    """Exact scalar-AR(1) Kalman marginal log-likelihood — pure JAX, so
    ``jax.grad`` of it is the exact score (the package KalmanFilter builds its
    matrices through numpy and is not traceable)."""
    q, r = SIGMA**2, OBS_STD**2

    def step(carry, y_t):
        m, p = carry
        m_pred = ALPHA + beta * m
        p_pred = beta**2 * p + q
        s = OBS_COEF**2 * p_pred + r
        ll_t = dist.Normal(OBS_COEF * m_pred, jnp.sqrt(s)).log_prob(y_t)
        k = p_pred * OBS_COEF / s
        return (m_pred + k * (y_t - OBS_COEF * m_pred), (1 - k * OBS_COEF) * p_pred), ll_t

    # initial state x0 ~ N(ALPHA, SIGMA^2) is not observed (matches the
    # filters: the first observation weights the first propagated cloud)
    (_, _), lls = jax.lax.scan(step, (jnp.asarray(ALPHA), jnp.asarray(q)), y)
    return jnp.sum(lls)


@pytest.fixture(scope="module")
def y_data():
    _, y = build_ssm(BETA).sample_states(jax.random.PRNGKey(0), 40).get_paths()
    return y


@pytest.mark.parametrize("filter_cls", [pf.SISR, pf.APF])
@pytest.mark.parametrize("ess_threshold", [0.9, 2.0])
def test_forward_values_identical(filter_cls, y_data, ess_threshold):
    """The correction is exactly zero-valued: loglik with the flag on must
    equal the default path bit-for-bit (same key, same resampler)."""
    kwargs = dict(ess_threshold=ess_threshold) if filter_cls is pf.SISR else {}
    lls = []
    for flag in (False, True):
        filt = filter_cls(build_ssm(BETA), 256, differentiable=flag, **kwargs)
        lls.append(float(filt.batch_filter(jax.random.PRNGKey(7), y_data).log_likelihood))
    assert lls[0] == pytest.approx(lls[1], abs=1e-5)


@pytest.mark.parametrize("filter_cls", [pf.SISR, pf.APF])
def test_gradient_matches_kalman_score(filter_cls, y_data):
    """Mean PF gradient over seeds ≈ the exact Kalman score at a point away
    from the MLE (where the score is large), within Monte-Carlo error."""
    beta0 = 0.6
    exact = float(jax.grad(kalman_loglik)(beta0, y_data))

    def pf_ll(beta, key):
        # ess_threshold=2.0 forces a resample EVERY step for SISR — the
        # hardest case for the correction (APF resamples every step anyway)
        kwargs = dict(ess_threshold=2.0) if filter_cls is pf.SISR else {}
        filt = filter_cls(build_ssm(beta), 512, differentiable=True, **kwargs)
        return filt.batch_filter(key, y_data, use_jit=False).log_likelihood

    keys = jax.random.split(jax.random.PRNGKey(42), 64)
    grads = jax.jit(jax.vmap(jax.grad(pf_ll), in_axes=(None, 0)))(
        jnp.asarray(beta0), keys
    )
    grads = np.asarray(grads)
    assert np.isfinite(grads).all()
    mean, sem = grads.mean(), grads.std(ddof=1) / np.sqrt(len(grads))
    assert abs(mean - exact) < 4 * sem + 0.05 * abs(exact), (mean, exact, sem)


def test_uncorrected_gradient_is_biased(y_data):
    """Sanity check that the correction does something: with the flag OFF the
    resample severs the weight genealogy, so the 'gradient' reduces to the
    pathwise term only, which is measurably further from the exact score."""
    beta0 = 0.6
    exact = float(jax.grad(kalman_loglik)(beta0, y_data))

    def pf_ll(flag, beta, key):
        filt = pf.SISR(
            build_ssm(beta), 512, differentiable=flag, ess_threshold=2.0
        )
        return filt.batch_filter(key, y_data, use_jit=False).log_likelihood

    keys = jax.random.split(jax.random.PRNGKey(42), 64)
    err = {}
    for flag in (False, True):
        grads = jax.jit(
            jax.vmap(jax.grad(pf_ll, argnums=1), in_axes=(None, None, 0)),
            static_argnums=0,
        )(flag, jnp.asarray(beta0), keys)
        err[flag] = abs(float(jnp.mean(grads)) - exact)
    assert err[True] < err[False], err


@pytest.mark.slow
def test_fit_mle_recovers_beta(y_data):
    """Adam on the differentiable PF loglik climbs to the Kalman MLE."""
    _, y = build_ssm(BETA).sample_states(jax.random.PRNGKey(5), 150).get_paths()

    def build_model(ctx):
        beta = ctx.named_parameter("beta", dist.Uniform(0.0, 1.0))
        return build_ssm(beta)

    res = inf.fit_mle(
        build_model,
        y,
        filter_factory=lambda bm: pf.SISR(bm, 256),
        key=jax.random.PRNGKey(11),
        num_steps=250,
        learning_rate=3e-2,
    )
    fitted = float(res.parameters()["beta"])

    # the target is the exact MLE of this realization, not the true beta
    betas = np.linspace(0.4, 0.99, 60)
    lls = [float(kalman_loglik(b, y)) for b in betas]
    mle = betas[int(np.argmax(lls))]
    assert abs(fitted - mle) < 0.08, (fitted, mle)
    # and the loss must actually have improved
    assert float(res.losses[-10:].mean()) < float(res.losses[:10].mean())
