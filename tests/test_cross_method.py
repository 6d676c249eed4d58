"""Cross-method consistency: independent inference algorithms must agree on
the same data — the strongest correctness check available without an
analytic posterior (SURVEY §4's oracle-testing principle applied at the
algorithm level)."""

import jax
import numpy as np
import pytest

import pyfilter_tpu as pf
from pyfilter_tpu import timeseries as ts, distributions as dist, inference as inf

TRUE_BETA, TRUE_SIGMA = 0.7, 0.3


def build_ssm(beta=TRUE_BETA, sigma=TRUE_SIGMA):
    return ts.LinearStateSpaceModel(ts.models.AR(0.0, beta, sigma), (1.0, 0.2))


def build_model(ctx):
    beta = ctx.named_parameter("beta", dist.Uniform(0.0, 1.0))
    sigma = ctx.named_parameter("sigma", dist.LogNormal(-1.0, 0.5))
    return build_ssm(beta, sigma)


@pytest.mark.slow
def test_tempered_smc_agrees_with_pmmh():
    """Two routes to the same posterior — density-tempered SMC and
    pseudo-marginal MCMC — must agree within combined Monte-Carlo error."""
    _, y = build_ssm().sample_states(jax.random.PRNGKey(0), 250).get_paths()

    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
        tsmc = inf.TemperedSMC(pf.SISR(build_model, 200), 600, context=ctx)
        t_res = tsmc.fit(y)

    with inf.make_context(key=jax.random.PRNGKey(2)) as ctx:
        pmmh = inf.PMMH(
            pf.SISR(build_model, 200),
            1200,
            num_chains=4,
            proposal=inf.RandomWalk(scale=0.08),
            initializer="seed",
            context=ctx,
        )
        p_res = pmmh.fit(y)

    for name in ("beta", "sigma"):
        t_s = t_res.samples[name]
        p_s = np.asarray(p_res.samples[name])[400:].reshape(-1)  # post burn-in
        # posterior means agree within the larger posterior std
        tol = max(t_s.std(), p_s.std())
        assert abs(t_s.mean() - p_s.mean()) < tol, (
            name, t_s.mean(), p_s.mean(), tol
        )
        # posterior spreads within a factor 2 of each other
        ratio = t_s.std() / p_s.std()
        assert 0.5 < ratio < 2.0, (name, ratio)


@pytest.mark.slow
def test_if2_agrees_with_differentiable_mle():
    """Two routes to the same MLE — iterated filtering (gradient-free swarm)
    and Adam on the differentiable particle filter — must land on the same
    optimum of the same likelihood surface."""
    _, y = build_ssm().sample_states(jax.random.PRNGKey(3), 300).get_paths()

    with inf.make_context(key=jax.random.PRNGKey(4)) as ctx:
        if2 = inf.IF2(
            pf.SISR(build_model, 150), 300,
            num_iterations=25, sigma=0.1, cooling=0.88, context=ctx,
        )
        if2_res = if2.fit(y)

    mle = inf.fit_mle(
        build_model,
        y,
        filter_factory=lambda bm: pf.SISR(bm, 150),
        key=jax.random.PRNGKey(5),
        num_steps=250,
        learning_rate=3e-2,
    )
    grad_params = {k: float(v) for k, v in mle.parameters().items()}

    # the AR(1) MLE's asymptotic stds at T=300 are ~0.04 (beta) / ~0.02
    # (sigma); the two optimizers carry PF noise on top — match within 0.1
    for name in ("beta", "sigma"):
        assert abs(float(if2_res.mle[name]) - grad_params[name]) < 0.1, (
            name, if2_res.mle[name], grad_params[name]
        )
