"""GaussianMarginalFilter inside PMMH: exact-likelihood marginal MCMC (plain
MH on the Kalman-exact likelihood when the model is linear) riding the fused
chain scan, with lane exchange on the vmapped Gaussian states."""

import jax
import numpy as np

import pyfilter_tpu as pf
from pyfilter_tpu import timeseries as ts, distributions as dist, inference as inf

TRUE_BETA, TRUE_SIGMA = 0.7, 0.3


def build_ssm(beta=TRUE_BETA, sigma=TRUE_SIGMA):
    return ts.LinearStateSpaceModel(ts.models.AR(0.0, beta, sigma), (1.0, 0.2))


def build_model(ctx):
    beta = ctx.named_parameter("beta", dist.Uniform(0.0, 1.0))
    sigma = ctx.named_parameter("sigma", dist.LogNormal(-1.0, 0.5))
    return build_ssm(beta, sigma)


def test_exact_marginal_pmmh_recovers_posterior():
    _, y = build_ssm().sample_states(jax.random.PRNGKey(0), 200).get_paths()

    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
        pmmh = inf.PMMH(
            pf.GaussianMarginalFilter(build_model),
            800,
            num_chains=4,
            proposal=inf.RandomWalk(scale=0.08),
            initializer="seed",
            context=ctx,
        )
        res = pmmh.fit(y)

    for name, true in (("beta", TRUE_BETA), ("sigma", TRUE_SIGMA)):
        s = np.asarray(res.samples[name])[300:].reshape(-1)
        z = abs(s.mean() - true) / s.std()
        assert z < 3.5, (name, s.mean(), s.std())
        # exact likelihood: the chain actually moves (no pseudo-marginal
        # sticking) — plenty of distinct post-burn-in values
        assert len(np.unique(s)) > 50

    summary = inf.summarize_chains(res)
    assert np.isfinite(summary["beta"]["rhat"]).all()


def test_exact_marginal_pmmh_eager_matches_fused():
    """chunk_size=1 forces the reference-style per-sample loop; both paths
    must produce identical chains (the repo-wide fused-tier contract applied
    to the Gaussian adapter)."""
    _, y = build_ssm().sample_states(jax.random.PRNGKey(2), 80).get_paths()

    def run(chunk_size):
        with inf.make_context(key=jax.random.PRNGKey(3)) as ctx:
            pmmh = inf.PMMH(
                pf.GaussianMarginalFilter(build_model),
                20,
                num_chains=2,
                proposal=inf.RandomWalk(scale=0.08),
                context=ctx,
            )
            return pmmh.fit(y, chunk_size=chunk_size)

    fused = run(None)
    eager = run(1)
    for name in ("beta", "sigma"):
        np.testing.assert_allclose(
            np.asarray(fused.samples[name]),
            np.asarray(eager.samples[name]),
            rtol=2e-5,
            atol=2e-6,
        )
