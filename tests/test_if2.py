"""IF2 (iterated filtering) tests: MLE recovery on AR(1), swarm contraction
under cooling, likelihood-trace improvement, and result plumbing."""

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


def test_if2_recovers_mle_and_contracts():
    _, y = build_ssm().sample_states(jax.random.PRNGKey(0), 300).get_paths()

    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
        alg = inf.IF2(
            pf.SISR(build_model, 100),
            200,
            num_iterations=20,
            sigma=0.1,
            cooling=0.88,
            context=ctx,
        )
        res = alg.fit(y)

    # MLE close to the truth (AR-coefficient MLE std at T=300 is ~0.04)
    assert abs(res.mle["beta"] - TRUE_BETA) < 0.12, res.mle
    assert abs(res.mle["sigma"] - TRUE_SIGMA) < 0.08, res.mle

    # result plumbing: traces over iterations, swarm over particles
    assert res.theta_trace["beta"].shape == (20,)
    assert res.swarm["beta"].shape == (200,)
    assert res.log_likelihoods.shape == (20,)

    # cooling concentrates the swarm well below the prior spread
    assert res.swarm["beta"].std() < 0.1
    # the likelihood trace improves from the prior-spread start
    assert res.log_likelihoods[-3:].mean() > res.log_likelihoods[:3].mean()

    # the final swarm is absorbed into the user-held context
    assert np.asarray(ctx.get_parameter("beta")).shape == (200,)


def test_if2_uncooled_swarm_stays_wider():
    """cooling=1 keeps the full perturbation scale: the final swarm must stay
    measurably wider than under geometric cooling (same seed/budget)."""
    _, y = build_ssm().sample_states(jax.random.PRNGKey(2), 120).get_paths()

    def run(cooling):
        with inf.make_context(key=jax.random.PRNGKey(3)) as ctx:
            alg = inf.IF2(
                pf.SISR(build_model, 64),
                128,
                num_iterations=12,
                sigma=0.1,
                cooling=cooling,
                context=ctx,
            )
            return alg.fit(y)

    cooled = run(0.75)
    hot = run(1.0)
    assert cooled.swarm["beta"].std() < hot.swarm["beta"].std()
