"""Density-tempered SMC tests: adaptive ladder, posterior recovery, evidence
estimate, and model comparison via log-evidence."""

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


def test_tempered_smc_recovers_posterior():
    _, y = build_ssm().sample_states(jax.random.PRNGKey(0), 200).get_paths()

    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
        alg = inf.TemperedSMC(pf.SISR(build_model, 150), 400, context=ctx)
        res = alg.fit(y)

    # the adaptive ladder is strictly increasing and terminates at 1
    lam = res.lambdas
    assert lam[-1] == 1.0
    assert (np.diff(lam) > 0).all()
    assert len(res.acceptance_rates) == len(lam)

    # z-scored posterior recovery on both free parameters
    for name, true in (("beta", TRUE_BETA), ("sigma", TRUE_SIGMA)):
        s = res.samples[name]
        assert s.shape == (400,)
        z = abs(s.mean() - true) / s.std()
        assert z < 3.5, (name, s.mean(), s.std())

    assert np.isfinite(res.log_evidence)
    # the final swarm is absorbed into the user-held context
    assert np.asarray(ctx.get_parameter("beta")).shape == (400,)


def test_tempered_smc_exact_likelihood_via_ekf_adapter():
    """GaussianMarginalFilter: TemperedSMC on the EXACT (EKF = Kalman on a
    linear model) likelihood — agrees with the particle run, with the
    pseudo-marginal acceptance penalty gone and a noise-free evidence."""
    _, y = build_ssm().sample_states(jax.random.PRNGKey(0), 200).get_paths()

    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
        alg = inf.TemperedSMC(
            pf.GaussianMarginalFilter(build_model, kind="ekf"), 400, context=ctx
        )
        exact = alg.fit(y)
    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
        alg_pf = inf.TemperedSMC(pf.SISR(build_model, 150), 400, context=ctx)
        noisy = alg_pf.fit(y)

    assert exact.lambdas[-1] == 1.0
    for name, true in (("beta", TRUE_BETA), ("sigma", TRUE_SIGMA)):
        s = exact.samples[name]
        assert abs(s.mean() - true) / s.std() < 3.5, (name, s.mean(), s.std())
        # the two likelihood backends target the same posterior
        tol = max(s.std(), noisy.samples[name].std())
        assert abs(s.mean() - noisy.samples[name].mean()) < tol
    # evidence estimates agree; exact likelihood keeps MH acceptance healthy
    # at the final (posterior-sharp) stage where the pseudo-marginal sticks
    assert abs(exact.log_evidence - noisy.log_evidence) < 3.0
    assert exact.acceptance_rates[-1] > noisy.acceptance_rates[-1]


def test_gaussian_marginal_filter_lane_logliks_match_loop():
    """The vmapped lane likelihoods equal a per-lane EKF loop exactly."""
    import jax.numpy as jnp

    _, y = build_ssm().sample_states(jax.random.PRNGKey(2), 60).get_paths()
    with inf.make_context(key=jax.random.PRNGKey(3)) as ctx:
        ctx.set_batch_shape((5,))
        filt = pf.GaussianMarginalFilter(build_model).set_batch_shape((5,))
        filt = filt.initialize_model(ctx)
        res = filt.batch_filter(jax.random.PRNGKey(4), y)
        assert res.log_likelihood.shape == (5,)

        betas = np.asarray(ctx.get_parameter("beta"))
        sigmas = np.asarray(ctx.get_parameter("sigma"))
    for i in range(5):
        single = pf.ExtendedKalmanFilter(
            build_ssm(float(betas[i]), float(sigmas[i]))
        ).batch_filter(y)
        np.testing.assert_allclose(
            float(res.log_likelihood[i]), float(single.log_likelihood), rtol=1e-5
        )


def test_tempered_smc_raises_on_stalled_ladder():
    """max_stages exhausted before lambda reaches 1 must raise, not hand back
    a partially-tempered swarm dressed up as the posterior."""
    _, y = build_ssm().sample_states(jax.random.PRNGKey(4), 200).get_paths()
    with inf.make_context(key=jax.random.PRNGKey(5)) as ctx:
        alg = inf.TemperedSMC(
            pf.SISR(build_model, 100), 200, max_stages=1, context=ctx
        )
        with pytest.raises(RuntimeError, match="ladder stalled"):
            alg.fit(y)


@pytest.mark.slow
def test_tempered_evidence_ranks_models():
    """Log-evidence must prefer the data-generating observation scale over a
    badly misspecified one (Bayes-factor sanity check of the estimator)."""
    _, y = build_ssm().sample_states(jax.random.PRNGKey(2), 150).get_paths()

    def run(obs_scale):
        def build(ctx):
            beta = ctx.named_parameter("beta", dist.Uniform(0.0, 1.0))
            return ts.LinearStateSpaceModel(
                ts.models.AR(0.0, beta, TRUE_SIGMA), (1.0, obs_scale)
            )

        with inf.make_context(key=jax.random.PRNGKey(3)) as ctx:
            alg = inf.TemperedSMC(pf.SISR(build, 150), 300, context=ctx)
            return alg.fit(y).log_evidence

    good = run(0.2)  # the true observation noise
    bad = run(1.5)
    assert good > bad + 10.0, (good, bad)


def test_tempered_smc_waste_free_matches_standard():
    """Waste-free TemperedSMC (Dau & Chopin 2022): K/(num_mh_steps+1) chain
    roots per stage, every MH intermediate recycled into the next swarm —
    same posterior and evidence as the discard strategy, from 4x fewer
    re-filters per stage."""
    _, y = build_ssm().sample_states(jax.random.PRNGKey(0), 200).get_paths()

    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
        alg = inf.TemperedSMC(
            pf.SISR(build_model, 150), 400, num_mh_steps=3, waste_free=True,
            context=ctx,
        )
        wf = alg.fit(y)
    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx2:
        std = inf.TemperedSMC(
            pf.SISR(build_model, 150), 400, num_mh_steps=3, context=ctx2
        ).fit(y)

    assert wf.lambdas[-1] == 1.0
    for name, true in (("beta", TRUE_BETA), ("sigma", TRUE_SIGMA)):
        s = wf.samples[name]
        assert s.shape == (400,)
        assert abs(s.mean() - true) / s.std() < 3.5, (name, s.mean(), s.std())
        # same posterior as the standard strategy (within swarm MC error)
        tol = 1.5 * max(s.std(), std.samples[name].std())
        assert abs(s.mean() - std.samples[name].mean()) < tol
    assert np.isfinite(wf.log_evidence)
    assert abs(wf.log_evidence - std.log_evidence) < 3.0
    # the user-held context absorbs the full K-particle waste-free swarm
    assert np.asarray(ctx.get_parameter("beta")).shape == (400,)


def test_tempered_smc_waste_free_validates_divisibility():
    with pytest.raises(ValueError, match="divisible"):
        inf.TemperedSMC(
            pf.SISR(build_model, 64), 100, num_mh_steps=2, waste_free=True,
            context=inf.make_context(key=jax.random.PRNGKey(0)),
        )
