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


def test_ckf_marginal_matches_ekf_on_linear_model():
    """kind='ckf' rides the same adapter; on a linear model its lane-batched
    likelihood equals the EKF's (both exact)."""
    _, y = build_ssm().sample_states(jax.random.PRNGKey(10), 60).get_paths()
    with inf.make_context(key=jax.random.PRNGKey(11)) as ctx:
        f_ekf = pf.GaussianMarginalFilter(build_model).set_batch_shape((8,))
        f_ckf = pf.GaussianMarginalFilter(build_model, kind="ckf").set_batch_shape((8,))
        ctx.set_batch_shape((8,))
        f_ekf = f_ekf.initialize_model(ctx)
        f_ckf = f_ckf.initialize_model(ctx)
    r1 = f_ekf.batch_filter(jax.random.PRNGKey(12), y)
    r2 = f_ckf.batch_filter(jax.random.PRNGKey(12), y)
    np.testing.assert_allclose(
        np.asarray(r1.log_likelihood), np.asarray(r2.log_likelihood), rtol=1e-4
    )


def _switching_y(seed, t_obs=300, block=50, sigmas=(0.1, 1.0), beta=0.9, obs_std=0.1):
    rng = np.random.default_rng(seed)
    regime = (np.arange(t_obs) // block) % 2
    x = np.zeros(t_obs, np.float32)
    prev = 0.0
    for t in range(t_obs):
        prev = beta * prev + sigmas[regime[t]] * rng.normal()
        x[t] = prev
    return jax.numpy.asarray(x + obs_std * rng.normal(size=t_obs).astype(np.float32))


def _switching_builder(ctx):
    """Learn the Markov stickiness of a two-regime volatility switcher by
    EXACT marginal MCMC — the transition matrix is built from a context
    parameter, lane-leading (VERDICT round-4 item 3's target use case)."""
    p_stay = ctx.named_parameter("p_stay", dist.Uniform(0.5, 0.999))
    p = jax.numpy.asarray(p_stay)[..., None, None]
    eye = jax.numpy.eye(2)
    trans = p * eye + (1.0 - p) * (1.0 - eye)  # (*lanes, 2, 2), rows sum to 1
    low = ts.LinearStateSpaceModel(ts.models.AR(0.0, 0.9, 0.1), (1.0, 0.1))
    high = ts.LinearStateSpaceModel(ts.models.AR(0.0, 0.9, 1.0), (1.0, 0.1))
    return pf.MarkovSwitchingModel((low, high), trans)


def test_imm_marginal_pmmh_recovers_transition_stickiness():
    """IMM-likelihood PMMH: the regime-switching data (blocks of 50 steps,
    true per-step stay probability 0.98) must pull the posterior of the
    transition matrix's stay probability far above the prior mean (0.75) and
    into the sticky regime."""
    y = _switching_y(0)
    with inf.make_context(key=jax.random.PRNGKey(20)) as ctx:
        pmmh = inf.PMMH(
            pf.GaussianMarginalFilter(_switching_builder, kind="imm"),
            300,
            num_chains=4,
            proposal=inf.RandomWalk(scale=0.15),
            initializer="seed",
            context=ctx,
        )
        res = pmmh.fit(y)

    s = np.asarray(res.samples["p_stay"])[100:].reshape(-1)
    assert len(np.unique(s)) > 30  # exact likelihood: the chain moves
    assert s.mean() > 0.9, (s.mean(), s.std())
    # and the likelihood itself ranks sticky above independent switching
    with inf.make_context(key=jax.random.PRNGKey(21)) as ctx2:
        f = pf.GaussianMarginalFilter(_switching_builder, kind="imm").set_batch_shape((2,))
        ctx2.set_batch_shape((2,))
        f = f.initialize_model(ctx2)  # registers p_stay, samples lanes
        ctx2.update_parameter("p_stay", jax.numpy.asarray([0.6, 0.97]))
        f = f.initialize_model(ctx2)  # rebuild with the pinned lane values
    lls = np.asarray(f.batch_filter(jax.random.PRNGKey(22), y).log_likelihood)
    assert lls[1] > lls[0]


def test_gsf_marginal_lane_likelihoods():
    """kind='gsf': the Gaussian-sum marginal likelihood rides the same lane
    vmap; on a linear model the moment-matched mixture prior keeps it within
    a whisker of the exact (EKF) likelihood, per lane."""
    _, y = build_ssm().sample_states(jax.random.PRNGKey(30), 60).get_paths()
    with inf.make_context(key=jax.random.PRNGKey(31)) as ctx:
        f_ekf = pf.GaussianMarginalFilter(build_model).set_batch_shape((6,))
        f_gsf = pf.GaussianMarginalFilter(
            build_model, kind="gsf", n_components=3, spread=0.5
        ).set_batch_shape((6,))
        ctx.set_batch_shape((6,))
        f_ekf = f_ekf.initialize_model(ctx)
        f_gsf = f_gsf.initialize_model(ctx)
    r1 = f_ekf.batch_filter(jax.random.PRNGKey(32), y)
    r2 = f_gsf.batch_filter(jax.random.PRNGKey(32), y)
    np.testing.assert_allclose(
        np.asarray(r1.log_likelihood), np.asarray(r2.log_likelihood), rtol=0.02, atol=0.5
    )
    # lane surgery on the vmapped GSF states works (PMMH's exchange path)
    last = r2.latest_state
    swapped = last.exchange(last.resample(jax.numpy.asarray([1, 0, 3, 2, 5, 4])),
                            jax.numpy.asarray([True, False] * 3))
    assert swapped.means.shape == last.means.shape
