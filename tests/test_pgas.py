"""PGAS tests: CSMC kernel invariance against the exact RTS smoother (fixed
θ), joint posterior recovery on AR(1), and ancestor-sampling mixing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
import pyfilter_tpu.distributions as dist
from pyfilter_tpu import inference as inf, timeseries as ts
from pyfilter_tpu.inference.batch.mcmc import csmc_sweep
from pyfilter_tpu.timeseries import models

ALPHA, BETA, SIGMA = 0.2, 0.7, 0.4
OBS_STD = 0.3


def build_ssm(beta=BETA, sigma=SIGMA):
    return ts.LinearStateSpaceModel(models.AR(ALPHA, beta, sigma), (1.0, OBS_STD))


def test_csmc_invariance_matches_rts():
    """Iterating the CSMC kernel at fixed θ must leave the smoothing posterior
    invariant: the long-run trajectory average equals the RTS smoothed mean."""
    ssm = build_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(0), 40).get_paths()
    rts_mean, rts_cov = pf.KalmanFilter(ssm).smooth(y)
    rts_mean = np.asarray(rts_mean)[:, 0]
    rts_std = np.sqrt(np.asarray(rts_cov)[:, 0, 0])

    n_sweeps, burn = 400, 100

    def gibbs(carry, k):
        traj = csmc_sweep(k, ssm, y, carry, 32)
        return traj, traj

    traj0 = jnp.zeros(y.shape[0] + 1)
    keys = jax.random.split(jax.random.PRNGKey(1), n_sweeps)
    _, trajs = jax.jit(lambda t0, ks: jax.lax.scan(gibbs, t0, ks))(traj0, keys)
    trajs = np.asarray(trajs)[burn:]  # (S, T+1)

    avg = trajs.mean(axis=0)[1:]  # observation-time states
    # autocorrelated sweeps: allow a generous MC band in units of rts_std
    err = np.abs(avg - rts_mean) / rts_std
    assert err.mean() < 0.25, err.mean()
    assert err.max() < 0.8, err.max()
    # marginal spread must match the smoothing std, not the filter/prior std
    std_ratio = trajs.std(axis=0)[1:] / rts_std
    assert 0.75 < std_ratio.mean() < 1.25, std_ratio.mean()


def test_ancestor_sampling_beats_plain_csmc_mixing():
    """Without ancestor sampling the early-time states barely move between
    sweeps (path degeneracy); AS must decorrelate them measurably faster."""
    ssm = build_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(2), 60).get_paths()

    def run(as_flag):
        def gibbs(carry, k):
            traj = csmc_sweep(k, ssm, y, carry, 16, ancestor_sampling=as_flag)
            return traj, traj[1]  # an early-time state

        keys = jax.random.split(jax.random.PRNGKey(3), 200)
        _, early = jax.jit(lambda ks: jax.lax.scan(gibbs, jnp.zeros(y.shape[0] + 1), ks))(keys)
        e = np.asarray(early)
        # lag-1 autocorrelation of the early state across sweeps; a state
        # that NEVER moves (full path degeneracy) is perfectly correlated
        e = e - e.mean()
        var = float((e**2).mean())
        if var < 1e-12:
            return 1.0
        return float((e[1:] * e[:-1]).mean() / var)

    rho_as, rho_plain = run(True), run(False)
    assert rho_as < rho_plain - 0.05, (rho_as, rho_plain)


def test_pgas_multichain_shapes_and_diagnostics():
    """num_chains > 1: vmapped chains, (S, C, *event) records, and the chain
    diagnostics (split-R-hat over genuinely independent chains) compose."""
    _, y = build_ssm().sample_states(jax.random.PRNGKey(6), 80).get_paths()

    def build_model(ctx):
        beta = ctx.named_parameter("beta", dist.Uniform(0.0, 1.0))
        return build_ssm(beta, SIGMA)

    with inf.make_context(key=jax.random.PRNGKey(7)) as ctx:
        alg = inf.PGAS(
            pf.SISR(build_model, 32), 40, rw_scale=0.1, num_chains=3, context=ctx
        )
        res = alg.fit(y)

    assert res.samples["beta"].shape == (40, 3)
    assert res.trajectory.shape[0] == 3  # one retained path per chain
    # overdispersed starts: the chains begin at distinct points
    assert len(np.unique(res.samples["beta"][0])) == 3
    summary = inf.summarize_chains(res)
    assert np.isfinite(summary["beta"]["rhat"]).all()
    assert np.isfinite(summary["beta"]["ess"]).all()


def test_pgas_remainder_chunk_rides_same_executable():
    """num_samples not divisible by chunk_size: the tail chunk is padded and
    masked device-side (no fresh compile of the whole sweep graph for a
    one-off shape) — records must have exactly num_samples rows."""
    _, y = build_ssm().sample_states(jax.random.PRNGKey(10), 60).get_paths()

    def build_model(ctx):
        beta = ctx.named_parameter("beta", dist.Uniform(0.0, 1.0))
        return build_ssm(beta, SIGMA)

    with inf.make_context(key=jax.random.PRNGKey(11)) as ctx:
        alg = inf.PGAS(pf.SISR(build_model, 16), 10, rw_scale=0.1, context=ctx)
        res = alg.fit(y, chunk_size=4)  # chunks 4, 4, 2 (last one masked)

    assert res.samples["beta"].shape == (10,)
    assert np.isfinite(res.samples["beta"]).all()
    assert 0.0 <= res.acceptance_rate <= 1.0


@pytest.mark.slow
def test_pgas_recovers_parameters():
    """Joint θ/trajectory sampling: posterior means bracket the truth."""
    _, y = build_ssm().sample_states(jax.random.PRNGKey(4), 300).get_paths()

    def build_model(ctx):
        beta = ctx.named_parameter("beta", dist.Uniform(0.0, 1.0))
        sigma = ctx.named_parameter("sigma", dist.LogNormal(-1.0, 1.0))
        return build_ssm(beta, sigma)

    with inf.make_context(key=jax.random.PRNGKey(5)) as ctx:
        filt = pf.SISR(build_model, 64)
        alg = inf.PGAS(filt, 800, rw_scale=0.08, context=ctx)
        res = alg.fit(y)

    assert 0.05 < res.acceptance_rate < 0.95, res.acceptance_rate
    beta_s = res.samples["beta"][200:]
    sigma_s = res.samples["sigma"][200:]
    for name, s, true in (("beta", beta_s, BETA), ("sigma", sigma_s, SIGMA)):
        z = abs(s.mean() - true) / (s.std() + 1e-6)
        assert z < 4.0, (name, s.mean(), true, s.std())
    # the retained trajectory is a plausible smoothing draw
    assert np.isfinite(res.trajectory).all()
    # the chain diagnostics compose with the PGAS record (singleton chain axis)
    summary = inf.summarize_chains(res)
    assert set(summary) == {"beta", "sigma"}
    assert np.isfinite(summary["beta"]["ess"]).all()


def test_csmc_oes_invariance_matches_rts():
    """observe_every_step > 1: the CSMC sweep pins SUB-STEP states (round-3
    verdict: the oes==1 guard locked the flagship SDE workloads out of PGAS).
    Iterating the kernel at fixed theta must reproduce the exact RTS
    smoothing marginals at the observation times."""
    oes = 3
    ssm = ts.LinearStateSpaceModel(
        models.AR(ALPHA, BETA, SIGMA), (1.0, OBS_STD), observe_every_step=oes
    )
    _, ys = ssm.sample_states(jax.random.PRNGKey(0), 20 * oes).get_paths()
    y = ys[oes - 1 :: oes]
    assert y.shape[0] == 20 and not np.isnan(np.asarray(y)).any()

    rts_mean, rts_cov = pf.KalmanFilter(ssm).smooth(y)
    rts_mean = np.asarray(rts_mean)[:, 0]
    rts_std = np.sqrt(np.asarray(rts_cov)[:, 0, 0])

    n_sweeps, burn = 400, 100
    traj_len = 2 + (y.shape[0] - 1) * oes

    def gibbs(carry, k):
        traj = csmc_sweep(k, ssm, y, carry, 32)
        return traj, traj

    traj0 = jnp.zeros(traj_len)
    keys = jax.random.split(jax.random.PRNGKey(1), n_sweeps)
    _, trajs = jax.jit(lambda t0, ks: jax.lax.scan(gibbs, t0, ks))(traj0, keys)
    trajs = np.asarray(trajs)[burn:]  # (S, traj_len)

    obs_states = trajs[:, 1::oes]  # observation-time states
    assert obs_states.shape[1] == y.shape[0]
    err = np.abs(obs_states.mean(axis=0) - rts_mean) / rts_std
    assert err.mean() < 0.3, err.mean()
    assert err.max() < 1.0, err.max()
    std_ratio = obs_states.std(axis=0) / rts_std
    assert 0.7 < std_ratio.mean() < 1.3, std_ratio.mean()


def test_csmc_validates_trajectory_length():
    oes = 3
    ssm = ts.LinearStateSpaceModel(
        models.AR(ALPHA, BETA, SIGMA), (1.0, OBS_STD), observe_every_step=oes
    )
    with pytest.raises(ValueError, match="record_intermediary"):
        csmc_sweep(jax.random.PRNGKey(0), ssm, jnp.zeros(10), jnp.zeros(11), 16)


@pytest.mark.slow
def test_pgas_stochvol_recovery():
    """The framework's own flagship (Verhulst stoch-vol, oes=5) can now be
    PGAS'd: posterior means of the identifiable parameters land within the
    z-score bar from 150 observations."""
    from pyfilter_tpu import examples

    true = dict(kappa=0.1, gamma=1.0, sigma=0.05, mu=0.0, nu=0.0, tau=1.0)
    true_model = examples.stochastic_volatility_model(**true)
    oes = true_model.observe_every_step
    path = true_model.sample_states(jax.random.PRNGKey(11), 150 * oes)
    ys = path.y
    y = ys[~jnp.isnan(ys)]
    assert y.shape[0] == 150

    with inf.make_context(key=jax.random.PRNGKey(5)) as ctx:
        filt = pf.SISR(examples.stochastic_volatility_builder, 64)
        alg = inf.PGAS(filt, 600, rw_scale=0.06, context=ctx)
        res = alg.fit(y)

    assert 0.05 < res.acceptance_rate < 0.95, res.acceptance_rate
    # gamma (vol level) and tau (obs scale) are the identifiable pair at
    # T=150 (same bar the SMC2 stoch-vol test uses, test_examples.py:82-83)
    post = {k: float(v[200:].mean()) for k, v in res.samples.items()}
    post_std = {k: float(v[200:].std()) for k, v in res.samples.items()}
    assert np.isfinite(list(post.values())).all()
    assert 0.3 < post["gamma"] < 3.0, post
    assert 0.5 < post["tau"] < 2.0, post
    for name in ("gamma", "tau"):
        z = abs(post[name] - true[name]) / (post_std[name] + 1e-6)
        assert z < 4.0, (name, post[name], post_std[name])
    # the retained trajectory carries sub-step states and stays positive
    # (Verhulst volatility), length 2 + (T-1)*oes
    assert res.trajectory.shape[-1] == 2 + (150 - 1) * oes
    assert np.isfinite(res.trajectory).all()
