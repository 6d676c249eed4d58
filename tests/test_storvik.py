"""Storvik filter tests: exact-conditional online parameter learning.

The bar (round-3 verdict item 5): posterior matches PMMH on a conjugate
model within MC error, ONLINE, with no jittering knobs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
import pyfilter_tpu.distributions as dist
from pyfilter_tpu import inference as inf, timeseries as ts
from pyfilter_tpu.timeseries import models

ALPHA, BETA, SIGMA, OBS_STD = 0.2, 0.7, 0.4, 0.25


def make_data(n=400, seed=0):
    ssm = ts.LinearStateSpaceModel(models.AR(ALPHA, BETA, SIGMA), (1.0, OBS_STD))
    _, y = ssm.sample_states(jax.random.PRNGKey(seed), n).get_paths()
    return y


def run_storvik(y, n_particles=3000, seed=1):
    conj = inf.NIGAutoregression(
        obs_coeff=1.0, obs_scale=OBS_STD, m0=(0.0, 0.0), v0=4.0, a0=2.0, b0=0.5
    )
    return inf.StorvikFilter(conj, n_particles).fit(jax.random.PRNGKey(seed), y)


def test_storvik_recovers_parameters_online():
    """All three parameters recovered; the online trajectory TIGHTENS (late
    errors smaller than early ones) — the defining online property."""
    y = make_data()
    res = run_storvik(y)
    a_m, b_m, s2_m = [np.asarray(m) for m in res.param_means]

    assert abs(a_m[-1] - ALPHA) < 0.1, a_m[-1]
    assert abs(b_m[-1] - BETA) < 0.1, b_m[-1]
    assert abs(np.sqrt(s2_m[-1]) - SIGMA) < 0.08, np.sqrt(s2_m[-1])

    def err(t):
        return (
            abs(a_m[t] - ALPHA) + abs(b_m[t] - BETA) + abs(np.sqrt(s2_m[t]) - SIGMA)
        )

    # averaged late error below averaged early error (monotone-ish tightening)
    early = np.mean([err(t) for t in range(20, 60)])
    late = np.mean([err(t) for t in range(360, 400)])
    assert late < 0.7 * early, (early, late)

    assert np.isfinite(float(res.log_likelihood))
    assert np.asarray(res.ess).min() > 1.0


@pytest.mark.slow
def test_storvik_matches_pmmh_posterior():
    """Same data, diffuse priors on both sides: the Storvik online posterior
    at T must agree with a PMMH batch posterior within combined MC error —
    with zero jittering/tuning knobs on the Storvik side."""
    y = make_data(n=300, seed=3)
    res = run_storvik(y, n_particles=4000)
    a_m, b_m, s2_m = [float(np.asarray(m)[-1]) for m in res.param_means]

    def build_model(ctx):
        alpha = ctx.named_parameter("alpha", dist.Normal(0.0, 2.0))
        beta = ctx.named_parameter("beta", dist.Normal(0.0, 2.0))
        sigma = ctx.named_parameter("sigma", dist.LogNormal(-1.0, 1.0))
        return ts.LinearStateSpaceModel(models.AR(alpha, beta, sigma), (1.0, OBS_STD))

    with inf.make_context(key=jax.random.PRNGKey(4)) as ctx:
        filt = pf.SISR(build_model, 200)
        alg = inf.PMMH(
            filt, 400, num_chains=4,
            proposal=inf.AdaptiveRandomWalk(initial_scale=5e-2),
            context=ctx, key=jax.random.PRNGKey(5),
        )
        pm = alg.fit(y, logging=inf.logging.DefaultLogger())
    arr = pm.as_arrays()
    post = {k: float(v[200:].mean()) for k, v in arr.items()}
    post_std = {k: float(v[200:].std()) + 1e-3 for k, v in arr.items()}

    assert abs(a_m - post["alpha"]) < 3.0 * post_std["alpha"], (a_m, post)
    assert abs(b_m - post["beta"]) < 3.0 * post_std["beta"], (b_m, post)
    assert abs(np.sqrt(s2_m) - post["sigma"]) < 3.0 * post_std["sigma"], (s2_m, post)


def test_storvik_resampling_carries_stats():
    """Forcing a resample every step (threshold > 1) must keep the stats
    aligned with their particles — recovery still holds."""
    y = make_data(n=200, seed=6)
    conj = inf.NIGAutoregression(obs_scale=OBS_STD, v0=4.0, a0=2.0, b0=0.5)
    res = inf.StorvikFilter(conj, 2000, ess_threshold=1.1).fit(
        jax.random.PRNGKey(7), y
    )
    a_m, b_m, _ = [float(np.asarray(m)[-1]) for m in res.param_means]
    assert abs(b_m - BETA) < 0.15, b_m
    assert abs(a_m - ALPHA) < 0.15, a_m


def test_storvik_nan_observations_skip():
    y = np.asarray(make_data(n=120, seed=8)).copy()
    y[40:50] = np.nan
    res = run_storvik(jnp.asarray(y), n_particles=1000, seed=9)
    assert np.isfinite(float(res.log_likelihood))
    b_m = float(np.asarray(res.param_means[1])[-1])
    assert abs(b_m - BETA) < 0.2, b_m


def test_storvik_unknown_obs_variance_recovers():
    """The NIGARUnknownObsVariance block learns the observation variance
    jointly with the transition triple — no knob left hand-tuned."""
    y = make_data(n=500, seed=10)
    conj = inf.NIGARUnknownObsVariance(
        obs_coeff=1.0, m0=(0.0, 0.0), v0=4.0, a0=2.0, b0=0.5, c0=2.0, d0=0.1
    )
    res = inf.StorvikFilter(conj, 3000).fit(jax.random.PRNGKey(11), y)
    a_m, b_m, s2_m, sy2_m = [float(np.asarray(m)[-1]) for m in res.param_means]
    assert abs(a_m - ALPHA) < 0.12, a_m
    assert abs(b_m - BETA) < 0.12, b_m
    assert abs(np.sqrt(s2_m) - SIGMA) < 0.1, np.sqrt(s2_m)
    assert abs(np.sqrt(sy2_m) - OBS_STD) < 0.1, np.sqrt(sy2_m)
    assert np.isfinite(float(res.log_likelihood))

    # NaN observations skip the obs-variance statistic too
    y_nan = np.asarray(make_data(n=120, seed=12)).copy()
    y_nan[30:40] = np.nan
    res2 = inf.StorvikFilter(conj, 1000).fit(jax.random.PRNGKey(13), jnp.asarray(y_nan))
    assert np.isfinite(float(res2.log_likelihood))
    assert abs(float(np.asarray(res2.param_means[1])[-1]) - BETA) < 0.25


def test_storvik_poisson_gamma_recovers_intensity():
    """PoissonGammaCounts: the intensity scale of a Poisson observation over
    a known AR log-intensity is learned online from the exact Gamma
    conditional."""
    lam_true = 5.0
    hidden = models.AR(0.0, 0.9, 0.3)
    conj = inf.PoissonGammaCounts(hidden, a0=2.0, b0=0.5)
    ssm = conj.build_model((jnp.asarray(lam_true),))
    _, y = ssm.sample_states(jax.random.PRNGKey(14), 400).get_paths()
    assert float(y.min()) >= 0.0  # counts

    res = inf.StorvikFilter(conj, 2000).fit(jax.random.PRNGKey(15), y)
    (lam_m,) = res.param_means
    lam_last = float(np.asarray(lam_m)[-1])
    assert abs(lam_last - lam_true) < 0.5, lam_last
    # online tightening
    early = abs(np.asarray(lam_m)[30] - lam_true)
    assert abs(lam_last - lam_true) < early + 0.05


def test_storvik_vector_ar_recovers():
    """NIGVectorAutoregression: a 2-D VAR's coefficient matrix and per-row
    noise scales are learned from their exact row-wise NIG conditionals."""
    a_true = np.asarray([[0.8, 0.1], [0.0, 0.7]], np.float32)
    sig_true = np.asarray([0.3, 0.4], np.float32)
    conj = inf.NIGVectorAutoregression(2, obs_scale=0.1, v0=4.0, a0=2.0, b0=0.3)
    ssm = conj.build_model(
        (jnp.asarray(a_true), jnp.zeros(2), jnp.asarray(sig_true))
    )
    _, y = ssm.sample_states(jax.random.PRNGKey(16), 500).get_paths()

    res = inf.StorvikFilter(conj, 2000).fit(jax.random.PRNGKey(17), y)
    a_m, b_m, s2_m = [np.asarray(m)[-1] for m in res.param_means]
    assert np.abs(a_m - a_true).max() < 0.12, a_m
    assert np.abs(b_m).max() < 0.12, b_m
    assert np.abs(np.sqrt(s2_m) - sig_true).max() < 0.1, np.sqrt(s2_m)
    assert np.isfinite(float(res.log_likelihood))


@pytest.mark.slow
def test_storvik_unknown_obs_matches_pmmh():
    """Same bar as the round-4 block: the unknown-observation-variance
    posterior at T matches a PMMH batch posterior within combined MC error."""
    y = make_data(n=300, seed=18)
    conj = inf.NIGARUnknownObsVariance(v0=4.0, a0=2.0, b0=0.5, c0=2.0, d0=0.1)
    res = inf.StorvikFilter(conj, 4000).fit(jax.random.PRNGKey(19), y)
    a_m, b_m, s2_m, sy2_m = [float(np.asarray(m)[-1]) for m in res.param_means]

    def build_model(ctx):
        alpha = ctx.named_parameter("alpha", dist.Normal(0.0, 2.0))
        beta = ctx.named_parameter("beta", dist.Normal(0.0, 2.0))
        sigma = ctx.named_parameter("sigma", dist.LogNormal(-1.0, 1.0))
        s_obs = ctx.named_parameter("s_obs", dist.LogNormal(-1.5, 1.0))
        return ts.LinearStateSpaceModel(models.AR(alpha, beta, sigma), (1.0, s_obs))

    with inf.make_context(key=jax.random.PRNGKey(20)) as ctx:
        alg = inf.PMMH(
            pf.SISR(build_model, 200), 400, num_chains=4,
            proposal=inf.AdaptiveRandomWalk(initial_scale=5e-2),
            context=ctx, key=jax.random.PRNGKey(21),
        )
        pm = alg.fit(y, logging=inf.logging.DefaultLogger())
    arr = pm.as_arrays()
    post = {k: float(v[200:].mean()) for k, v in arr.items()}
    post_std = {k: float(v[200:].std()) + 1e-3 for k, v in arr.items()}

    assert abs(a_m - post["alpha"]) < 3.5 * post_std["alpha"], (a_m, post)
    assert abs(b_m - post["beta"]) < 3.5 * post_std["beta"], (b_m, post)
    assert abs(np.sqrt(s2_m) - post["sigma"]) < 3.5 * post_std["sigma"], (s2_m, post)
    assert abs(np.sqrt(sy2_m) - post["s_obs"]) < 3.5 * post_std["s_obs"], (sy2_m, post)


def test_fused_resample_bit_matches_take_path():
    """The fused Pallas expansion resample (``fused_resample=True``,
    interpret-mode off-TPU) must reproduce the search-based
    systematic + gather path BIT-EXACTLY: same scalar ``u`` from the same
    key, bit-equal ancestor assignment, so the whole online pass —
    likelihood, running posterior means, final cloud — is bit-identical."""
    y = make_data(80)
    conj = inf.NIGAutoregression(
        obs_coeff=1.0, obs_scale=OBS_STD, m0=(0.0, 0.0), v0=4.0, a0=2.0, b0=0.5
    )
    # ess_threshold > 1 forces the resample branch every step
    base = inf.StorvikFilter(conj, 512, ess_threshold=1.1, fused_resample=False).fit(
        jax.random.PRNGKey(7), y
    )
    fused = inf.StorvikFilter(conj, 512, ess_threshold=1.1, fused_resample=True).fit(
        jax.random.PRNGKey(7), y
    )
    np.testing.assert_array_equal(
        np.asarray(base.log_likelihood), np.asarray(fused.log_likelihood)
    )
    for a, b in zip(base.param_means, fused.param_means):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(base.values), np.asarray(fused.values))
