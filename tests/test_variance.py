"""Genealogy-based single-run variance estimators (Chan-Lai / Lee-Whiteley).

Ground truth comes from replicate filters: the lane axis runs R independent
filters in one compiled pass, so the empirical variance across lanes of the
log-likelihood / filter means is the quantity the estimators must match
(within the MC error of a variance-of-variances with R replicates).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyfilter_tpu import resampling, timeseries as ts
from pyfilter_tpu.filters.particle import (
    SISR,
    eve_indices,
    filter_mean_variance,
    lag_ancestor_indices,
    log_likelihood_variance,
)
from pyfilter_tpu.timeseries import models

ALPHA, BETA, SIGMA, OBS_STD = 0.2, 0.7, 0.4, 0.3


def ar_ssm():
    return ts.LinearStateSpaceModel(models.AR(ALPHA, BETA, SIGMA), (1.0, OBS_STD))


def simulate(t, seed):
    rng = np.random.default_rng(seed)
    x = ALPHA
    ys = []
    for _ in range(t):
        x = ALPHA + BETA * x + SIGMA * rng.standard_normal()
        ys.append(x + OBS_STD * rng.standard_normal())
    return jnp.asarray(ys, jnp.float32)


def np_eves(prev):
    t, n = prev.shape[:2]
    e = np.arange(n)
    out = []
    for s in range(t):
        e = e[prev[s]]
        out.append(e.copy())
    return np.stack(out)


def test_eve_composition_matches_manual_loop():
    rng = np.random.default_rng(0)
    prev = rng.integers(0, 8, size=(6, 8)).astype(np.int32)
    got = np.asarray(eve_indices(jnp.asarray(prev)))
    np.testing.assert_array_equal(got, np_eves(prev))


def test_lag_ancestors_cover_all_equals_eve():
    rng = np.random.default_rng(1)
    prev = jnp.asarray(rng.integers(0, 16, size=(5, 16, 3)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(lag_ancestor_indices(prev, lag=5)),
        np.asarray(eve_indices(prev)),
    )
    # lag=1 is the raw parent map
    np.testing.assert_array_equal(
        np.asarray(lag_ancestor_indices(prev, lag=1)), np.asarray(prev)
    )


@pytest.fixture(scope="module")
def replicate_run():
    """One lane-batched run: R=384 independent N=128 bootstrap filters,
    multinomial resampling at every step (the estimators' exact-theory
    regime). Sizes are tuned to the fast tier: multinomial-per-step costs
    O(N^2 R) Gumbel draws per step on CPU (categorical materializes the
    (N, R, N) noise), so N=256/R=768 measured 47 s where this runs in
    ~10 s with MC bands that still separate right from wrong constants."""
    y = simulate(20, seed=7)
    filt = SISR(
        ar_ssm(),
        128,
        resampling_method=resampling.multinomial,
        ess_threshold=1.1,  # ESS <= N < 1.1 N: resample every step
        record_states=True,
        batch_shape=(384,),
        fused_resample=False,
    )
    res = filt.batch_filter(jax.random.PRNGKey(3), y)
    return res


def test_loglik_variance_matches_replicates(replicate_run):
    res = replicate_run
    est = log_likelihood_variance(res)
    # estimator value for each lane at the final step; theory regime
    mean_est = float(jnp.mean(est.variance[-1]))
    emp = float(jnp.var(res.log_likelihood))
    assert 0.5 * emp < mean_est < 1.7 * emp
    # cumulative variance must grow with t (statistically, endpoints); the
    # initial-cloud entry (uniform weights, identity Eves) is exactly 0
    assert float(jnp.mean(est.variance[-1])) > float(jnp.mean(est.variance[1]))
    np.testing.assert_allclose(np.asarray(est.sigma2[0]), 0.0, atol=1e-5)
    # history-aligned shapes: (T+1, R)
    t_steps, r = res.step_log_likelihoods.shape
    assert est.sigma2.shape == (t_steps + 1, r)


def test_filter_mean_variance_matches_replicates(replicate_run):
    res = replicate_run
    est = filter_mean_variance(res)
    # compare at a few time points: mean estimator vs across-lane variance of
    # the recorded filter means
    # history index t+1 <-> filter_means index t (initial cloud at index 0);
    # the lower band absorbs the late-t coalescence bias at N=128 (T/N=0.16)
    for t in (4, 12, 19):
        mean_est = float(jnp.mean(est.variance[t + 1]))
        emp = float(jnp.var(res.filter_means[t]))
        assert 0.4 * emp < mean_est < 2.0 * emp, (t, mean_est, emp)


def test_degeneracy_diagnostic_and_lag(replicate_run):
    res = replicate_run
    full = log_likelihood_variance(res)
    lagged = log_likelihood_variance(res, lag=4)
    # Eve population only shrinks over time; the lag-4 ancestor population is
    # at least as rich as the time-0 one
    n_full = np.asarray(full.n_unique_ancestors, np.int64)
    n_lag = np.asarray(lagged.n_unique_ancestors, np.int64)
    assert (n_full[-1] <= n_full[1] + 1e-9).all()
    assert (n_lag >= n_full).all()
    # the truncated estimator only captures variance accumulated within the
    # lag window: positive, and below the full cumulative estimate
    r = float(jnp.mean(lagged.variance[-1])) / float(jnp.mean(full.variance[-1]))
    assert 0.0 < r < 1.2
    # a lag covering the whole history reproduces the full Eve estimator
    t_hist = res.states.prev_indices.shape[0]
    covered = log_likelihood_variance(res, lag=t_hist)
    np.testing.assert_allclose(
        np.asarray(covered.sigma2), np.asarray(full.sigma2), rtol=1e-5, atol=1e-6
    )


def test_adaptive_systematic_stays_sane():
    """Default regime (ESS-gated systematic): approximate theory, but the
    estimate must stay positive and within a loose band of replicate truth."""
    y = simulate(20, seed=9)
    filt = SISR(ar_ssm(), 256, record_states=True, batch_shape=(768,), fused_resample=False)
    res = filt.batch_filter(jax.random.PRNGKey(5), y)
    est = log_likelihood_variance(res)
    mean_est = float(jnp.mean(est.variance[-1]))
    emp = float(jnp.var(res.log_likelihood))
    assert mean_est > 0
    assert 0.3 * emp < mean_est < 2.5 * emp


def test_requires_recorded_history():
    y = simulate(5, seed=0)
    filt = SISR(ar_ssm(), 64)
    res = filt.batch_filter(jax.random.PRNGKey(0), y)
    with pytest.raises(ValueError, match="record_states"):
        log_likelihood_variance(res)
