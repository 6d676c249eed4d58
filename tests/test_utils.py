"""Tests for core weight numerics (normalize / ESS / log-likelihood / moments)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyfilter_tpu import utils


def test_normalize_basic(key):
    lw = jax.random.normal(key, (100,))
    p = utils.normalize(lw)
    np.testing.assert_allclose(np.asarray(p.sum()), 1.0, rtol=1e-5)
    expected = np.exp(np.asarray(lw) - np.asarray(lw).max())
    expected /= expected.sum()
    np.testing.assert_allclose(np.asarray(p), expected, rtol=1e-5)


def test_normalize_scrubs_nan_and_posinf():
    lw = jnp.array([0.0, jnp.nan, jnp.inf, 1.0])
    p = np.asarray(utils.normalize(lw))
    assert p[1] == 0.0 and p[2] == 0.0
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)


def test_normalize_backfills_dead_lanes():
    # one lane all -inf -> uniform backfill (reference utils.py:57-62)
    lw = jnp.stack([jnp.zeros(4), jnp.full(4, -jnp.inf)], axis=1)
    p = np.asarray(utils.normalize(lw))
    np.testing.assert_allclose(p[:, 0], 0.25, rtol=1e-6)
    np.testing.assert_allclose(p[:, 1], 0.25, rtol=1e-6)


@pytest.mark.parametrize("batch_shape", [(), (3,)])
def test_ess(key, batch_shape):
    n = 100
    lw = jnp.zeros((n, *batch_shape))
    ess = np.asarray(utils.get_ess(lw))
    np.testing.assert_allclose(ess, n, rtol=1e-5)
    # degenerate: one particle has all the mass
    lw2 = jnp.full((n, *batch_shape), -1e9).at[0].set(0.0)
    np.testing.assert_allclose(np.asarray(utils.get_ess(lw2)), 1.0, rtol=1e-5)


def test_log_likelihood_uniform_weights(key):
    inc = jax.random.normal(key, (1000,))
    ll = utils.log_likelihood(inc)
    expected = np.log(np.mean(np.exp(np.asarray(inc, np.float64))))
    np.testing.assert_allclose(np.asarray(ll), expected, rtol=1e-4)


def test_log_likelihood_weighted(key):
    k1, k2 = jax.random.split(key)
    inc = jax.random.normal(k1, (500,))
    w = utils.normalize(jax.random.normal(k2, (500,)))
    ll = utils.log_likelihood(inc, w)
    expected = np.log(np.sum(np.asarray(w, np.float64) * np.exp(np.asarray(inc, np.float64))))
    np.testing.assert_allclose(np.asarray(ll), expected, rtol=1e-4)


def test_weighted_mean_and_variance(key):
    n = 50_000
    x = jax.random.normal(key, (n,)) * 2.0 + 3.0
    probs = jnp.full((n,), 1.0 / n)
    mean, var = utils.get_mean_and_variance(x, probs)
    np.testing.assert_allclose(np.asarray(mean), 3.0, atol=0.05)
    np.testing.assert_allclose(np.asarray(var), 4.0, rtol=0.05)


def test_weighted_moments_vector_event(key):
    n = 20_000
    x = jax.random.normal(key, (n, 2)) @ jnp.array([[1.0, 0.5], [0.0, 1.0]])
    probs = jnp.full((n,), 1.0 / n)
    mean, cov = utils.get_mean_and_variance(x, probs, event_ndim=1, covariance=True)
    assert mean.shape == (2,) and cov.shape == (2, 2)
    expected_cov = np.array([[1.0, 0.5], [0.5, 1.25]])
    np.testing.assert_allclose(np.asarray(cov), expected_cov, atol=0.06)


def test_batched_gather(key):
    n, b, d = 10, 3, 2
    x = jax.random.normal(key, (n, b, d))
    idx = jnp.zeros((n, b), dtype=jnp.int32)
    out = utils.batched_gather(x, idx)
    np.testing.assert_allclose(np.asarray(out), np.broadcast_to(np.asarray(x[0]), (n, b, d)))


def test_construct_diag_from_flat():
    x = jnp.array([1.0, 2.0, 3.0])
    d = np.asarray(utils.construct_diag_from_flat(x))
    np.testing.assert_allclose(d, np.diag([1.0, 2.0, 3.0]))
    s = np.asarray(utils.construct_diag_from_flat(jnp.asarray(2.0), event_ndim=0))
    assert s.shape == (1, 1) and s[0, 0] == 2.0


def test_enable_compile_cache(tmp_path):
    """Public compile-cache helper (README 'Compile times'): sets the
    persistent-cache config knobs and creates a HOST-FINGERPRINTED
    subdirectory, so caches written by different-CPU hosts are never loaded
    (the cross-host AOT-poisoning hazard documented in CLAUDE.md)."""
    import os

    import pyfilter_tpu as pf
    from pyfilter_tpu.compile_cache import host_fingerprint

    old = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        fp = host_fingerprint()
        assert len(fp) == 12 and fp == host_fingerprint()  # stable

        target = str(tmp_path / "xla_cache")
        path = pf.enable_compile_cache(target, min_compile_time_secs=2.0)
        assert path == os.path.join(target, fp) and os.path.isdir(path)
        assert jax.config.jax_compilation_cache_dir == path
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 2.0

        # a foreign host's cache (different fingerprint subdir) is invisible:
        # inject one and verify the effective dir still isn't it
        foreign = os.path.join(target, "deadbeef0000")
        os.makedirs(foreign)
        with open(os.path.join(foreign, "jit_poison-cache"), "w") as fh:
            fh.write("not a real executable")
        path2 = pf.enable_compile_cache(target, min_compile_time_secs=2.0)
        assert path2 == path != foreign

        # opt-out for feature-identical fleets
        flat = str(tmp_path / "flat_cache")
        path3 = pf.enable_compile_cache(flat, per_host=False)
        assert path3 == flat
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", old_min)
