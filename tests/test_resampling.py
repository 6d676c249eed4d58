"""Resampling tests.

Mirrors the reference's strategy (tests/test_resampling.py:8-47): inject explicit
uniforms into ``systematic`` and compare index-for-index against an independent
straight-line numpy implementation of the textbook algorithm.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyfilter_tpu import resampling
from pyfilter_tpu.utils import normalize


def numpy_systematic(weights: np.ndarray, u: float) -> np.ndarray:
    """Textbook O(N) systematic resampling loop (the filterpy algorithm)."""
    n = len(weights)
    positions = (np.arange(n) + u) / n
    indexes = np.zeros(n, dtype=np.int64)
    cumsum = np.cumsum(weights)
    cumsum[-1] = 1.0
    i, j = 0, 0
    while i < n:
        if positions[i] < cumsum[j]:
            indexes[i] = j
            i += 1
        else:
            j += 1
    return indexes


@pytest.mark.parametrize("n", [10, 100, 1000])
@pytest.mark.parametrize("u", [0.0, 0.12345, 0.9999])
def test_systematic_matches_reference_loop(n, u):
    rng = np.random.default_rng(42)
    w = rng.random(n)
    w = w / w.sum()
    expected = numpy_systematic(w, u)
    got = np.asarray(resampling.systematic(None, jnp.asarray(w), normalized=True, u=jnp.asarray(u)))
    _assert_indices_close(got, expected)


def _assert_indices_close(got, expected):
    """Index-for-index match, tolerating the rare off-by-one from float32 cumsum
    rounding at stratum boundaries (the numpy oracle accumulates in float64)."""
    diff = got != expected
    assert np.abs(got - expected).max(initial=0) <= 1
    assert diff.mean() <= 0.005, f"{diff.sum()} / {diff.size} indices differ"


def test_systematic_batched_matches_per_lane(key):
    rng = np.random.default_rng(0)
    n, b = 64, 5
    w = rng.random((n, b))
    w = w / w.sum(0)
    u = rng.random(b)
    got = resampling.systematic(None, jnp.asarray(w), normalized=True, u=jnp.asarray(u))
    for lane in range(b):
        expected = numpy_systematic(w[:, lane], u[lane])
        _assert_indices_close(np.asarray(got[:, lane]), expected)


def test_systematic_accepts_log_weights(key):
    n = 128
    log_w = jax.random.normal(key, (n,))
    idx1 = resampling.systematic(None, log_w, u=jnp.asarray(0.5))
    idx2 = resampling.systematic(None, normalize(log_w), normalized=True, u=jnp.asarray(0.5))
    np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))


@pytest.mark.parametrize(
    "scheme", ["systematic", "stratified", "multinomial", "residual", "metropolis", "rejection"]
)
@pytest.mark.parametrize("batch_shape", [(), (3,)])
def test_schemes_are_unbiased_and_in_range(key, scheme, batch_shape):
    fn = getattr(resampling, scheme)
    n = 2000
    rng = np.random.default_rng(7)
    w = rng.random((n, *batch_shape))
    w = w / w.sum(0)
    idx = fn(key, jnp.asarray(w), normalized=True)
    idx = np.asarray(idx)
    assert idx.shape == (n, *batch_shape)
    assert idx.min() >= 0 and idx.max() < n
    # resampled counts should approximate n * w; the ratio-based schemes have
    # the multinomial law (metropolis approximately, at the default n_iter)
    loose = scheme in ("multinomial", "metropolis", "rejection")
    flatw = w.reshape(n, -1)
    flati = idx.reshape(n, -1)
    for lane in range(flatw.shape[1]):
        counts = np.bincount(flati[:, lane], minlength=n)
        err = np.abs(counts / n - flatw[:, lane]).max()
        assert err < (0.05 if loose else 0.02)


def test_degenerate_weights_resample_uniformly(key):
    # all -inf log-weights -> normalize backfills uniform (reference utils.py:62)
    n = 100
    log_w = jnp.full((n,), -jnp.inf)
    idx = resampling.systematic(key, log_w)
    counts = np.bincount(np.asarray(idx), minlength=n)
    assert counts.max() == 1  # uniform weights + systematic = exact permutation


def test_point_mass_resamples_to_single_index(key):
    n = 50
    w = jnp.zeros((n,)).at[17].set(1.0)
    for scheme in (resampling.systematic, resampling.stratified, resampling.multinomial):
        idx = scheme(key, w, normalized=True)
        assert np.all(np.asarray(idx) == 17)
    # rejection is exact for any degeneracy (the while_loop redraws until the
    # sole live particle is hit); metropolis needs its chain to propose it at
    # least once per slot — n_iter large enough that P(miss) ~ (1-1/n)^B
    idx = resampling.rejection(key, w, normalized=True)
    assert np.all(np.asarray(idx) == 17)
    idx = resampling.metropolis(key, w, normalized=True, n_iter=1000)
    assert np.all(np.asarray(idx) == 17)


def test_metropolis_bias_decays_in_chain_length(key):
    """The slot law converges to multinomial geometrically in n_iter
    (arXiv:1202.6163 §3.2). A single draw's count error is dominated by the
    multinomial sampling floor, so measure the BIAS: expected ancestor
    frequencies over many independent keys. At n_iter=2 the chains still sit
    near their uniform start; at n_iter=64 the law must be close to w."""
    n, n_keys = 256, 256
    rng = np.random.default_rng(11)
    w = rng.random(n) ** 3  # moderately degenerate
    w = w / w.sum()
    keys = jax.random.split(key, n_keys)

    def bias(n_iter):
        idx = jax.vmap(
            lambda k: resampling.metropolis(k, jnp.asarray(w), normalized=True, n_iter=n_iter)
        )(keys)
        counts = np.bincount(np.asarray(idx).ravel(), minlength=n)
        return np.abs(counts / (n * n_keys) - w).sum()  # L1 bias of the slot law

    assert bias(64) < 0.3 * bias(2)


def test_ratio_schemes_jit_and_vmap_safe(key):
    n = 256
    w = jax.random.uniform(key, (n, 4))
    for fn in (resampling.metropolis, resampling.rejection):
        idx = jax.jit(lambda k, lw, f=fn: f(k, lw))(key, jnp.log(w))
        assert idx.shape == (n, 4) and idx.dtype == jnp.int32
        vm = jax.vmap(lambda k, lw, f=fn: f(k, lw), in_axes=(0, 1), out_axes=1)
        idx2 = vm(jax.random.split(key, 4), jnp.log(w))
        assert idx2.shape == (n, 4)


def test_residual_deterministic_part():
    # a weight of exactly k/n must appear at least k times
    n = 10
    w = np.array([0.5, 0.2, 0.1] + [0.2 / 7] * 7)
    w = w / w.sum()
    idx = np.asarray(resampling.residual(jax.random.PRNGKey(3), jnp.asarray(w), normalized=True))
    counts = np.bincount(idx, minlength=n)
    assert counts[0] >= 5
    assert counts[1] >= 2
    assert counts[2] >= 1


def test_jit_and_vmap_safe(key):
    n = 256
    w = jax.random.uniform(key, (n, 4))
    jitted = jax.jit(lambda k, lw: resampling.systematic(k, lw))
    idx = jitted(key, jnp.log(w))
    assert idx.shape == (n, 4)
    vm = jax.vmap(lambda k, lw: resampling.systematic(k, lw), in_axes=(0, 1), out_axes=1)
    idx2 = vm(jax.random.split(key, 4), jnp.log(w))
    assert idx2.shape == (n, 4)


def test_systematic_counts_matches_search(key):
    """ops.systematic_counts is a drop-in for resampling.systematic: identical
    indices up to ULP-level ties at weight boundaries."""
    import numpy as np
    from pyfilter_tpu.ops import systematic_counts
    from pyfilter_tpu.resampling import systematic

    rng = np.random.default_rng(0)
    total_disagree = 0
    total = 0
    for n in (10, 100, 1000, 10_000):
        for trial in range(10):
            w = jnp.asarray(rng.normal(size=n).astype(np.float32))  # log-weights
            u = jnp.asarray(rng.uniform())
            a = np.asarray(systematic(None, w, u=u))
            b = np.asarray(systematic_counts(None, w, u=u))
            assert (np.diff(b) >= 0).all() and b.min() >= 0 and b.max() < n
            total_disagree += int((a != b).sum())
            total += n
    assert total_disagree / total < 1e-3, total_disagree

    # systematic guarantee: copy counts within 1 of N * w
    n = 50_000
    lw = jnp.asarray(rng.normal(size=n).astype(np.float32)) * 0.5
    probs = np.exp(np.asarray(lw, np.float64)); probs /= probs.sum()
    idx = np.asarray(systematic_counts(jax.random.PRNGKey(0), lw))
    counts = np.bincount(idx, minlength=n)
    assert np.abs(counts - n * probs).max() <= 1.0 + 1e-3

    # batched lanes
    wb = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
    idxb = systematic_counts(jax.random.PRNGKey(1), wb)
    assert idxb.shape == (256, 3)
