"""TPU-optimized ops: counts resampler (see test_resampling), the fused
Pallas observation step, and the fused Pallas resample+gather expansion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
from pyfilter_tpu import examples
from pyfilter_tpu.ops import systematic_counts, systematic_expand
from pyfilter_tpu.utils import batched_gather


def _model():
    return examples.stochastic_volatility_model(0.1, 1.0, 0.05, 0.0, 0.0, 1.0, dt=0.2)


@pytest.mark.parametrize(
    "n",
    [257, 1000, pytest.param(4096, marks=pytest.mark.slow), 9001],
)
@pytest.mark.parametrize(
    "event", [(), (2,), pytest.param((3, 2), marks=pytest.mark.slow)]
)
def test_systematic_expand_matches_counts_resampler(key, n, event):
    """The Pallas expansion must reproduce counts-inversion + gather
    bit-for-bit (same counts arithmetic, exact one-hot selection)."""
    k_w, k_v, k_u = jax.random.split(key, 3)
    lw = jax.random.normal(k_w, (n,)) * 2.0
    vals = jax.random.normal(k_v, (n, *event))
    u = jax.random.uniform(k_u, ())

    ref_idx = systematic_counts(None, lw, u=u)
    ref_vals = batched_gather(vals, ref_idx, len(event))

    out_vals, idx = systematic_expand(None, lw, vals, u=u)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_array_equal(np.asarray(out_vals), np.asarray(ref_vals))


def test_systematic_expand_multiple_arrays_and_jit(key):
    n = 2048
    k_w, k_v = jax.random.split(key)
    lw = jax.random.normal(k_w, (n,))
    vals = jax.random.normal(k_v, (n, 2))

    fn = jax.jit(lambda w, v, p, u: systematic_expand(None, w, (v, p), u=u))
    (out_vals, out_prew), idx = fn(lw, vals, lw, jnp.float32(0.25))
    ref_idx = systematic_counts(None, lw, u=jnp.float32(0.25))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_array_equal(np.asarray(out_prew), np.asarray(lw)[np.asarray(ref_idx)])
    np.testing.assert_array_equal(
        np.asarray(out_vals), np.asarray(vals)[np.asarray(ref_idx)]
    )


@pytest.mark.parametrize("hot", [0, 17, 4095])
def test_systematic_expand_degenerate_weights_fallback(hot):
    """All mass on one particle: window spans overflow the static bound and
    the scalar check must route to the XLA fallback — still exact."""
    n = 4096
    lw = jnp.full((n,), -jnp.inf).at[hot].set(0.0)
    vals = jnp.arange(n, dtype=jnp.float32)
    out_vals, idx = systematic_expand(None, lw, vals, u=jnp.float32(0.5))
    assert bool((idx == hot).all())
    assert bool((out_vals == float(hot)).all())


def test_systematic_expand_zero_count_runs(key):
    """Alternating zero-weight runs exercise window skew without overflow."""
    n = 4096
    lw = jnp.where(jnp.arange(n) % 3 == 0, 0.0, -jnp.inf)
    u = jnp.float32(0.7)
    ref_idx = systematic_counts(None, lw, u=u)
    out_vals, idx = systematic_expand(None, lw, jnp.arange(n, dtype=jnp.float32), u=u)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_array_equal(np.asarray(out_vals), np.asarray(ref_idx, np.float32))


def test_systematic_expand_blocked_tables(key, monkeypatch):
    """The blocked-SMEM-table regime (real threshold: clouds past ~4M, where
    whole tables would overflow SMEM) exercised at an interpret-mode-friendly
    size by shrinking the threshold: 3 groups forces the (8, GROUP) table
    blocks AND the group-padding path (3 -> 8 rows), still bit-exact."""
    from pyfilter_tpu.ops import expand

    monkeypatch.setattr(expand, "_BLOCKED_MIN_GROUPS", 1)
    n = 3 * expand._GROUP * expand._B  # 3 groups -> padded to 8 table rows
    k_w, k_v, k_u = jax.random.split(key, 3)
    lw = jax.random.normal(k_w, (n,)) * 2.0
    vals = jax.random.normal(k_v, (n,))
    u = jax.random.uniform(k_u, ())

    ref_idx = systematic_counts(None, lw, u=u)
    out_vals, idx = systematic_expand(None, lw, vals, u=u)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_array_equal(
        np.asarray(out_vals), np.asarray(vals)[np.asarray(ref_idx)]
    )


@pytest.mark.parametrize("cls", [pf.SISR, pf.APF])
@pytest.mark.parametrize("batch_shape", [(), (4,)])
def test_fused_resample_filter_matches_standard(key, cls, batch_shape):
    """A filter with the fused Pallas resample (single-lane or lane-batched)
    must reproduce the counts-inversion run (same keys, same u).

    Tolerance, not bitwise: the two variants are separate XLA programs, and
    the compiler may contract the weight computation differently between
    them (FMA/reassociation varies with the surrounding fusion); an
    ulp-level weight difference can legitimately flip one resample boundary
    and perturb the trajectory. The engineered bitwise guarantee — the
    expansion kernel equals counts inversion + gather on IDENTICAL inputs —
    is pinned by the test_systematic_expand_* tests above."""
    model = _model()
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(0.0, 0.5, 12).astype(np.float32))

    base = cls(model, 512, record_states=True, fused_resample=False, batch_shape=batch_shape)
    fused = cls(model, 512, record_states=True, fused_resample=True, batch_shape=batch_shape)

    r1 = base.batch_filter(key, y)
    r2 = fused.batch_filter(key, y)
    np.testing.assert_allclose(
        np.asarray(r1.log_likelihood),
        np.asarray(r2.log_likelihood),
        rtol=1e-2,
        atol=1e-2,
    )
    m1 = np.asarray(r1.states.values).mean(axis=1)
    m2 = np.asarray(r2.states.values).mean(axis=1)
    np.testing.assert_allclose(m1, m2, rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize(
    "n,batch",
    [
        (400, (16,)),   # lane-blocked kernel, aligned n
        (257, (5,)),    # lane-blocked kernel, padded sources AND lanes
        (400, (4, 3)),  # multi-dim lane batch
        (3000, (3,)),   # exceeds the VMEM budget -> global windowed path
    ],
)
def test_systematic_expand_lanes_matches_counts_resampler(key, n, batch):
    from pyfilter_tpu.ops import systematic_expand_lanes

    k_w, k_v, k_u = jax.random.split(key, 3)
    lw = jax.random.normal(k_w, (n, *batch))
    vals = jax.random.normal(k_v, (n, *batch, 2))
    u = jax.random.uniform(k_u, batch)
    ref_idx = systematic_counts(None, lw, u=u)
    (out_vals, out_w), idx = systematic_expand_lanes(None, lw, (vals, lw), u=u)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_array_equal(
        np.asarray(out_vals), np.asarray(batched_gather(vals, ref_idx, 1))
    )
    np.testing.assert_array_equal(
        np.asarray(out_w), np.asarray(batched_gather(lw, ref_idx, 0))
    )


@pytest.mark.parametrize(
    "n,batch,scale",
    [
        (400, (16,), 1.0),   # healthy weights -> narrow band tier
        (400, (200,), 1.0),  # multi-lane-block tables
        (257, (5,), 1.0),    # padded sources AND lanes (edge-replicated)
        (400, (16,), 6.0),   # skewed weights -> wide band / full fallback
        (72, (16,), 1.0),    # n_pad barely above the narrow window
        (40, (16,), 1.0),    # n_pad below every window -> full kernel only
    ],
)
def test_systematic_expand_lanes_banded(key, n, batch, scale):
    """The banded lane kernel (windowed source scan per output tile) must be
    bit-identical to counts inversion across band tiers and fallbacks."""
    from pyfilter_tpu.ops import systematic_expand_lanes

    k_w, k_v, k_u = jax.random.split(key, 3)
    lw = jax.random.normal(k_w, (n, *batch)) * scale
    vals = jax.random.normal(k_v, (n, *batch))
    u = jax.random.uniform(k_u, batch)
    ref_idx = systematic_counts(None, lw, u=u)
    out_vals, idx = systematic_expand_lanes(None, lw, vals, u=u, banded=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_array_equal(
        np.asarray(out_vals), np.asarray(batched_gather(vals, ref_idx, 0))
    )


def test_band_tables_flags(key):
    """The band fit flag must accept healthy per-lane profiles and reject a
    degenerate lane whose spans exceed the window."""
    from pyfilter_tpu.ops import expand

    n, lanes = 400, 128
    # healthy: near-uniform weights -> counts ~ diagonal, tiny spans
    lw = jax.random.normal(key, (n, lanes)) * 0.1
    probs = jax.nn.softmax(lw, axis=0)
    cum = jnp.cumsum(probs, axis=0).at[-1].set(1.0)
    counts = jnp.clip(jnp.ceil(n * cum - 0.5), 0, n).astype(jnp.int32).at[-1].set(n)
    _, ok = expand._band_tables(counts, n, expand._BAND_WINDOWS[0])
    assert bool(ok)

    # one degenerate lane: all mass on particle 0 -> a full-length zero run
    lw_bad = lw.at[:, 7].set(-jnp.inf).at[0, 7].set(0.0)
    probs = jax.nn.softmax(lw_bad, axis=0)
    cum = jnp.cumsum(probs, axis=0).at[-1].set(1.0)
    counts = jnp.clip(jnp.ceil(n * cum - 0.5), 0, n).astype(jnp.int32).at[-1].set(n)
    _, ok_bad = expand._band_tables(counts, n, expand._BAND_WINDOWS[1])
    assert not bool(ok_bad)


def test_systematic_expand_u_one_edge(key):
    """``jax.random.uniform`` can round to exactly 1.0 in f32; the last
    copy-count boundary must stay pinned to n or the final output position
    selects nothing (observed as a silently-zeroed particle at 6.4M).
    Both expansion paths must match the self-clamping counts inversion."""
    from pyfilter_tpu.ops import systematic_expand_lanes

    n = 512
    k_w, k_v = jax.random.split(key)
    lw = jax.random.normal(k_w, (n,))
    vals = jax.random.normal(k_v, (n,))
    u1 = jnp.asarray(1.0)
    ref = systematic_counts(None, lw, u=u1)
    assert int(np.asarray(ref).max()) < n
    out, idx = systematic_expand(None, lw, vals, u=u1)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(vals)[np.asarray(ref)]
    )

    batch = (4,)
    lw_b = jax.random.normal(k_w, (n, *batch))
    vals_b = jax.random.normal(k_v, (n, *batch))
    u_b = jnp.ones(batch)
    ref_b = systematic_counts(None, lw_b, u=u_b)
    out_b, idx_b = systematic_expand_lanes(None, lw_b, vals_b, u=u_b)
    np.testing.assert_array_equal(np.asarray(idx_b), np.asarray(ref_b))
    np.testing.assert_array_equal(
        np.asarray(out_b), np.asarray(batched_gather(vals_b, ref_b, 0))
    )


@pytest.mark.parametrize("batch_shape", [(), (64,)])
def test_propagate_substeps_matches_per_step_law(key, batch_shape):
    """The affine batched-noise sub-step fast path must advance time like the
    per-step loop and stay distributionally sane (lane-batched params too)."""
    from pyfilter_tpu.timeseries import TimeseriesState

    hidden = _model().hidden
    n, n_sub = 400, 4
    value = jnp.abs(jax.random.normal(key, (n, *batch_shape))) + 0.5
    if batch_shape:
        kappa = jnp.abs(jax.random.normal(jax.random.PRNGKey(5), batch_shape)) * 0.2
        hidden = hidden.copy_with((kappa,) + hidden.parameters[1:])
    x0 = TimeseriesState(jnp.asarray(3.0), value, 0)

    out = hidden.propagate_substeps(key, x0, n_sub)
    assert float(out.time_index) == 3.0 + n_sub
    assert out.value.shape == value.shape
    assert np.isfinite(np.asarray(out.value)).all()
    # Verhulst stays positive and mean-reverts toward gamma=1
    assert (np.asarray(out.value) > 0).all()


@pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="measures the compiled kernel on real TPU"
)
def test_systematic_expand_tpu_accuracy(key):
    """Real-hardware check of the compiled (non-interpret) expansion kernel."""
    n = 1 << 17
    k_w, k_v = jax.random.split(key)
    lw = jax.random.normal(k_w, (n,))
    vals = jax.random.normal(k_v, (n, 3))
    u = jnp.float32(0.42)
    ref_idx = systematic_counts(None, lw, u=u)
    out, idx = systematic_expand(None, lw, vals, u=u)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(vals)[np.asarray(ref_idx)])


def test_auto_fused_resample_honors_explicit_systematic(monkeypatch):
    """Auto mode routes through the expansion kernel only for the default
    counts-inversion resampler; an explicit ``resampling.systematic`` (the
    reference-exact search-based variant) must never be silently rerouted
    (regression). ``fused_resample=True`` remains the explicit opt-in."""
    from pyfilter_tpu import resampling
    from pyfilter_tpu.ops import systematic_counts

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    n = 1 << 15
    w = jnp.zeros((n,), jnp.float32)

    auto = pf.SISR(_model(), n)
    assert auto.resampler is systematic_counts
    assert auto._use_fused_resample(w)

    exact = pf.SISR(_model(), n, resampling_method=resampling.systematic)
    assert not exact._use_fused_resample(w)

    forced = pf.SISR(
        _model(), n, resampling_method=resampling.systematic, fused_resample=True
    )
    assert forced._use_fused_resample(w)
