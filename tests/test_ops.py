"""TPU-optimized ops: counts resampler (see test_resampling) and the fused
Pallas observation step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
from pyfilter_tpu import examples


def _model():
    return examples.stochastic_volatility_model(0.1, 1.0, 0.05, 0.0, 0.0, 1.0, dt=0.2)


def test_fused_bootstrap_filter_structure(key):
    """Interpreter-mode structural check: the TPU-interpret PRNG is a stub
    (all-zero bits), so only shapes/finiteness/NaN-scrub robustness are
    checkable off-TPU. Accuracy is asserted on real TPU hardware in
    ``test_fused_bootstrap_filter_accuracy_tpu`` (verified at N=32k:
    fused -19.156 vs standard -19.145)."""
    from jax.experimental.pallas import tpu as pltpu

    from pyfilter_tpu.ops.fused import fused_bootstrap_filter

    model = _model()
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0.0, 0.5, 5).astype(np.float32))

    n = 8192
    with pltpu.force_tpu_interpret_mode():
        ll, x_last, lw_last = fused_bootstrap_filter(model, y, n, jax.random.PRNGKey(0), 0.9, 5)
    assert x_last.shape == (n,)
    assert lw_last.shape == (n,)
    # degenerate stub-PRNG dynamics must still be scrubbed, not NaN
    assert not np.isnan(float(ll))

    # unsupported model -> clear error
    with pytest.raises(ValueError, match="scalar-state"):
        fused_bootstrap_filter(examples.lorenz63_model(), y, n, jax.random.PRNGKey(0), 0.9, 1)


@pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs real TPU PRNG (interpret mode stubs it)"
)
def test_fused_bootstrap_filter_accuracy_tpu(key):
    from pyfilter_tpu.ops.fused import fused_bootstrap_filter

    model = _model()
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0.0, 0.5, 15).astype(np.float32))

    n = 8192 * 4
    ll_fused, _, _ = fused_bootstrap_filter(model, y, n, jax.random.PRNGKey(0), 0.9, 5)
    ref = pf.SISR(model, n, record_moments=False).batch_filter(jax.random.PRNGKey(0), y)
    ll_ref = float(ref.log_likelihood)
    assert abs(float(ll_fused) - ll_ref) / abs(ll_ref) < 0.15, (float(ll_fused), ll_ref)
