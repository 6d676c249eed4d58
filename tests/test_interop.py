"""numpyro interop bridge (reference's pyro.factor integration,
filters/particle/base.py:176-229). numpyro is optional, so the adapter's
contract — look up numpyro, default the key to its per-trace prng_key,
emit the smoothed log-likelihood via numpyro.factor — is tested against a
recording stand-in module; with real numpyro installed the same test runs
against it unchanged."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
from pyfilter_tpu import interop, timeseries as ts
from pyfilter_tpu.timeseries import models


def _ssm(sigma):
    return ts.LinearStateSpaceModel(models.RandomWalk(sigma), (1.0, 0.1))


@pytest.fixture
def fake_numpyro(monkeypatch):
    calls = []
    mod = types.SimpleNamespace(
        factor=lambda name, value: calls.append((name, value)),
        prng_key=lambda: jax.random.PRNGKey(42),
    )
    monkeypatch.setitem(sys.modules, "numpyro", mod)
    return calls


def test_factor_emitted_and_finite(fake_numpyro, key):
    _, y = _ssm(0.05).sample_states(jax.random.PRNGKey(3), 40).get_paths()
    filt = pf.APF(_ssm(0.05), 30)

    ll = interop.numpyro_filter_factor("pf_loglik", filt, y, key=key)

    assert len(fake_numpyro) == 1
    name, value = fake_numpyro[0]
    assert name == "pf_loglik"
    assert value is ll
    assert np.isfinite(float(ll))


def test_factor_defaults_to_numpyro_prng_key(fake_numpyro):
    _, y = _ssm(0.05).sample_states(jax.random.PRNGKey(3), 20).get_paths()
    filt = pf.APF(_ssm(0.05), 20)
    ll = interop.numpyro_filter_factor("pf", filt, y)  # key from prng_key()
    assert np.isfinite(float(ll))

    ll2 = interop.numpyro_filter_factor("pf", filt, y, key=jax.random.PRNGKey(42))
    np.testing.assert_array_equal(np.asarray(ll), np.asarray(ll2))


def test_factor_missing_key_raises(monkeypatch):
    mod = types.SimpleNamespace(factor=lambda *a: None, prng_key=lambda: None)
    monkeypatch.setitem(sys.modules, "numpyro", mod)
    _, y = _ssm(0.05).sample_states(jax.random.PRNGKey(3), 10).get_paths()
    filt = pf.APF(_ssm(0.05), 10)
    with pytest.raises(RuntimeError, match="seed"):
        interop.numpyro_filter_factor("pf", filt, y)


def test_factor_differentiable_through_parameters(fake_numpyro):
    """The factor must be differentiable w.r.t. the sampled SSM parameters —
    that is the whole point of the bridge (the ELBO backprops through it).
    At sigma above the truth the gradient pushes log-sigma down."""
    true_sigma = 0.05
    _, y = _ssm(true_sigma).sample_states(jax.random.PRNGKey(123), 60).get_paths()

    def factor(log_sigma):
        filt = pf.APF(_ssm(jnp.exp(log_sigma)), 40)
        return interop.numpyro_filter_factor(
            "pf", filt, y, key=jax.random.PRNGKey(1)
        )

    val, grad = jax.value_and_grad(factor)(jnp.log(0.3))
    assert np.isfinite(float(val)) and np.isfinite(float(grad))
    assert float(grad) < 0.0


def test_factor_mesh_mode(fake_numpyro, key):
    """mesh= routes the factor through the particle-sharded SPMD pass; the
    value must agree with the single-device factor within FFBS MC noise."""
    from pyfilter_tpu import parallel

    _, y = _ssm(0.05).sample_states(jax.random.PRNGKey(3), 40).get_paths()
    filt = pf.SISR(_ssm(0.05), 512)
    mesh = parallel.make_mesh()

    ll_mesh = interop.numpyro_filter_factor(
        "pf_loglik", filt, y, key=key, mesh=mesh, n_trajectories=128
    )
    assert fake_numpyro and fake_numpyro[-1][0] == "pf_loglik"
    assert np.isfinite(float(ll_mesh))
    ll_single = filt.smoothed_log_likelihood(key, jnp.asarray(y))
    assert abs(float(ll_mesh) - float(ll_single)) < 8.0
