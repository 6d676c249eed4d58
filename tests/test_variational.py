"""SVI via the particle-filter factor (mirrors reference tests/filters/test_pyro.py:
true sigma must lie within 2 posterior std of the fitted guide)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
import pyfilter_tpu.distributions as dist
from pyfilter_tpu import inference as inf, timeseries as ts
from pyfilter_tpu.filters.particle import proposals
from pyfilter_tpu.timeseries import models


def build_ssm(sigma):
    latent = models.RandomWalk(sigma)
    return ts.LinearStateSpaceModel(latent, (1.0, 0.1))


def test_svi_scanned_loop_matches_per_step():
    """The fused Adam loop (all steps in one ``lax.scan`` dispatch) must be
    bit-identical to the per-step loop — the key chain rides the scan carry."""
    jax.clear_caches()
    _, y = build_ssm(0.05).sample_states(jax.random.PRNGKey(3), 30).get_paths()

    def build_model(ctx):
        sigma = ctx.named_parameter("sigma", dist.LogNormal(0.0, 1.0))
        return build_ssm(sigma)

    def run(chunk_size):
        return inf.fit_svi(
            build_model,
            y,
            filter_factory=lambda bm: pf.APF(
                bm, 20, proposal=proposals.LinearGaussianObservations()
            ),
            key=jax.random.PRNGKey(1),
            num_steps=6,
            num_elbo_samples=2,
            chunk_size=chunk_size,
        )

    fused = run(None)  # one scan over all 6 steps
    stepwise = run(1)  # one dispatch per step
    np.testing.assert_array_equal(np.asarray(fused.losses), np.asarray(stepwise.losses))
    np.testing.assert_array_equal(
        np.asarray(fused.guide.loc), np.asarray(stepwise.guide.loc)
    )
    np.testing.assert_array_equal(
        np.asarray(fused.guide.log_scale), np.asarray(stepwise.guide.log_scale)
    )


@pytest.mark.slow
def test_svi_recovers_sigma():
    # the SVI step is the largest single XLA compile in the suite; after ~140
    # prior test compiles the CPU backend segfaults inside LLVM on this
    # single-core host (jax 0.9.0). Clearing the in-process caches before the
    # big compile avoids the corrupted-state trigger; the persistent
    # compilation cache (conftest) makes repeat runs skip the compile entirely.
    jax.clear_caches()
    true_sigma = 0.05
    _, y = build_ssm(true_sigma).sample_states(jax.random.PRNGKey(123), 250).get_paths()

    def build_model(ctx):
        sigma = ctx.named_parameter("sigma", dist.LogNormal(0.0, 1.0))
        return build_ssm(sigma)

    result = inf.fit_svi(
        build_model,
        y,
        filter_factory=lambda bm: pf.APF(
            bm, 100, proposal=proposals.LinearGaussianObservations()
        ),
        key=jax.random.PRNGKey(1),
        num_steps=500,
        num_elbo_samples=4,
        learning_rate=2e-2,
    )

    # losses should decrease overall
    losses = np.asarray(result.losses)
    assert losses[-10:].mean() < losses[:10].mean()

    # posterior over unconstrained sigma: map back via the context
    qs = result.posterior_quantiles(qs=(0.025, 0.5, 0.975))
    lo, med, hi = qs["sigma"][0.025], qs["sigma"][0.5], qs["sigma"][0.975]
    assert lo <= true_sigma <= hi, (lo, med, hi)
    assert abs(med - true_sigma) < 0.05
