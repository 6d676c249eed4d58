"""Worked example 5 — the numpyro interop bridge.

The reference exposes its VI feature to the pyro ecosystem via ``pyro.factor``
(/root/reference/pyfilter/filters/particle/base.py:176-229). The JAX-world
equivalent is numpyro: ``pyfilter_tpu.interop.numpyro_filter_factor`` emits
the particle filter's FFBS-smoothed, parameter-differentiable log-likelihood
as a ``numpyro.factor`` inside any numpyro model, so numpyro's SVI/MCMC
machinery can infer SSM parameters.

numpyro is an optional dependency. With numpyro installed this script runs a
full numpyro SVI fit; without it, it demonstrates the same factor standalone
(value + gradient w.r.t. the parameter) so the bridge's contract is still
exercised.

Run:  python examples/numpyro_interop.py [--quick] [--out DIR]
"""

from __future__ import annotations

import argparse
import os

import jax

jax.config.update("jax_platforms", os.environ.get("PYFILTER_PLATFORM", "cpu"))

import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import pyfilter_tpu as pf  # noqa: E402
from pyfilter_tpu import interop, timeseries as ts  # noqa: E402
from pyfilter_tpu.examples import maybe_enable_compile_cache  # noqa: E402

maybe_enable_compile_cache()  # PYFILTER_COMPILE_CACHE=<dir> persists XLA compiles
from pyfilter_tpu.timeseries import models  # noqa: E402

TRUE_SIGMA = 0.05


def build_ssm(sigma):
    return ts.LinearStateSpaceModel(models.RandomWalk(sigma), (1.0, 0.1))


def run_with_numpyro(y, n_particles, n_steps):
    import numpyro
    import numpyro.distributions as npdist
    from numpyro.infer import SVI, Trace_ELBO, autoguide

    def model(y):
        sigma = numpyro.sample("sigma", npdist.LogNormal(0.0, 1.0))
        filt = pf.APF(build_ssm(sigma), n_particles)
        interop.numpyro_filter_factor("pf_loglik", filt, y)

    guide = autoguide.AutoNormal(model)
    svi = SVI(model, guide, numpyro.optim.Adam(2e-2), Trace_ELBO())
    result = svi.run(jax.random.PRNGKey(1), n_steps, y, progress_bar=False)
    med = guide.median(result.params)["sigma"]
    print(f"numpyro SVI posterior median sigma: {float(med):.4f} (true {TRUE_SIGMA})")
    return np.asarray(result.losses)


def run_standalone(y, n_particles):
    """No numpyro available: evaluate the factor and its gradient directly —
    the exact quantities numpyro's ELBO would consume. Returns the factor
    profile over sigma (for the plot)."""

    def factor(log_sigma):
        filt = pf.APF(build_ssm(jnp.exp(log_sigma)), n_particles)
        return filt.smoothed_log_likelihood(jax.random.PRNGKey(1), y)

    val, grad = jax.value_and_grad(factor)(jnp.log(0.2))
    print(f"factor at sigma=0.2: {float(val):.2f}, d/dlog_sigma = {float(grad):.2f}")
    assert np.isfinite(float(val)) and np.isfinite(float(grad))
    # at sigma above truth the gradient should push log-sigma DOWN
    assert float(grad) < 0.0
    print("standalone factor contract OK (numpyro not installed)")
    sigmas = np.linspace(0.05, 0.3, 8)
    profile = [float(factor(jnp.log(s))) for s in sigmas]
    return ("factor profile over sigma", sigmas, profile)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small sizes for CI")
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "output"))
    args = p.parse_args()

    n_obs = 60 if args.quick else 250
    n_particles = 50 if args.quick else 100
    n_steps = 80 if args.quick else 500

    _, y = build_ssm(TRUE_SIGMA).sample_states(jax.random.PRNGKey(123), n_obs).get_paths()

    try:
        import numpyro  # noqa: F401

        losses = run_with_numpyro(y, n_particles, n_steps)
    except ImportError:
        losses = run_standalone(y, n_particles)

    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4))
    if isinstance(losses, tuple):  # standalone fallback: factor profile
        label, sigmas, profile = losses
        ax.plot(sigmas, profile, "C0.-", lw=1)
        ax.axvline(TRUE_SIGMA, color="k", ls="--", lw=1, label="true sigma")
        ax.set(xlabel="sigma", ylabel="smoothed loglik factor", title=label)
        ax.legend(loc="best", frameon=False)
    else:
        ax.plot(losses, lw=1)
        ax.set(xlabel="SVI step", ylabel="negative ELBO", title="numpyro interop")
    path = os.path.join(args.out, "numpyro_interop.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    print("wrote", path)


if __name__ == "__main__":
    main()
