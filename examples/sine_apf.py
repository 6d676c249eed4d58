"""Worked example 1 — sine-diffusion SSM filtered with APF + optimal proposal.

The README flagship flow of the reference (tingiskhan/pyfilter README.md:35-82):
simulate a sine-drift SDE observed through a linear-Gaussian map, filter with
an auxiliary particle filter using the closed-form optimal proposal, smooth
with FFBS, and plot truth vs filtered/smoothed means.

Run:  python examples/sine_apf.py [--quick] [--out DIR]
"""

from __future__ import annotations

import argparse
import math
import os

import jax

jax.config.update("jax_platforms", os.environ.get("PYFILTER_PLATFORM", "cpu"))

import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

import pyfilter_tpu as pf  # noqa: E402
from pyfilter_tpu import distributions as dist, timeseries as ts  # noqa: E402
from pyfilter_tpu.examples import maybe_enable_compile_cache  # noqa: E402

maybe_enable_compile_cache()  # PYFILTER_COMPILE_CACHE=<dir> persists XLA compiles
from pyfilter_tpu.filters.particle import proposals  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small sizes for CI")
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "output"))
    args = p.parse_args()

    n_obs = 100 if args.quick else 500
    n_particles = 200 if args.quick else 1_000

    dt = 0.05
    drift = lambda x, gamma, sigma: (jnp.sin(x.value - gamma), sigma)
    sine = ts.AffineEulerMaruyama(
        drift,
        (0.0, 1.0),
        dist.Normal(0.0, math.sqrt(dt)),
        lambda gamma, sigma: dist.Normal(0.0, 1.0),
        dt=dt,
    )
    ssm = ts.LinearStateSpaceModel(sine, (1.0, 0.1))

    key = jax.random.PRNGKey(0)
    x_true, y = ssm.sample_states(key, n_obs).get_paths()

    filt = pf.APF(
        ssm,
        n_particles,
        proposal=proposals.LinearGaussianObservations(),
        record_states=True,
    )
    result = filt.batch_filter(jax.random.PRNGKey(1), y)
    smoothed = filt.smooth(jax.random.PRNGKey(2), result, method="ffbs")
    smooth_mean = jnp.mean(smoothed, axis=1)[1:]

    rmse = float(jnp.sqrt(jnp.mean((result.filter_means - x_true) ** 2)))
    print(f"loglik = {float(result.log_likelihood):.2f}   filter RMSE = {rmse:.4f}")

    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    t = range(n_obs)
    ax.plot(t, x_true, "k-", lw=1, label="latent truth")
    ax.plot(t, y, "k.", ms=2, alpha=0.4, label="observations")
    ax.plot(t, result.filter_means, "C0-", lw=1, label="APF filter mean")
    ax.plot(t, smooth_mean, "C1--", lw=1, label="FFBS smoothed mean")
    ax.set(xlabel="t", title=f"sine diffusion — APF({n_particles}), RMSE {rmse:.3f}")
    ax.legend(loc="best", frameon=False)
    path = os.path.join(args.out, "sine_apf.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    print("wrote", path)


if __name__ == "__main__":
    main()
