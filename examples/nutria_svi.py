"""Worked example 4 — variational inference on the nutria population model.

Mirrors /root/reference/examples/nutria-pyro.ipynb: the particle filter's
FFBS-smoothed joint log-likelihood acts as a differentiable likelihood factor
inside a stochastic-ELBO loop (the reference uses pyro SVI; here a
diagonal-Gaussian guide optimized with optax — pyfilter_tpu.inference.fit_svi).

Run:  python examples/nutria_svi.py [--quick] [--out DIR]
"""

from __future__ import annotations

import argparse
import os

import jax

jax.config.update("jax_platforms", os.environ.get("PYFILTER_PLATFORM", "cpu"))

import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import pyfilter_tpu as pf  # noqa: E402
from pyfilter_tpu import examples, inference as inf  # noqa: E402
from pyfilter_tpu.examples import maybe_enable_compile_cache  # noqa: E402

maybe_enable_compile_cache()  # PYFILTER_COMPILE_CACHE=<dir> persists XLA compiles
from pyfilter_tpu.inference.variational import fit_svi  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small sizes for CI")
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "output"))
    args = p.parse_args()

    n_obs = 50 if args.quick else 100
    n_state = 60 if args.quick else 300
    n_steps = 60 if args.quick else 500

    true = dict(a=0.1, b=-0.05, c=0.0, sigma_e=0.3, sigma_n=0.2)
    model = examples.nutria_model(**true)
    _, y = model.sample_states(jax.random.PRNGKey(0), n_obs).get_paths()

    result = fit_svi(
        lambda ctx: examples.nutria_builder(ctx, num_obs=n_obs),
        y,
        lambda build: pf.APF(build, n_state),
        key=jax.random.PRNGKey(1),
        num_steps=n_steps,
    )

    quantiles = result.posterior_quantiles()
    for name, qs in quantiles.items():
        lo, med, hi = (np.asarray(qs[q]).ravel()[0] for q in (0.05, 0.5, 0.95))
        t = true[name] ** 2 if name.startswith("sigma") else true[name]
        print(f"  {name:>7s}: median {med: .3f} [{lo: .3f}, {hi: .3f}]   (true {t: .3f})")

    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(np.asarray(result.losses), lw=1)
    ax.set(xlabel="SVI step", ylabel="negative ELBO", title="nutria — SVI convergence")
    path = os.path.join(args.out, "nutria_svi.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    print("wrote", path)


if __name__ == "__main__":
    main()
