"""Worked example 2 — joint state/parameter inference with SMC2 on a
stochastic-volatility model.

Mirrors the reference's flagship notebook
(/root/reference/examples/stochastic-volatility.ipynb): Verhulst volatility
SDE observed through a sinh-arcsinh-skewed return distribution, six free
parameters, APF state filters nested inside parameter-lane SMC2 with a
quasi-random (Sobol) initialization.

Run:  python examples/stochastic_volatility_smc2.py [--quick] [--out DIR]
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
from pyfilter_tpu.inference import plot as pf_plot  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small sizes for CI")
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "output"))
    args = p.parse_args()

    n_obs = 60 if args.quick else 500
    n_state = 100 if args.quick else 400
    n_param = 200 if args.quick else 1_000

    true = dict(kappa=0.1, gamma=1.0, sigma=0.05, mu=0.0, nu=0.0, tau=1.0)
    model = examples.stochastic_volatility_model(**true)
    _, y = model.sample_states(jax.random.PRNGKey(0), n_obs).get_paths()

    ctx = inf.make_context(use_quasi=True, key=jax.random.PRNGKey(1))
    filt = pf.APF(examples.stochastic_volatility_builder, n_state)
    algo = inf.SMC2(
        filt,
        n_param,
        num_steps=5,
        distance_threshold=0.025,
        context=ctx,
        key=jax.random.PRNGKey(2),
    )
    state = algo.fit(y)

    w = np.asarray(state.normalized_weights())
    post = w @ np.asarray(ctx.stack_parameters(True))
    names = list(ctx.parameters)
    for n, v in zip(names, post):
        print(f"  {n:>6s}: posterior mean {v: .3f}   (true {true[n]: .3f})")

    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, _ = pf_plot.mimic_arviz_posterior(ctx, state)
    path = os.path.join(args.out, "stochastic_volatility_smc2.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    print("wrote", path)


if __name__ == "__main__":
    main()
