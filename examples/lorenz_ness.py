"""Worked example 3 — online joint inference on the Lorenz-63 SDE with NESS.

Mirrors /root/reference/examples/lorenz.ipynb: a 3-D chaotic SDE discretized
with 10 Euler-Maruyama sub-steps per observation, observed partially (2 of 3
coordinates), uniform priors on (s, r, b), NESS parameter-lane inference with
APF state filters.

Run:  python examples/lorenz_ness.py [--quick] [--out DIR]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small sizes for CI")
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "output"))
    args = p.parse_args()

    n_obs = 40 if args.quick else 300
    n_state = 100 if args.quick else 400
    n_param = 200 if args.quick else 1_000

    true = dict(s=10.0, r=28.0, b=8.0 / 3.0)
    model = examples.lorenz63_model(**true)
    x_true, y = model.sample_states(jax.random.PRNGKey(0), n_obs).get_paths()

    ctx = inf.make_context(key=jax.random.PRNGKey(1))
    filt = pf.SISR(examples.lorenz63_builder, n_state)
    algo = inf.NESS(filt, n_param, context=ctx, key=jax.random.PRNGKey(2))
    state = algo.fit(y)

    w = np.asarray(state.normalized_weights())
    post = w @ np.asarray(ctx.stack_parameters(True))
    for n, v in zip(list(ctx.parameters), post):
        print(f"  {n:>2s}: posterior mean {v: .3f}   (true {true[n]: .3f})")

    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 1, figsize=(10, 6), sharex=True)
    means = np.asarray([np.asarray(m) for m in state.filter_state.filter_means])
    pooled = (w[None, :, None] * means).sum(axis=1)  # parameter-weighted means
    t = range(n_obs)
    for d, state_dim in enumerate((0, 2)):  # obs = 0.8 * (x0, x2)
        axes[d].plot(t, np.asarray(y)[:, d], "k.", ms=2, alpha=0.4, label="obs")
        axes[d].plot(t, 0.8 * pooled[:, state_dim], "C0-", lw=1, label="0.8 x filter mean")
        axes[d].set_ylabel(f"obs dim {d}")
        axes[d].legend(loc="best", frameon=False)
    axes[0].set_title("Lorenz-63 — NESS online joint inference")
    path = os.path.join(args.out, "lorenz_ness.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    print("wrote", path)


if __name__ == "__main__":
    main()
