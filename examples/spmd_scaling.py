"""Worked example 6 — scaling the particle axis over a device mesh.

NEW capability relative to the reference (SURVEY.md §2.8: its only
parallelism is a broadcast batch dim). Three tiers, all driven here:

1. GSPMD (``parallel.sharded_batch_filter``): annotate shardings, let XLA
   place the collectives — zero changes to the filter code.
2. Explicit SPMD (``parallel.spmd_batch_filter``): the whole scan under one
   ``shard_map`` with psum weight reductions and the halo-exchange
   systematic resampler (O(halo * N/P) payload per fire instead of the
   all-gather's O(N)).
3. The collective-free tier (``resampler="metropolis"``): resampling from
   weight RATIOS only (Murray, Lee & Jacob, arXiv:1202.6163) — ring
   ppermutes, zero reductions; chain bias O(1/n_iter), documented in
   PERF.md.

Runs on any device count: real TPU chips, or a virtual CPU mesh (default
here: 8 virtual devices via XLA_FLAGS).

Run:  python examples/spmd_scaling.py [--quick]
"""

from __future__ import annotations

import argparse
import os

# virtual 8-device CPU mesh unless the user points PYFILTER_PLATFORM at tpu
if os.environ.get("PYFILTER_PLATFORM", "cpu") == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", os.environ.get("PYFILTER_PLATFORM", "cpu"))

import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import pyfilter_tpu as pf  # noqa: E402
from pyfilter_tpu import parallel, timeseries as ts  # noqa: E402
from pyfilter_tpu.examples import maybe_enable_compile_cache  # noqa: E402

maybe_enable_compile_cache()  # PYFILTER_COMPILE_CACHE=<dir> persists XLA compiles
from pyfilter_tpu.filters.particle import proposals  # noqa: E402
from pyfilter_tpu.timeseries import models  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small sizes for CI")
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "output"))
    args = p.parse_args()

    n = 2_048 if args.quick else 131_072
    t = 30 if args.quick else 100

    ssm = ts.LinearStateSpaceModel(models.OrnsteinUhlenbeck(0.5, 1.0, 0.1), (1.0, 0.05))
    y = ssm.sample_states(jax.random.PRNGKey(0), t).y
    key = jax.random.PRNGKey(1)

    mesh = parallel.make_mesh()  # all devices on one "particles" axis
    print(f"mesh: {dict(mesh.shape)}  global particles: {n}")

    exact = pf.KalmanFilter(ssm).batch_filter(y)
    print(f"exact loglik (Kalman oracle): {float(exact.log_likelihood):9.3f}")

    # --- tier 1: GSPMD — the library filter, sharded by annotation ---------
    filt = pf.SISR(ssm, n, proposal=proposals.Bootstrap())
    res = parallel.sharded_batch_filter(filt, key, y, mesh)
    print(f"GSPMD sharded filter:         {float(res.log_likelihood):9.3f}")

    # --- tier 2: explicit SPMD with the halo-exchange resampler ------------
    _, _, ll, means = parallel.spmd_batch_filter(ssm, n, key, y, mesh)
    print(f"explicit SPMD (halo):         {float(ll):9.3f}")

    # the flagship APF rides the same path
    _, _, ll_apf, _ = parallel.spmd_batch_filter(
        ssm, n, key, y, mesh, filter_type="apf",
        proposal=proposals.LinearGaussianObservations(),
    )
    print(f"explicit SPMD APF+optimal:    {float(ll_apf):9.3f}")

    # --- tier 3: collective-free Metropolis resampling ---------------------
    _, _, ll_m, _ = parallel.spmd_batch_filter(
        ssm, n, key, y, mesh, resampler="metropolis", metropolis_iters=128
    )
    print(f"explicit SPMD (metropolis):   {float(ll_m):9.3f}")

    # --- the GPF family, smoothing, and prediction ride the same mesh ------
    _, _, ll_g, _ = parallel.spmd_batch_filter(ssm, n, key, y, mesh, filter_type="gpf")
    print(f"explicit SPMD GPF:            {float(ll_g):9.3f}")

    vals_f, lw_f, _, _, history = parallel.spmd_batch_filter(
        ssm, n, key, y, mesh, record_history=True
    )
    sm = parallel.spmd_smooth(ssm, jax.random.PRNGKey(2), history, mesh, n_trajectories=256)
    print(f"distributed FFBS trajectories: {tuple(sm.shape)} (O(M)-comm backward steps)")
    pred_means, _ = parallel.spmd_predict(
        ssm, jax.random.PRNGKey(3), vals_f, lw_f, 5, mesh, time_index=len(y)
    )
    print(f"5-step predictive means:      {np.round(np.asarray(pred_means), 3)}")

    err = np.abs(np.asarray(means) - np.asarray(exact.filter_means).squeeze()).max()
    print(f"max |filter mean - exact|:    {err:9.4f}")

    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    tt = range(len(np.asarray(means)))
    ax.plot(tt, np.asarray(exact.filter_means).squeeze(), "k-", lw=1, label="exact (Kalman)")
    ax.plot(tt, np.asarray(means), "C0--", lw=1, label=f"SPMD filter mean (P={mesh.size})")
    ax.set(
        xlabel="t",
        title=f"particle axis sharded over {mesh.size} devices — N={n}, max err {err:.3f}",
    )
    ax.legend(loc="best", frameon=False)
    path = os.path.join(args.out, "spmd_scaling.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    print("wrote", path)


if __name__ == "__main__":
    main()
