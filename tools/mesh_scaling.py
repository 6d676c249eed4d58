"""Virtual-mesh scaling table for the sharded filter (SURVEY §5.8 evidence).

Runs ``sharded_batch_filter`` at a FIXED global particle count over 1/2/4/8
virtual CPU devices and records, per mesh size: the compiled program's
collective-op census, the per-device shard size, and wall-clock. CPU virtual
devices share the same host cores, so wall-clock is NOT a speed claim — the
table documents what the GSPMD partitioner emits as the mesh grows (the
communication structure is identical on real ICI).

Usage: python tools/mesh_scaling.py [global_N] [n_obs]
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import re
from collections import Counter

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyfilter_tpu as pf
from pyfilter_tpu import parallel, timeseries as ts
from pyfilter_tpu.timeseries import models


def collective_census(hlo_text: str) -> Counter:
    ops = Counter()
    for ln in hlo_text.splitlines():
        for op in ("all-reduce", "all-gather", "collective-permute", "all-to-all",
                   "reduce-scatter"):
            if re.search(rf"= \S+ {op}\(", ln):
                ops[op] += 1
    return ops


def main(global_n: int = 1 << 17, n_obs: int = 50):
    ar = models.AR(0.0, 0.95, 0.3)
    ssm = ts.LinearStateSpaceModel(ar, (1.0, 0.1))
    key = jax.random.PRNGKey(0)
    y = ssm.sample_states(jax.random.PRNGKey(1), n_obs).y

    rows = []
    for p in (1, 2, 4, 8):
        mesh = parallel.make_mesh((p,), ("particles",), devices=jax.devices()[:p])
        filt = pf.SISR(ssm, global_n)
        state0 = parallel.shard_filter_state(filt.initialize(key), mesh)

        def run(k, ys, st):
            return filt.batch_filter(k, ys, initial_state=st)

        jitted = jax.jit(run)
        t0 = time.perf_counter()
        compiled = jitted.lower(key, y, state0).compile()
        compile_s = time.perf_counter() - t0
        census = collective_census(compiled.as_text())

        res = jitted(key, y, state0)  # warm
        _ = float(res.log_likelihood)
        t0 = time.perf_counter()
        res = jitted(key, y, state0)
        ll = float(res.log_likelihood)
        wall = time.perf_counter() - t0

        rows.append((p, global_n // p, census, wall, compile_s, ll))

    print(f"\nglobal N = {global_n}, T = {n_obs} (CPU virtual mesh; wall-clock is "
          "partitioning evidence, not a speed claim)\n")
    print("| devices | particles/device | all-reduce | all-gather | other colls | wall (s) | compile (s) | loglik |")
    print("|---|---|---|---|---|---|---|---|")
    for p, shard, census, wall, compile_s, ll in rows:
        other = sum(v for k, v in census.items() if k not in ("all-reduce", "all-gather"))
        print(
            f"| {p} | {shard} | {census.get('all-reduce', 0)} | "
            f"{census.get('all-gather', 0)} | {other} | {wall:.2f} | {compile_s:.1f} | {ll:.2f} |"
        )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    main(n, t)
