"""Round-5 on-chip measurements for the SQMC / block-PF / variance additions.

Subcommands:

- ``sqmc``  — wall-clock AND replicate log-likelihood variance for SQMC vs
  the always-resample bootstrap SISR at equal N (AR(1), T=200). The figure
  of merit is time-normalized variance: var x seconds (lower is better) —
  SQMC pays two extra sorts per step and buys a superlinear variance drop.
- ``blockpf`` — block-PF throughput at high dimension (ring model d=1024,
  N=4096, block_size=8, T=100), in particle-component-steps/s, plus the
  same-shape global-bootstrap SISR wall-clock for the overhead comparison.
- ``varest`` — genealogy variance-estimator overhead on a recorded history
  (N=2^17, T=200): eve composition + estimator vs the filtering pass itself.

Timing discipline per CLAUDE.md: sync via host fetch (``float(...)``), warm
run excluded, min/median over reps reported.

Usage: python tools/round5b_perf.py {sqmc,blockpf,varest} [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_cache():
    from pyfilter_tpu.compile_cache import enable_compile_cache

    enable_compile_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_bench_cache",
        )
    )


def _timeit(fn, reps=5):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    s = sorted(times)
    return {"reps": len(s), "min": s[0], "med": s[len(s) // 2], "max": s[-1]}


def run_sqmc(quick=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import pyfilter_tpu as pf
    from pyfilter_tpu import timeseries as ts
    from pyfilter_tpu.timeseries import models

    T = 200
    n = 2**14 if quick else 2**16
    reps_var = 8 if quick else 24
    model = ts.LinearStateSpaceModel(models.AR(0.2, 0.7, 0.4), (1.0, 0.25))
    _, y = model.sample_states(jax.random.PRNGKey(0), T).get_paths()
    y = jnp.asarray(y, jnp.float32)

    sq = pf.SQMC(model, n)
    bf_sq = jax.jit(sq.batch_filter)
    si = pf.SISR(model, n, ess_threshold=1.1)
    bf_si = jax.jit(si.batch_filter)

    def run_sq(i=0):
        return float(bf_sq(jax.random.PRNGKey(i), y).log_likelihood)

    def run_si(i=0):
        return float(bf_si(jax.random.PRNGKey(i), y).log_likelihood)

    t0 = time.perf_counter()
    run_sq()
    compile_sq = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_si()
    compile_si = time.perf_counter() - t0

    t_sq = _timeit(run_sq)
    t_si = _timeit(run_si)

    lls_sq = np.array([run_sq(i) for i in range(reps_var)])
    lls_si = np.array([run_si(i) for i in range(reps_var)])
    v_sq, v_si = float(np.var(lls_sq)), float(np.var(lls_si))

    out = {
        "config": {"N": n, "T": T, "replicates": reps_var},
        "sqmc": {"time": t_sq, "loglik_var": v_sq, "compile_s": compile_sq},
        "sisr": {"time": t_si, "loglik_var": v_si, "compile_s": compile_si},
        "var_reduction": v_si / v_sq if v_sq > 0 else float("inf"),
        "time_ratio": t_sq["min"] / t_si["min"],
        "time_normalized_gain": (v_si * t_si["min"]) / (v_sq * t_sq["min"])
        if v_sq > 0
        else float("inf"),
    }
    print(json.dumps(out))


def run_blockpf(quick=False):
    import jax
    import jax.numpy as jnp

    import pyfilter_tpu as pf
    from pyfilter_tpu import distributions as dist, timeseries as ts

    d = 256 if quick else 1024
    n = 2048 if quick else 4096
    T = 100

    def mean_scale(x, decay, mix, q):
        v = x.value
        neigh = 0.5 * (jnp.roll(v, 1, axis=-1) + jnp.roll(v, -1, axis=-1))
        return decay * ((1.0 - mix) * v + mix * neigh), q

    hidden = ts.AffineProcess(
        mean_scale,
        (jnp.asarray(0.9), jnp.asarray(0.2), jnp.asarray(0.35)),
        dist.Normal(jnp.zeros(d), jnp.ones(d)).to_event(1),
        lambda *_: dist.Normal(jnp.zeros(d), jnp.ones(d)).to_event(1),
    )
    ssm = ts.LinearStateSpaceModel(hidden, (1.0, 0.3), event_shape=(d,))
    _, y = ssm.sample_states(jax.random.PRNGKey(1), T).get_paths()
    y = jnp.asarray(y, jnp.float32)

    bpf = pf.BlockParticleFilter(ssm, n, block_size=8)
    bf_b = jax.jit(bpf.batch_filter)
    si = pf.SISR(ssm, n)
    bf_s = jax.jit(si.batch_filter)

    def run_b():
        return float(bf_b(jax.random.PRNGKey(0), y).log_likelihood)

    def run_s():
        return float(bf_s(jax.random.PRNGKey(0), y).log_likelihood)

    t0 = time.perf_counter()
    run_b()
    compile_b = time.perf_counter() - t0
    run_s()

    t_b = _timeit(run_b)
    t_s = _timeit(run_s)
    out = {
        "config": {"d": d, "N": n, "T": T, "block_size": 8},
        "blockpf": {
            "time": t_b,
            "compile_s": compile_b,
            "component_steps_per_s": n * d * T / t_b["min"],
        },
        "sisr_same_shape": {"time": t_s},
        "overhead_vs_global": t_b["min"] / t_s["min"],
    }
    print(json.dumps(out))


def run_varest(quick=False):
    import jax
    import jax.numpy as jnp

    import pyfilter_tpu as pf
    from pyfilter_tpu import timeseries as ts
    from pyfilter_tpu.filters.particle import log_likelihood_variance
    from pyfilter_tpu.timeseries import models

    T = 200
    n = 2**15 if quick else 2**17
    model = ts.LinearStateSpaceModel(models.AR(0.2, 0.7, 0.4), (1.0, 0.25))
    _, y = model.sample_states(jax.random.PRNGKey(0), T).get_paths()
    y = jnp.asarray(y, jnp.float32)

    filt = pf.SISR(model, n, record_states=True)
    bf = jax.jit(filt.batch_filter)
    est = jax.jit(lambda r: log_likelihood_variance(r).variance[-1])

    res = bf(jax.random.PRNGKey(0), y)
    float(res.log_likelihood)

    def run_filter():
        return float(bf(jax.random.PRNGKey(0), y).log_likelihood)

    t0 = time.perf_counter()
    v = float(est(res))
    compile_est = time.perf_counter() - t0

    def run_est():
        return float(est(res))

    t_f = _timeit(run_filter)
    t_e = _timeit(run_est)
    out = {
        "config": {"N": n, "T": T},
        "filter_pass": {"time": t_f},
        "variance_estimator": {"time": t_e, "compile_s": compile_est, "value": v},
        "overhead_fraction": t_e["min"] / t_f["min"],
    }
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["sqmc", "blockpf", "varest"])
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    _enable_cache()
    {"sqmc": run_sqmc, "blockpf": run_blockpf, "varest": run_varest}[args.cmd](args.quick)


if __name__ == "__main__":
    main()
