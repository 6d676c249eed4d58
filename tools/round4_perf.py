"""Round-4 on-chip measurements for PERF.md.

Three measurements, each a subcommand so runs can be bounded independently:

- ``ffbsi``  — rejection-FFBSi smoothing wall-clock at N >= 1e5 (the scale
  the exact O(N*M) FFBS cannot reach; filters/particle/smoothing.py).
- ``etkf``   — ETKF throughput at the EnKF row's config (d=64, d_y=32,
  T=200) plus the LETKF d=1024, M=50 localized update.
- ``wastefree`` — budget-matched variance comparison: TemperedSMC on the
  stoch-vol flagship, discard strategy (K roots, all intermediates thrown
  away) vs waste-free (same re-filter lanes per stage, 3x the swarm).

Timing discipline per CLAUDE.md: sync via host fetch (``float(...)``), warm
run excluded, min/median over reps reported.

Usage: python tools/round4_perf.py {ffbsi,etkf,wastefree} [--quick]
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
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_bench_cache")
    )


def _timeit(fn, reps=5):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    s = sorted(times)
    return {"reps": len(s), "min": s[0], "med": s[len(s) // 2], "max": s[-1]}


def run_ffbsi(quick=False, sizes=None):
    import jax
    import jax.numpy as jnp

    import pyfilter_tpu as pf
    from pyfilter_tpu import timeseries as ts
    from pyfilter_tpu.filters.particle import transition_log_sup
    from pyfilter_tpu.filters.particle.smoothing import ffbsi_smooth
    from pyfilter_tpu.timeseries import models

    T = 200
    model = ts.LinearStateSpaceModel(models.AR(0.2, 0.7, 0.4), (1.0, 0.25))
    _, y = model.sample_states(jax.random.PRNGKey(0), T).get_paths()
    log_sup = transition_log_sup(model)

    out = {}
    if sizes is None:
        sizes = [100_000] if quick else [100_000, 1_000_000]
    for n in sizes:
        filt = pf.SISR(model, n, record_states=True, record_moments=False)
        res = jax.jit(filt.batch_filter)(jax.random.PRNGKey(1), y)
        hist = res.states

        smooth = jax.jit(
            lambda k, h: ffbsi_smooth(
                k, model, h, filt.resampler, log_density_sup=log_sup
            )
        )

        def go(seed=0):
            traj = smooth(jax.random.PRNGKey(100 + seed), hist)
            return float(traj[0, 0])  # host fetch = sync

        t0 = time.perf_counter()
        go()
        compile_s = time.perf_counter() - t0
        stats = _timeit(go, reps=3 if n >= 1_000_000 else 5)
        # trajectory-draws/s: (T+1) backward steps each drawing N ancestors
        stats["draws_per_sec"] = (T + 1) * n / stats["min"]
        stats["compile_s"] = compile_s
        out[f"ffbsi_n{n}"] = stats
        print(f"ffbsi N={n}: {json.dumps(stats)}", flush=True)
    print(json.dumps({"measurement": "ffbsi", **out}))


def _obs_matrix_ssm(d, d_y, q_std=0.3, obs_std=0.25, decay=0.95, mix=0.2):
    """Ring-diffusion hidden state observed through a fixed (d_y, d) matrix
    (every other component averaged in pairs) — same shape class as the
    round-3 EnKF throughput row."""
    import jax.numpy as jnp
    import numpy as np

    from pyfilter_tpu import distributions as dist, timeseries as ts

    def mean_scale(x, decay_, mix_, q_):
        v = x.value
        neigh = 0.5 * (jnp.roll(v, 1, axis=-1) + jnp.roll(v, -1, axis=-1))
        return decay_ * ((1.0 - mix_) * v + mix_ * neigh), q_

    hidden = ts.AffineProcess(
        mean_scale,
        (jnp.asarray(decay), jnp.asarray(mix), jnp.asarray(q_std)),
        dist.Normal(jnp.zeros(d), jnp.ones(d)).to_event(1),
        lambda *_: dist.Normal(jnp.zeros(d), jnp.ones(d)).to_event(1),
    )
    a = np.zeros((d_y, d), np.float32)
    stride = d // d_y
    for i in range(d_y):
        a[i, i * stride : (i + 1) * stride] = 1.0 / stride
    return ts.LinearStateSpaceModel(
        hidden, (jnp.asarray(a), obs_std), event_shape=(d_y,)
    )


def run_etkf(quick=False):
    import jax
    import jax.numpy as jnp

    import pyfilter_tpu as pf

    T = 200
    out = {}

    # tier 1: global ETKF at the EnKF row's model (d=64, d_y=32). The
    # ensemble sizes are ETKF-realistic (M in the hundreds): the transform is
    # an (M, M) eigendecomposition per step, so the EnKF row's M=1e4/1e5 are
    # structurally the WRONG algorithm regime (measured: the M=1e4 eigh
    # fails the remote compile outright) — the ETKF's selling point is
    # exactness at small M, not huge-M throughput.
    model = _obs_matrix_ssm(64, 32)
    _, y = model.sample_states(jax.random.PRNGKey(0), T).get_paths()
    for m in ([100] if quick else [100, 1000]):
        filt = pf.EnsembleTransformKalmanFilter(model, ensemble_size=m)
        bf = jax.jit(filt.batch_filter)

        def go():
            res = bf(jax.random.PRNGKey(2), y)
            return float(res.log_likelihood)

        t0 = time.perf_counter()
        go()
        compile_s = time.perf_counter() - t0
        stats = _timeit(go, reps=5)
        stats["member_steps_per_sec"] = T * m / stats["min"]
        stats["compile_s"] = compile_s
        out[f"etkf_d64_m{m}"] = stats
        print(f"etkf d=64 M={m}: {json.dumps(stats)}", flush=True)

    # tier 2: LETKF, the M << d localized regime (d=1024, M=50)
    d = 1024
    model = _obs_matrix_ssm(d, d // 2)
    _, y = model.sample_states(jax.random.PRNGKey(1), T).get_paths()
    idx = jnp.arange(d, dtype=jnp.float32)

    def ring_metric(a, b):
        diff = jnp.abs(a - b).sum(-1)
        return jnp.minimum(diff, d - diff)

    # observation k averages state sites 2k, 2k+1 -> coordinate 2k + 0.5
    obs_coords = 2.0 * jnp.arange(d // 2, dtype=jnp.float32) + 0.5
    loc = pf.Localization.from_coords(
        idx, obs_coords=obs_coords, radius=10.0, metric=ring_metric
    )
    filt = pf.EnsembleTransformKalmanFilter(
        model, ensemble_size=50, inflation=1.05, localization=loc
    )
    bf = jax.jit(filt.batch_filter)

    def go():
        res = bf(jax.random.PRNGKey(3), y)
        return float(res.log_likelihood)

    t0 = time.perf_counter()
    go()
    compile_s = time.perf_counter() - t0
    stats = _timeit(go, reps=5)
    stats["compile_s"] = compile_s
    stats["grid_point_updates_per_sec"] = T * d / stats["min"]
    out["letkf_d1024_m50"] = stats
    print(f"letkf d=1024 M=50: {json.dumps(stats)}", flush=True)
    print(json.dumps({"measurement": "etkf", **out}))


def run_wastefree(quick=False):
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    import pyfilter_tpu as pf
    from pyfilter_tpu import inference as inf
    from pyfilter_tpu.examples import (
        stochastic_volatility_builder,
        stochastic_volatility_model,
    )

    T, N_STATE = 200, 400
    K_STD = 600  # discard strategy: K roots, every MH intermediate thrown away
    MH_STEPS = 2
    K_WF = K_STD * (MH_STEPS + 1)  # same re-filter lanes per stage, 3x swarm

    model = stochastic_volatility_model(dt=0.2)
    _, y = model.sample_states(jax.random.PRNGKey(42), T * 5).get_paths()
    y = y[4::5]

    def one_fit(seed, waste_free):
        k = int(waste_free)
        with inf.make_context(key=jax.random.PRNGKey(2 * seed + k)) as ctx:
            alg = inf.TemperedSMC(
                pf.APF(stochastic_volatility_builder, N_STATE, record_moments=False),
                K_WF if waste_free else K_STD,
                num_mh_steps=MH_STEPS,
                waste_free=waste_free,
                context=ctx,
                key=jax.random.PRNGKey(9000 + 2 * seed + k),
            )
            t0 = time.perf_counter()
            res = alg.fit(y)
            wall = time.perf_counter() - t0
        post_gamma = float(np.mean(np.asarray(res.samples["gamma"])))
        return {
            "log_evidence": float(res.log_evidence),
            "post_gamma": post_gamma,
            "stages": len(res.lambdas),
            "wall_s": wall,
        }

    n_seeds = 3 if quick else 8
    out = {}
    for wf in (False, True):
        runs = []
        for s in range(n_seeds):
            r = one_fit(s, wf)
            print(f"  run wf={wf} seed={s}: {json.dumps(r)}", flush=True)
            runs.append(r)
        ev = np.array([r["log_evidence"] for r in runs])
        pg = np.array([r["post_gamma"] for r in runs])
        out["waste_free" if wf else "discard"] = {
            "K": K_WF if wf else K_STD,
            "seeds": n_seeds,
            "log_evidence_mean": float(ev.mean()),
            "log_evidence_std": float(ev.std(ddof=1)),
            "post_gamma_mean": float(pg.mean()),
            "post_gamma_std": float(pg.std(ddof=1)),
            "stages_mean": float(np.mean([r["stages"] for r in runs])),
            "wall_s_med": float(np.median([r["wall_s"] for r in runs])),
        }
        print(f"{'waste_free' if wf else 'discard'}: "
              f"{json.dumps(out['waste_free' if wf else 'discard'])}", flush=True)
    print(json.dumps({"measurement": "wastefree", **out}))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("which", choices=["ffbsi", "etkf", "wastefree"])
    p.add_argument("--quick", action="store_true")
    p.add_argument("--sizes", type=str, default=None, help="ffbsi: comma-separated N values")
    args = p.parse_args()
    _enable_cache()
    if args.which == "ffbsi":
        sizes = [int(s) for s in args.sizes.split(",")] if args.sizes else None
        run_ffbsi(quick=args.quick, sizes=sizes)
    else:
        {"etkf": run_etkf, "wastefree": run_wastefree}[args.which](quick=args.quick)


if __name__ == "__main__":
    main()
