"""Round-5 on-chip measurements for PERF.md — the round-5 algorithms.

Same discipline as tools/round4_perf.py (host-fetch sync, warm run excluded,
min/median over reps, persistent compile cache). Subcommands:

- ``score``   — PaRIS online score wall-clock at N=1e5 (T=200 AR(1)) and the
  overhead factor over the plain SISR filtering pass it rides on.
- ``mle``     — streaming MLE (`fit_mle_streaming`) throughput on a T=1e4
  stream at N=2000, window=25: observations/s and total wall.
- ``etks``    — ensemble smoothers at the ETKF ledger configs: ETKS at
  d=64/M=100 and LETKS at d=1024/M=50 (Gaspari-Cohn rho_xx taper), smoother
  pass wall vs the filter-only pass.
- ``banksmooth`` — GSF (K=4) and IMM (K=2) smoother wall at T=300 vs their
  filter passes (the K^2 pair-RTS collapse is the IMM smoother's cost).
- ``storvik`` — StorvikFilter (NIG AR(1) block) particle-steps/s at N=1e5,
  T=400, vs the plain SISR headline path (the delta is the per-step
  conjugate sampling + sufficient-statistic update).

Usage: python tools/round5_perf.py {score,mle,etks,banksmooth,storvik}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from round4_perf import _enable_cache, _obs_matrix_ssm, _timeit  # noqa: E402


def run_score():
    import jax
    import jax.numpy as jnp

    import pyfilter_tpu as pf
    from pyfilter_tpu import distributions as dist, inference as inf, timeseries as ts
    from pyfilter_tpu.inference.score import online_score
    from pyfilter_tpu.timeseries import models

    T, N = 200, 100_000
    ssm = ts.LinearStateSpaceModel(models.AR(0.0, 0.7, 0.4), (1.0, 0.25))
    _, y = ssm.sample_states(jax.random.PRNGKey(0), T).get_paths()

    def build(ctx):
        beta = ctx.named_parameter("beta", dist.Normal(0.0, 2.0))
        sigma = ctx.named_parameter("sigma", dist.LogNormal(-1.0, 1.0))
        return ts.LinearStateSpaceModel(models.AR(0.0, beta, sigma), (1.0, 0.25))

    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
        ctx.set_batch_shape(())
        build(ctx)
        ctx.update_parameter("beta", jnp.asarray(0.5))
        ctx.update_parameter("sigma", jnp.asarray(0.5))

        def go_score(seed=0):
            res = online_score(
                build, y, lambda b: pf.SISR(b, N), jax.random.PRNGKey(2 + seed), context=ctx
            )
            return float(res.score[0])

        t0 = time.perf_counter()
        go_score()
        compile_s = time.perf_counter() - t0
        stats = _timeit(go_score, reps=5)
        stats["compile_s"] = compile_s
        stats["particle_steps_per_sec"] = T * N / stats["min"]

        # plain filtering pass on the same model/size for the overhead factor
        with ctx.no_prior_verification():
            m = build(ctx)
        filt = pf.SISR(m, N)
        bf = jax.jit(filt.batch_filter)

        def go_filter(seed=0):
            return float(bf(jax.random.PRNGKey(2 + seed), y).log_likelihood)

        go_filter()
        base = _timeit(go_filter, reps=5)
        stats["filter_only_min"] = base["min"]
        stats["overhead_factor"] = stats["min"] / base["min"]
    print(json.dumps({"measurement": "score", "score_n1e5_t200": stats}))


def run_mle():
    import jax
    import jax.numpy as jnp

    import pyfilter_tpu as pf
    from pyfilter_tpu import distributions as dist, inference as inf, timeseries as ts
    from pyfilter_tpu.inference.score import fit_mle_streaming
    from pyfilter_tpu.timeseries import models

    T, N, W = 10_000, 2000, 25
    ssm = ts.LinearStateSpaceModel(models.AR(0.0, 0.7, 0.4), (1.0, 0.25))
    _, y = ssm.sample_states(jax.random.PRNGKey(0), T).get_paths()

    def build(ctx):
        beta = ctx.named_parameter("beta", dist.Normal(0.0, 2.0))
        sigma = ctx.named_parameter("sigma", dist.LogNormal(-1.0, 1.0))
        return ts.LinearStateSpaceModel(models.AR(0.0, beta, sigma), (1.0, 0.25))

    def go(seed=0):
        with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
            ctx.set_batch_shape(())
            build(ctx)
            ctx.update_parameter("beta", jnp.asarray(0.2))
            ctx.update_parameter("sigma", jnp.asarray(0.8))
            res = fit_mle_streaming(
                build, y, lambda b: pf.SISR(b, N), jax.random.PRNGKey(3 + seed),
                window=W, context=ctx,
            )
            import numpy as np
            return float(np.asarray(res.theta).ravel()[0])

    t0 = time.perf_counter()
    go()
    compile_s = time.perf_counter() - t0
    stats = _timeit(go, reps=3)
    stats["compile_s"] = compile_s
    stats["obs_per_sec"] = T / stats["min"]
    stats["adam_steps"] = T // W
    print(json.dumps({"measurement": "mle", "mle_t1e4_n2000_w25": stats}))


def run_etks():
    import jax
    import jax.numpy as jnp

    import pyfilter_tpu as pf

    T = 200
    out = {}

    # ETKS at the global-ETKF ledger config (d=64, M=100)
    model = _obs_matrix_ssm(64, 32)
    _, y = model.sample_states(jax.random.PRNGKey(0), T).get_paths()
    filt = pf.EnsembleTransformKalmanFilter(model, ensemble_size=100)
    sm = jax.jit(filt.smooth)
    bf = jax.jit(filt.batch_filter)

    def go_smooth(seed=0):
        return float(sm(jax.random.PRNGKey(2 + seed), y)[0, 0, 0])

    def go_filter(seed=0):
        return float(bf(jax.random.PRNGKey(2 + seed), y).log_likelihood)

    t0 = time.perf_counter()
    go_smooth()
    compile_s = time.perf_counter() - t0
    stats = _timeit(go_smooth, reps=5)
    stats["compile_s"] = compile_s
    go_filter()
    stats["filter_only_min"] = _timeit(go_filter, reps=5)["min"]
    out["etks_d64_m100"] = stats
    print(f"etks d=64 M=100: {json.dumps(stats)}", flush=True)

    # LETKS at the LETKF ledger config (d=1024, M=50, GC radius 10)
    d = 1024
    model = _obs_matrix_ssm(d, d // 2)
    _, y = model.sample_states(jax.random.PRNGKey(1), T).get_paths()
    idx = jnp.arange(d, dtype=jnp.float32)

    def ring_metric(a, b):
        diff = jnp.abs(a - b).sum(-1)
        return jnp.minimum(diff, d - diff)

    obs_coords = 2.0 * jnp.arange(d // 2, dtype=jnp.float32) + 0.5
    loc = pf.Localization.from_coords(
        idx, obs_coords=obs_coords, radius=10.0, metric=ring_metric
    )
    filt = pf.EnsembleTransformKalmanFilter(
        model, ensemble_size=50, inflation=1.05, localization=loc
    )
    sm = jax.jit(filt.smooth)
    bf = jax.jit(filt.batch_filter)

    def go_smooth(seed=0):
        return float(sm(jax.random.PRNGKey(3 + seed), y)[0, 0, 0])

    def go_filter(seed=0):
        return float(bf(jax.random.PRNGKey(3 + seed), y).log_likelihood)

    t0 = time.perf_counter()
    go_smooth()
    compile_s = time.perf_counter() - t0
    stats = _timeit(go_smooth, reps=3)
    stats["compile_s"] = compile_s
    go_filter()
    stats["filter_only_min"] = _timeit(go_filter, reps=3)["min"]
    out["letks_d1024_m50"] = stats
    print(f"letks d=1024 M=50: {json.dumps(stats)}", flush=True)
    print(json.dumps({"measurement": "etks", **out}))


def run_banksmooth():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import pyfilter_tpu as pf
    from pyfilter_tpu import timeseries as ts
    from pyfilter_tpu.timeseries import models

    T = 300
    out = {}

    def ar_ssm(sigma, beta=0.9):
        return ts.LinearStateSpaceModel(models.AR(0.0, beta, sigma), (1.0, 0.1))

    # GSF K=4 on a nonlinear-ish scalar model
    ssm = ar_ssm(0.4)
    _, y = ssm.sample_states(jax.random.PRNGKey(0), T).get_paths()
    gsf = pf.GaussianSumFilter(ssm, n_components=4, spread=0.5)
    sm = jax.jit(lambda yy: gsf.smooth(yy)[0])
    bf = jax.jit(gsf.batch_filter)

    def go_smooth():
        import numpy as np
        return float(np.asarray(sm(y)).ravel()[0])

    def go_filter():
        return float(bf(y).log_likelihood)

    t0 = time.perf_counter()
    go_smooth()
    compile_s = time.perf_counter() - t0
    stats = _timeit(go_smooth, reps=5)
    stats["compile_s"] = compile_s
    go_filter()
    stats["filter_only_min"] = _timeit(go_filter, reps=5)["min"]
    out["gsf_smooth_k4_t300"] = stats
    print(f"gsf smooth K=4: {json.dumps(stats)}", flush=True)

    # IMM K=2 Kim smoother on switching-volatility shape
    trans = np.full((2, 2), 0.05) + np.eye(2) * 0.90
    imm = pf.InteractingMultipleModel([ar_ssm(0.1), ar_ssm(1.0)], trans)
    sm = jax.jit(lambda yy: imm.smooth(yy)[0])
    bf = jax.jit(imm.batch_filter)

    t0 = time.perf_counter()
    go_smooth()
    compile_s = time.perf_counter() - t0
    stats = _timeit(go_smooth, reps=5)
    stats["compile_s"] = compile_s
    go_filter()
    stats["filter_only_min"] = _timeit(go_filter, reps=5)["min"]
    out["imm_smooth_k2_t300"] = stats
    print(f"imm smooth K=2: {json.dumps(stats)}", flush=True)
    print(json.dumps({"measurement": "banksmooth", **out}))


def run_storvik():
    import jax

    import pyfilter_tpu as pf
    from pyfilter_tpu import inference as inf, timeseries as ts
    from pyfilter_tpu.timeseries import models

    T, N = 400, 100_000
    ssm = ts.LinearStateSpaceModel(models.AR(0.3, 0.7, 0.5), (1.0, 0.1))
    _, y = ssm.sample_states(jax.random.PRNGKey(0), T).get_paths()

    conj = inf.NIGAutoregression(
        obs_coeff=1.0, obs_scale=0.1, m0=(0.0, 0.0), v0=4.0, a0=2.0, b0=0.5
    )
    filt = inf.StorvikFilter(conj, N)

    def go(seed=0):
        res = filt.fit(jax.random.PRNGKey(1 + seed), y)
        return float(res.log_likelihood)

    t0 = time.perf_counter()
    go()
    compile_s = time.perf_counter() - t0
    stats = _timeit(go, reps=5)
    stats["compile_s"] = compile_s
    stats["particle_steps_per_sec"] = T * N / stats["min"]

    # plain SISR pass at the true parameters: the no-learning baseline
    sisr = pf.SISR(ssm, N)
    bf = jax.jit(sisr.batch_filter)

    def go_sisr(seed=0):
        return float(bf(jax.random.PRNGKey(1 + seed), y).log_likelihood)

    go_sisr()
    base = _timeit(go_sisr, reps=5)
    stats["sisr_only_min"] = base["min"]
    stats["overhead_factor"] = stats["min"] / base["min"]
    print(json.dumps({"measurement": "storvik", "storvik_n1e5_t400": stats}))


if __name__ == "__main__":
    _enable_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "score"
    {
        "score": run_score,
        "mle": run_mle,
        "etks": run_etks,
        "banksmooth": run_banksmooth,
        "storvik": run_storvik,
    }[which]()
