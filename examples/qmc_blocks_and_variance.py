"""Worked example 11 — round-5 capabilities: SQMC, the block particle
filter, and single-run variance estimation.

Three capabilities beyond the reference:

1. `pf.SQMC` — sequential quasi-Monte Carlo (Gerber & Chopin 2015): the
   whole filtering pass runs on randomized low-discrepancy points
   (Hilbert-ordered inverse-CDF resampling + icdf propagation). Same law,
   much tighter log-likelihood estimates — the example measures the
   replicate variance against the bootstrap filter at equal N.
2. `pf.BlockParticleFilter` — localized resampling (Rebeschini & van
   Handel 2015) for high-dimensional state spaces: at d=32 the global
   bootstrap filter's weights collapse onto a handful of particles while
   the block filter keeps every block's ESS healthy and tracks the state.
3. `filters.particle.log_likelihood_variance` — Chan-Lai/Lee-Whiteley
   genealogy variance estimates from ONE run: the practical recipe for
   choosing the particle count so PMMH mixes (Var(log L) ~ 1), without
   replicate pilot runs.

Run:  python examples/qmc_blocks_and_variance.py [--quick] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import time

import jax

jax.config.update("jax_platforms", os.environ.get("PYFILTER_PLATFORM", "cpu"))

import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import pyfilter_tpu as pf  # noqa: E402
from pyfilter_tpu import distributions as dist, timeseries as ts  # noqa: E402
from pyfilter_tpu.examples import maybe_enable_compile_cache  # noqa: E402
from pyfilter_tpu.filters.particle import log_likelihood_variance  # noqa: E402
from pyfilter_tpu.timeseries import models  # noqa: E402

maybe_enable_compile_cache()

ALPHA, BETA, SIGMA, OBS_STD = 0.2, 0.7, 0.4, 0.3


def ar_ssm():
    return ts.LinearStateSpaceModel(models.AR(ALPHA, BETA, SIGMA), (1.0, OBS_STD))


def _save_plot(out, name, draw):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 3.2))
        draw(ax)
        fig.tight_layout()
        fig.savefig(os.path.join(out, name), dpi=110)
        plt.close(fig)
        print(f"  wrote {os.path.join(out, name)}")
    except Exception as exc:  # matplotlib is optional
        print(f"  (plot skipped: {exc})")


def part_1_sqmc(args, out):
    print("\n=== 1. SQMC: quasi-Monte Carlo variance reduction ===")
    t_len = 30 if args.quick else 60
    n = 256 if args.quick else 512
    reps = 8 if args.quick else 16
    ssm = ar_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(0), t_len).get_paths()
    y = jnp.asarray(y, jnp.float32)

    bf_sq = jax.jit(pf.SQMC(ssm, n).batch_filter)
    bf_mc = jax.jit(
        pf.SISR(ssm, n, ess_threshold=1.1, fused_resample=False).batch_filter
    )
    t0 = time.perf_counter()
    lls_sq = [float(bf_sq(jax.random.PRNGKey(i), y).log_likelihood) for i in range(reps)]
    lls_mc = [float(bf_mc(jax.random.PRNGKey(i), y).log_likelihood) for i in range(reps)]
    wall = time.perf_counter() - t0
    v_sq, v_mc = np.var(lls_sq), np.var(lls_mc)
    print(f"  N={n}, T={t_len}, {reps} replicates each ({wall:.1f} s)")
    print(f"  bootstrap Var(log L): {v_mc:.4f}   SQMC: {v_sq:.4f}   "
          f"reduction {v_mc / max(v_sq, 1e-12):.1f}x")

    _save_plot(out, "sqmc_replicates.png", lambda ax: (
        ax.plot(lls_mc, "o-", alpha=0.7, label=f"bootstrap (var {v_mc:.3f})"),
        ax.plot(lls_sq, "s-", alpha=0.7, label=f"SQMC (var {v_sq:.3f})"),
        ax.set_xlabel("replicate"), ax.set_ylabel("log-likelihood estimate"),
        ax.legend(), ax.set_title("same N, same model — RQMC tightens the estimate"),
    ))


def part_2_blockpf(args, out):
    print("\n=== 2. block particle filter: resampling that survives d=32 ===")
    d = 16 if args.quick else 32
    t_len = 20 if args.quick else 30
    n = 256

    def mean_scale(x, decay, mix, q):
        v = x.value
        neigh = 0.5 * (jnp.roll(v, 1, axis=-1) + jnp.roll(v, -1, axis=-1))
        return decay * ((1.0 - mix) * v + mix * neigh), q

    hidden = ts.AffineProcess(
        mean_scale,
        (jnp.asarray(0.9), jnp.asarray(0.2), jnp.asarray(SIGMA)),
        dist.Normal(jnp.zeros(d), jnp.ones(d)).to_event(1),
        lambda *_: dist.Normal(jnp.zeros(d), jnp.ones(d)).to_event(1),
    )
    ssm = ts.LinearStateSpaceModel(hidden, (1.0, OBS_STD), event_shape=(d,))
    x, y = ssm.sample_states(jax.random.PRNGKey(1), t_len).get_paths()

    res_b = jax.jit(pf.BlockParticleFilter(ssm, n, block_size=2).batch_filter)(
        jax.random.PRNGKey(2), y
    )
    res_g = jax.jit(pf.SISR(ssm, n, fused_resample=False).batch_filter)(
        jax.random.PRNGKey(2), y
    )
    rmse_b = float(jnp.sqrt(jnp.mean((res_b.filter_means - x) ** 2)))
    rmse_g = float(jnp.sqrt(jnp.mean((res_g.filter_means - x) ** 2)))
    print(f"  d={d}, N={n}: state RMSE  block={rmse_b:.3f}  global={rmse_g:.3f}")
    print(f"  mean per-block relative ESS: {float(jnp.mean(res_b.aux)):.2f}")

    dim = d // 2
    _save_plot(out, "block_pf_tracking.png", lambda ax: (
        ax.plot(np.asarray(x)[:, dim], "k-", label="true state"),
        ax.plot(np.asarray(res_b.filter_means)[:, dim], label=f"block PF (RMSE {rmse_b:.2f})"),
        ax.plot(np.asarray(res_g.filter_means)[:, dim], "--", label=f"global PF (RMSE {rmse_g:.2f})"),
        ax.set_xlabel("t"), ax.legend(),
        ax.set_title(f"one of d={d} coupled dimensions"),
    ))


def part_3_variance_tuning(args, out):
    print("\n=== 3. tuning PMMH's N from ONE run: Var(log L) ~ 1 ===")
    t_len = 60 if args.quick else 150
    ssm = ar_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(3), t_len).get_paths()
    y = jnp.asarray(y, jnp.float32)

    sizes = [64, 128, 256] if args.quick else [64, 128, 256, 512, 1024]
    rows = []
    for n in sizes:
        filt = pf.SISR(ssm, n, record_states=True, fused_resample=False)
        res = jax.jit(filt.batch_filter)(jax.random.PRNGKey(4), y)
        # full-Eve saturates on long histories; the lag estimator stays live
        est = log_likelihood_variance(res, lag=20)
        rows.append((n, float(est.variance[-1])))
        print(f"  N={n:5d}: estimated Var(log L) = {rows[-1][1]:.2f}")
    good = [n for n, v in rows if v <= 1.5]
    print(f"  -> smallest N with Var(log L) <= 1.5: {good[0] if good else '>'+str(sizes[-1])}")

    _save_plot(out, "variance_vs_n.png", lambda ax: (
        ax.loglog([r[0] for r in rows], [r[1] for r in rows], "o-"),
        ax.axhline(1.0, ls="--", c="gray"),
        ax.set_xlabel("particles N"), ax.set_ylabel("estimated Var(log L)"),
        ax.set_title("single-run genealogy estimate (lag=20)"),
    ))


def part_4_sqmc_pmmh(args, out):
    print("\n=== 4. PMMH with a guided-SQMC likelihood: near-noiseless marginal ===")
    from pyfilter_tpu import inference as inf

    t_len = 60 if args.quick else 100
    n_samples = 80 if args.quick else 200

    def true_model():
        return ts.LinearStateSpaceModel(
            models.OrnsteinUhlenbeck(0.5, 1.0, 0.1), (1.0, 0.05)
        )

    def build_model(ctx):
        k = ctx.named_parameter("kappa", dist.Exponential(1.0))
        g = ctx.named_parameter("gamma", dist.Normal(0.0, 1.0))
        s = ctx.named_parameter("sigma", dist.LogNormal(-2.0, 1.0))
        return ts.LinearStateSpaceModel(
            models.OrnsteinUhlenbeck(k, g, s), (1.0, 0.05)
        )

    _, y = true_model().sample_states(jax.random.PRNGKey(5), t_len).get_paths()
    t0 = time.perf_counter()
    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
        filt = pf.SQMC(build_model, 128, proposal="linear_gaussian")
        alg = inf.PMMH(
            filt, num_samples=n_samples, num_chains=4,
            proposal=inf.RandomWalk(scale=5e-2),
            context=ctx, key=jax.random.PRNGKey(2),
        )
        res = alg.fit(y, logging=inf.logging.DefaultLogger())
    wall = time.perf_counter() - t0
    ch = res.as_arrays()
    half = n_samples // 2
    move = np.mean(ch["gamma"][1:] != ch["gamma"][:-1])
    print(f"  {n_samples} samples x 4 chains at N=128 particles ({wall:.1f} s)")
    print(f"  gamma: {ch['gamma'][half:].mean():.2f} (true 1.0)   "
          f"sigma: {ch['sigma'][half:].mean():.3f} (true 0.10)")
    print(f"  chain move rate {move:.2f} — a noisy pseudo-marginal at N=128 would stick")

    _save_plot(out, "sqmc_pmmh_chains.png", lambda ax: (
        [ax.plot(ch["gamma"][:, c], alpha=0.6) for c in range(ch["gamma"].shape[1])],
        ax.axhline(1.0, ls="--", c="gray"),
        ax.set_xlabel("sample"), ax.set_ylabel("gamma"),
        ax.set_title("PMMH chains on a guided-SQMC likelihood (N=128)"),
    ))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "output"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    part_1_sqmc(args, args.out)
    part_2_blockpf(args, args.out)
    part_3_variance_tuning(args, args.out)
    part_4_sqmc_pmmh(args, args.out)
    print("\ndone.")


if __name__ == "__main__":
    main()
