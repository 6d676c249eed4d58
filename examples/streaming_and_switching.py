"""Worked example 10 — round-5 capabilities: streaming MLE, learned
regime-switching, and the new smoother family.

Three capabilities beyond the reference:

1. `inference.fit_mle_streaming` — O(1)-memory maximum likelihood on an
   endless observation stream: the PaRIS online score (Poyiadjis et al.
   2011) drives one Adam step per window, carrying only the particle cloud;
   no recorded history, no reprocessing. Watch the parameter trajectory
   converge as the stream flows.
2. `GaussianMarginalFilter(kind="imm")` — the Markov-switching transition
   matrix as a LEARNED parameter: the builder computes the (2, 2) matrix
   from a context parameter and exact-likelihood PMMH (no particles, no
   pseudo-marginal noise) recovers the regime stickiness from
   block-switching volatility data.
3. The smoother family: the IMM's Kim (1994) smoother sharpens regime
   classification over the filtered probabilities, and the Gaussian-sum
   smoother carries BOTH modes of a sign-ambiguous quadratic observation
   backward in time.

Run:  python examples/streaming_and_switching.py [--quick] [--out DIR]
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
from pyfilter_tpu import distributions as dist, inference as inf, timeseries as ts  # noqa: E402
from pyfilter_tpu.examples import maybe_enable_compile_cache  # noqa: E402
from pyfilter_tpu.inference.score import fit_mle_streaming  # noqa: E402
from pyfilter_tpu.timeseries import models  # noqa: E402

maybe_enable_compile_cache()

ALPHA_TRUE, BETA_TRUE, SIGMA_TRUE, OBS_STD = 0.2, 0.7, 0.4, 0.25


def part_1_streaming_mle(args, out):
    print("\n=== 1. streaming MLE: one Adam step per window, O(1) memory ===")
    t_obs = 1_000 if args.quick else 10_000
    ssm = ts.LinearStateSpaceModel(
        models.AR(ALPHA_TRUE, BETA_TRUE, SIGMA_TRUE), (1.0, OBS_STD)
    )
    _, y = ssm.sample_states(jax.random.PRNGKey(0), t_obs).get_paths()

    def build(ctx):
        beta = ctx.named_parameter("beta", dist.Normal(0.0, 2.0))
        sigma = ctx.named_parameter("sigma", dist.LogNormal(-1.0, 1.0))
        return ts.LinearStateSpaceModel(
            models.AR(ALPHA_TRUE, beta, sigma), (1.0, OBS_STD)
        )

    t0 = time.perf_counter()
    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
        ctx.set_batch_shape(())
        build(ctx)
        ctx.update_parameter("beta", jnp.asarray(0.2))  # deliberately wrong
        ctx.update_parameter("sigma", jnp.asarray(0.8))
        res = fit_mle_streaming(
            build, y, lambda b: pf.SISR(b, 500), jax.random.PRNGKey(2),
            window=25, learning_rate=3e-2, context=ctx,
        )
    wall = time.perf_counter() - t0
    fitted = res.parameters()
    print(f"  T={t_obs}, {res.theta_path.shape[0]} windows, {wall:.1f} s")
    print(f"  beta:  start 0.20 -> {float(fitted['beta']):.3f}  (true {BETA_TRUE})")
    print(f"  sigma: start 0.80 -> {float(fitted['sigma']):.3f}  (true {SIGMA_TRUE})")

    path = np.asarray(res.theta_path)
    _save_plot(out, "streaming_mle_path.png", lambda ax: (
        ax.plot(path[:, 0], label="beta (unconstrained)"),
        ax.plot(path[:, 1], label="log sigma"),
        ax.axhline(BETA_TRUE, ls="--", c="gray"),
        ax.axhline(np.log(SIGMA_TRUE), ls=":", c="gray"),
        ax.set_xlabel("window"), ax.legend(),
        ax.set_title("streaming MLE parameter trajectory"),
    ))
    return fitted


def part_2_learned_switching(args, out):
    print("\n=== 2. learning the Markov transition matrix by exact marginal PMMH ===")
    t_obs, block = (200, 40) if args.quick else (400, 50)
    rng = np.random.default_rng(3)
    regime = (np.arange(t_obs) // block) % 2
    x = np.zeros(t_obs, np.float32)
    prev = 0.0
    for t in range(t_obs):
        prev = 0.9 * prev + (0.1, 1.0)[regime[t]] * rng.normal()
        x[t] = prev
    y = jnp.asarray(x + 0.1 * rng.normal(size=t_obs).astype(np.float32))

    def build_switching(ctx):
        p_stay = ctx.named_parameter("p_stay", dist.Uniform(0.5, 0.999))
        p = jnp.asarray(p_stay)[..., None, None]
        eye = jnp.eye(2)
        trans = p * eye + (1.0 - p) * (1.0 - eye)
        low = ts.LinearStateSpaceModel(models.AR(0.0, 0.9, 0.1), (1.0, 0.1))
        high = ts.LinearStateSpaceModel(models.AR(0.0, 0.9, 1.0), (1.0, 0.1))
        return pf.MarkovSwitchingModel((low, high), trans)

    n_samples = 150 if args.quick else 400
    t0 = time.perf_counter()
    with inf.make_context(key=jax.random.PRNGKey(4)) as ctx:
        pmmh = inf.PMMH(
            pf.GaussianMarginalFilter(build_switching, kind="imm"),
            n_samples, num_chains=4,
            proposal=inf.RandomWalk(scale=0.15),
            initializer="seed", context=ctx,
        )
        res = pmmh.fit(y)
    wall = time.perf_counter() - t0
    s = np.asarray(res.samples["p_stay"])[n_samples // 3:].reshape(-1)
    print(f"  {n_samples} samples x 4 chains in {wall:.1f} s (exact likelihood)")
    print(f"  p_stay posterior: {s.mean():.3f} +/- {s.std():.3f} "
          f"(true per-step stay prob ~{1 - 1 / block:.3f})")

    # 3a. and the Kim smoother sharpens the regime classification
    low = ts.LinearStateSpaceModel(models.AR(0.0, 0.9, 0.1), (1.0, 0.1))
    high = ts.LinearStateSpaceModel(models.AR(0.0, 0.9, 1.0), (1.0, 0.1))
    p_hat = float(s.mean())
    trans = np.array([[p_hat, 1 - p_hat], [1 - p_hat, p_hat]], np.float32)
    imm = pf.InteractingMultipleModel([low, high], trans)
    filt_res = imm.batch_filter(y)
    _, _, lp_s, _ = imm.smooth(y)
    acc_f = float(np.mean(np.argmax(np.asarray(filt_res.aux), axis=1) == regime))
    acc_s = float(np.mean(np.argmax(np.asarray(lp_s), axis=1) == regime))
    print(f"  regime accuracy: filtered {acc_f:.3f} -> Kim-smoothed {acc_s:.3f}")

    _save_plot(out, "switching_regimes.png", lambda ax: (
        ax.plot(np.exp(np.asarray(lp_s))[:, 1], label="P(high vol | all data)"),
        ax.plot(regime, ls=":", c="gray", label="true regime"),
        ax.set_xlabel("t"), ax.legend(), ax.set_title("Kim-smoothed regime path"),
    ))
    return s.mean()


def part_3_gsf_smoother(args, out):
    print("\n=== 3. Gaussian-sum smoother holds both modes backward in time ===")
    rw = ts.AffineProcess(
        lambda x, s: (x.value, s), (0.05,),
        dist.Normal(0.0, 1.0), lambda s: dist.Normal(0.0, jnp.sqrt(2.0)),
    )
    ssm = ts.StateSpaceModel(rw, lambda x, sc: dist.Normal(x.value**2, sc), (0.2,))
    _, y = ssm.sample_states(jax.random.PRNGKey(5), 60).get_paths()

    gsf = pf.GaussianSumFilter(ssm, n_components=4, spread=0.7)
    mean, var, (m_k, p_k, log_w) = gsf.smooth(y)
    w = np.exp(np.asarray(log_w))
    print(f"  component weights after 60 obs: {np.round(w, 3)}")
    print(f"  smoothed component means at t=30: {np.round(np.asarray(m_k)[:, 30, 0], 3)}"
          f"  (+/- pairs = the two modes)")
    return w


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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small sizes for CI")
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "output"))
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    fitted = part_1_streaming_mle(args, args.out)
    p_stay = part_2_learned_switching(args, args.out)
    weights = part_3_gsf_smoother(args, args.out)

    assert abs(float(fitted["beta"]) - BETA_TRUE) < 0.2
    assert p_stay > 0.85
    assert np.isfinite(weights).all()
    print("\nall three capabilities ran end-to-end")


if __name__ == "__main__":
    main()
