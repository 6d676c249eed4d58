"""Worked example 8 — the batch-inference zoo + predictive model criticism.

One AR(1) state-space model with unknown (beta, sigma); three ways to learn
them, each a different statistical contract:

1. `inference.PMMH` — exact Bayesian posterior by pseudo-marginal MCMC
   (the reference's batch algorithm, fused chain scan);
2. `inference.TemperedSMC` — the same posterior by density-tempered SMC
   (Duan & Fulop): adaptive likelihood-temperature ladder, MH refreshes, and
   the model LOG-EVIDENCE as a free byproduct;
3. `inference.IF2` — the maximum-likelihood estimate by iterated filtering
   (Ionides et al., pomp's mif2): a cooled parameter swarm on the lane axis.

Then the fitted model is criticized out-of-sample with the one-step-ahead
PIT histogram and CRPS (`filters.predictive_pit` / `filters.crps`) — under a
well-specified model the PIT values are iid Uniform(0,1).

Run:  python examples/batch_inference_zoo.py [--quick] [--out DIR]
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
from pyfilter_tpu import distributions as dist, inference as inf, timeseries as ts  # noqa: E402
from pyfilter_tpu.examples import maybe_enable_compile_cache  # noqa: E402

maybe_enable_compile_cache()  # PYFILTER_COMPILE_CACHE=<dir> persists XLA compiles
from pyfilter_tpu.filters import crps, predictive_pit  # noqa: E402
from pyfilter_tpu.timeseries import models  # noqa: E402

BETA_TRUE, SIGMA_TRUE, OBS_SCALE = 0.7, 0.3, 0.2


def build_ssm(beta=BETA_TRUE, sigma=SIGMA_TRUE):
    return ts.LinearStateSpaceModel(models.AR(0.0, beta, sigma), (1.0, OBS_SCALE))


def build_model(ctx):
    beta = ctx.named_parameter("beta", dist.Uniform(0.0, 1.0))
    sigma = ctx.named_parameter("sigma", dist.LogNormal(-1.0, 0.5))
    return build_ssm(beta, sigma)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small sizes for CI")
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "output"))
    args = p.parse_args()

    n_obs = 120 if args.quick else 400
    n_state = 100 if args.quick else 300
    n_theta = 200 if args.quick else 600
    pmmh_samples = 150 if args.quick else 1_500

    _, y = build_ssm().sample_states(jax.random.PRNGKey(0), n_obs).get_paths()

    # -- 1. PMMH: pseudo-marginal MCMC posterior -------------------------------
    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
        pmmh = inf.PMMH(
            pf.SISR(build_model, n_state),
            pmmh_samples,
            num_chains=4,
            # the reference's 1e-2 default random walk needs thousands of
            # samples to traverse this posterior; widen it for the short run
            proposal=inf.RandomWalk(scale=0.08),
            initializer="seed",
            context=ctx,
        )
        pmmh_res = pmmh.fit(y)
    burn = pmmh_samples // 3
    pmmh_beta = np.asarray(pmmh_res.samples["beta"])[burn:].reshape(-1)
    pmmh_sigma = np.asarray(pmmh_res.samples["sigma"])[burn:].reshape(-1)
    print(
        f"PMMH:        beta = {pmmh_beta.mean():.3f} +- {pmmh_beta.std():.3f}, "
        f"sigma = {pmmh_sigma.mean():.3f} +- {pmmh_sigma.std():.3f}  "
        f"(true {BETA_TRUE}, {SIGMA_TRUE})"
    )

    # -- 2. TemperedSMC: same posterior + log-evidence -------------------------
    with inf.make_context(key=jax.random.PRNGKey(2)) as ctx:
        tsmc = inf.TemperedSMC(pf.SISR(build_model, n_state), n_theta, context=ctx)
        tsmc_res = tsmc.fit(y)
    t_beta, t_sigma = tsmc_res.samples["beta"], tsmc_res.samples["sigma"]
    print(
        f"TemperedSMC: beta = {t_beta.mean():.3f} +- {t_beta.std():.3f}, "
        f"sigma = {t_sigma.mean():.3f} +- {t_sigma.std():.3f}   "
        f"ladder {np.round(tsmc_res.lambdas, 3)}, "
        f"log-evidence {tsmc_res.log_evidence:.1f}"
    )

    # -- 3. IF2: maximum likelihood by iterated filtering ----------------------
    with inf.make_context(key=jax.random.PRNGKey(3)) as ctx:
        if2 = inf.IF2(
            pf.SISR(build_model, n_state),
            n_theta,
            num_iterations=10 if args.quick else 25,
            sigma=0.1,
            cooling=0.88,
            context=ctx,
        )
        if2_res = if2.fit(y)
    print(
        f"IF2 MLE:     beta = {if2_res.mle['beta']:.3f}, "
        f"sigma = {if2_res.mle['sigma']:.3f}   "
        f"(final-pass loglik {if2_res.log_likelihoods[-1]:.1f})"
    )

    # -- 4. criticize the fitted model out-of-sample ---------------------------
    _, y_test = build_ssm().sample_states(jax.random.PRNGKey(4), n_obs).get_paths()
    fitted = build_ssm(float(if2_res.mle["beta"]), float(if2_res.mle["sigma"]))
    res = pf.SISR(fitted, n_state, record_states=True).batch_filter(
        jax.random.PRNGKey(5), y_test
    )
    u = np.asarray(predictive_pit(jax.random.PRNGKey(6), fitted, res, y_test))
    c = np.asarray(crps(jax.random.PRNGKey(7), fitted, res, y_test))
    print(
        f"model check: PIT mean {u.mean():.3f} var {u.var():.4f} "
        f"(uniform: 0.500, 0.0833), mean CRPS {c.mean():.4f}"
    )

    # -- plot ------------------------------------------------------------------
    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    axes[0].hist(pmmh_beta, bins=30, density=True, alpha=0.5, label="PMMH")
    axes[0].hist(t_beta, bins=30, density=True, alpha=0.5, label="TemperedSMC")
    axes[0].axvline(BETA_TRUE, color="k", ls=":", label="truth")
    axes[0].axvline(if2_res.mle["beta"], color="C3", ls="--", label="IF2 MLE")
    axes[0].set(title="beta: posterior vs MLE", xlabel="beta")
    axes[0].legend(frameon=False)

    axes[1].plot(if2_res.theta_trace["beta"], "C3.-", label="beta swarm mean")
    axes[1].axhline(BETA_TRUE, color="k", ls=":")
    axes[1].set(title="IF2 cooling trace", xlabel="iteration")
    axes[1].legend(frameon=False)

    axes[2].hist(u, bins=20, range=(0, 1), density=True, color="C0", alpha=0.7)
    axes[2].axhline(1.0, color="k", ls=":")
    axes[2].set(title="one-step-ahead PIT (fitted model)", xlabel="u")

    path = os.path.join(args.out, "batch_inference_zoo.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    print("wrote", path)


if __name__ == "__main__":
    main()
