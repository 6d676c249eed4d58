"""Worked example 7 — the Gaussian filter family + gradient-based estimation.

Capabilities beyond the reference (which is particle-only and gradient-free
outside the pyro bridge):

1. filter the nonlinear sine-diffusion SSM with the exact-family trio —
   `ExtendedKalmanFilter` (autodiff Jacobians) and `UnscentedKalmanFilter`
   (sigma points) — against a large optimal-proposal APF;
2. estimate a model parameter by Adam directly on the DIFFERENTIABLE particle
   filter's marginal likelihood (`inference.fit_mle`, Ścibior–Wood
   stop-gradient resampling correction);
3. sample the joint parameter/trajectory posterior with `inference.PGAS`
   (particle Gibbs with ancestor sampling).

Run:  python examples/gaussian_filters_and_gradients.py [--quick] [--out DIR]
"""

from __future__ import annotations

import argparse
import math
import os

import jax

jax.config.update("jax_platforms", os.environ.get("PYFILTER_PLATFORM", "cpu"))

import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import pyfilter_tpu as pf  # noqa: E402
from pyfilter_tpu import distributions as dist, inference as inf, timeseries as ts  # noqa: E402
from pyfilter_tpu.examples import maybe_enable_compile_cache  # noqa: E402

maybe_enable_compile_cache()  # PYFILTER_COMPILE_CACHE=<dir> persists XLA compiles
from pyfilter_tpu.filters.particle import proposals  # noqa: E402

GAMMA_TRUE = 0.4


def build_ssm(gamma, dt=0.05):
    drift = lambda x, gamma_, sigma: (jnp.sin(x.value - gamma_), sigma)
    sine = ts.AffineEulerMaruyama(
        drift,
        (gamma, 1.0),
        dist.Normal(0.0, math.sqrt(dt)),
        lambda g, s: dist.Normal(0.0, 1.0),
        dt=dt,
    )
    return ts.LinearStateSpaceModel(sine, (1.0, 0.1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small sizes for CI")
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "output"))
    args = p.parse_args()

    n_obs = 80 if args.quick else 300
    n_particles = 200 if args.quick else 1_000
    mle_steps = 40 if args.quick else 200
    pgas_samples = 60 if args.quick else 500

    ssm = build_ssm(GAMMA_TRUE)
    x_true, y = ssm.sample_states(jax.random.PRNGKey(0), n_obs).get_paths()
    x_np = np.asarray(x_true)

    # -- 1. the Gaussian family vs a big particle filter ----------------------
    runs = {}
    ekf = pf.ExtendedKalmanFilter(ssm).batch_filter(y)
    runs["EKF"] = (np.asarray(ekf.filter_means)[:, 0], float(ekf.log_likelihood))
    ukf = pf.UnscentedKalmanFilter(ssm).batch_filter(y)
    runs["UKF"] = (np.asarray(ukf.filter_means)[:, 0], float(ukf.log_likelihood))
    apf = pf.APF(ssm, n_particles, proposal=proposals.LinearGaussianObservations())
    pf_res = apf.batch_filter(jax.random.PRNGKey(1), y)
    runs[f"APF({n_particles})"] = (
        np.asarray(pf_res.filter_means),
        float(pf_res.log_likelihood),
    )
    for name, (means, ll) in runs.items():
        rmse = float(np.sqrt(np.mean((means - x_np) ** 2)))
        print(f"{name:>10}: loglik = {ll:9.2f}   RMSE = {rmse:.4f}")

    sm_means, _ = pf.UnscentedKalmanFilter(ssm).smooth(y)
    sm_rmse = float(np.sqrt(np.mean((np.asarray(sm_means)[:, 0] - x_np) ** 2)))
    print(f"{'UKF-RTS':>10}: smoothed RMSE = {sm_rmse:.4f}")

    # -- 2. maximum likelihood on the differentiable particle filter ----------
    def build_model(ctx):
        # sin(x - gamma) is periodic in gamma — a bounded prior keeps the
        # posterior on one identifiable branch
        gamma = ctx.named_parameter("gamma", dist.Uniform(-1.0, 1.0))
        return build_ssm(gamma)

    mle = inf.fit_mle(
        build_model,
        y,
        filter_factory=lambda bm: pf.SISR(bm, max(n_particles // 4, 64)),
        key=jax.random.PRNGKey(2),
        num_steps=mle_steps,
        learning_rate=5e-2,
    )
    gamma_hat = float(mle.parameters()["gamma"])
    print(f"fit_mle: gamma = {gamma_hat:.3f} (true {GAMMA_TRUE})")

    # -- 3. joint posterior by particle Gibbs with ancestor sampling ----------
    # PGAS shines when the trajectory/parameter conditionals are informative
    # without being degenerate — the classic AR(1) joint-inference workload.
    # (A drift parameter inside a nearly-deterministic SDE mixes poorly under
    # ANY particle-Gibbs sampler; use PMMH for that shape of posterior.)
    from pyfilter_tpu.timeseries import models as ts_models

    BETA_TRUE, SIGMA_TRUE = 0.7, 0.4
    ar_true = ts.LinearStateSpaceModel(
        ts_models.AR(0.2, BETA_TRUE, SIGMA_TRUE), (1.0, 0.3)
    )
    _, y_ar = ar_true.sample_states(jax.random.PRNGKey(9), max(2 * n_obs, 160)).get_paths()

    def build_ar(ctx):
        beta = ctx.named_parameter("beta", dist.Uniform(0.0, 1.0))
        sigma = ctx.named_parameter("sigma", dist.LogNormal(-1.0, 1.0))
        return ts.LinearStateSpaceModel(ts_models.AR(0.2, beta, sigma), (1.0, 0.3))

    with inf.make_context(key=jax.random.PRNGKey(3)) as ctx:
        filt = pf.SISR(build_ar, 64)
        alg = inf.PGAS(filt, pgas_samples, rw_scale=0.08, context=ctx)
        res = alg.fit(y_ar)
    beta_chain = res.samples["beta"]
    burn = len(beta_chain) // 4
    print(
        f"PGAS (AR(1)): beta posterior = {beta_chain[burn:].mean():.3f} "
        f"+- {beta_chain[burn:].std():.3f}  (true {BETA_TRUE}, "
        f"acceptance {res.acceptance_rate:.2f})"
    )

    # -- plot ------------------------------------------------------------------
    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 1, figsize=(10, 7))
    t = range(n_obs)
    axes[0].plot(t, x_np, "k-", lw=1, label="latent truth")
    for (name, (means, _)), style in zip(runs.items(), ("C0-", "C2-", "C1--")):
        axes[0].plot(t, means, style, lw=1, label=name)
    axes[0].set(title="Gaussian filter family vs particle filter (sine diffusion)")
    axes[0].legend(loc="best", frameon=False)

    axes[1].plot(beta_chain, "C0-", lw=0.7, label="PGAS beta chain (AR(1))")
    axes[1].axhline(BETA_TRUE, color="k", ls=":", label="true beta")
    axes[1].set(
        xlabel="iteration",
        ylabel="beta",
        title=f"PGAS joint posterior — gamma MLE on sine: {gamma_hat:.2f} (true {GAMMA_TRUE})",
    )
    axes[1].legend(loc="best", frameon=False)

    path = os.path.join(args.out, "gaussian_filters_and_gradients.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    print("wrote", path)


if __name__ == "__main__":
    main()
