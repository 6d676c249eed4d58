"""Worked example 9 — round-4 capabilities: Storvik online parameter
learning, O(N) rejection-FFBSi smoothing, and localized ensembles.

Three capabilities beyond the reference (which learns parameters offline or
by jittering, smooths with the O(N^2) FFBS only, and has no ensemble family):

1. `inference.StorvikFilter` learns AR(1) parameters ONLINE from exact
   per-particle conjugate posteriors (Storvik 2002) — no jittering knobs, no
   reprocessing; watch the running posterior means converge as data arrives;
2. `ParticleFilter.smooth(method="ffbsi")` — rejection-sampling FFBSi (Douc
   et al. 2011) draws backward trajectories in O(N) expected work per step,
   matching the exact O(N*M) FFBS in law at particle counts FFBS cannot touch;
3. `EnsembleTransformKalmanFilter` with Gaspari-Cohn `Localization`: at
   ensemble sizes M << d the unlocalized EnKF diverges on spurious long-range
   sample correlations; the LETKF tracks near the observation-noise floor.

Run:  python examples/online_smoothing_ensembles.py [--quick] [--out DIR]
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
from pyfilter_tpu.timeseries import models  # noqa: E402

maybe_enable_compile_cache()  # PYFILTER_COMPILE_CACHE=<dir> persists XLA compiles

ALPHA_TRUE, BETA_TRUE, SIGMA_TRUE, OBS_STD = 0.3, 0.6, 0.5, 0.15


def ring_ssm(d, q_std=0.3, obs_std=0.25, decay=0.95, mix=0.2):
    """Locally-coupled ring diffusion observed elementwise — short true
    correlation length, the setting covariance localization exists for."""

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
    return ts.LinearStateSpaceModel(hidden, (1.0, obs_std), event_shape=(d,))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="small sizes for CI")
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "output"))
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # -- 1. Storvik: exact-conjugate online parameter learning -----------------
    t_obs = 300 if args.quick else 1_500
    n_part = 500 if args.quick else 4_000
    true_model = ts.LinearStateSpaceModel(
        models.AR(ALPHA_TRUE, BETA_TRUE, SIGMA_TRUE), (1.0, OBS_STD)
    )
    _, y = true_model.sample_states(jax.random.PRNGKey(0), t_obs).get_paths()

    conj = inf.NIGAutoregression(obs_scale=OBS_STD, v0=4.0, a0=2.0, b0=0.5)
    res = inf.StorvikFilter(conj, n_part).fit(jax.random.PRNGKey(1), y)
    a_path, b_path, s2_path = (np.asarray(m) for m in res.param_means)
    print("Storvik online posterior means (final):")
    print(f"  alpha = {a_path[-1]:.3f} (true {ALPHA_TRUE})")
    print(f"  beta  = {b_path[-1]:.3f} (true {BETA_TRUE})")
    print(f"  sigma = {np.sqrt(s2_path[-1]):.3f} (true {SIGMA_TRUE})")

    # -- 2. rejection-FFBSi at particle counts exact FFBS cannot touch ---------
    n_smooth = 4_000 if args.quick else 100_000
    m_traj = 256
    x_s, y_s = true_model.sample_states(jax.random.PRNGKey(2), 200).get_paths()
    filt = pf.SISR(true_model, n_smooth, record_states=True)
    fres = filt.batch_filter(jax.random.PRNGKey(3), y_s)
    t0 = time.perf_counter()
    traj = filt.smooth(
        jax.random.PRNGKey(4), fres, method="ffbsi", n_trajectories=m_traj
    )
    traj_mean = np.asarray(traj.mean(axis=1))
    wall = time.perf_counter() - t0
    sm_rmse = float(np.sqrt(np.mean((traj_mean[1:] - np.asarray(x_s)) ** 2)))
    f_rmse = float(np.sqrt(np.mean((np.asarray(fres.filter_means) - np.asarray(x_s)) ** 2)))
    print(
        f"FFBSi: N={n_smooth}, M={m_traj} trajectories in {wall:.2f}s "
        f"(smoothed RMSE {sm_rmse:.4f} vs filter {f_rmse:.4f})"
    )

    # -- 3. LETKF: localization at M << d ---------------------------------------
    d = 128 if args.quick else 512
    m_size, t_steps = 20 if args.quick else 40, 12
    ssm = ring_ssm(d)
    x_path, y_path = ssm.sample_states(jax.random.PRNGKey(5), t_steps).get_paths()
    x_np = np.asarray(x_path)

    idx = jnp.arange(d, dtype=jnp.float32)
    ring_metric = lambda a, b: jnp.minimum(jnp.abs(a - b).sum(-1), d - jnp.abs(a - b).sum(-1))
    loc = pf.Localization.from_coords(idx, radius=4.0, metric=ring_metric)

    def site_rmse(filt):
        r = filt.batch_filter(jax.random.PRNGKey(6), jnp.asarray(y_path, jnp.float32))
        return np.sqrt(np.mean((np.asarray(r.filter_means) - x_np) ** 2, axis=1))

    rmse_unloc = site_rmse(pf.EnsembleKalmanFilter(ssm, m_size))
    rmse_letkf = site_rmse(
        pf.EnsembleTransformKalmanFilter(ssm, m_size, localization=loc, inflation=1.05)
    )
    print(
        f"d={d}, M={m_size}: final RMSE unlocalized EnKF {rmse_unloc[-1]:.3f} "
        f"vs localized ETKF {rmse_letkf[-1]:.3f} (obs noise 0.25)"
    )

    # -- plots -------------------------------------------------------------------
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(3, 1, figsize=(10, 10))
    steps = np.arange(len(a_path))
    for path, truth, label in (
        (a_path, ALPHA_TRUE, r"$\alpha$"),
        (b_path, BETA_TRUE, r"$\beta$"),
        (np.sqrt(s2_path), SIGMA_TRUE, r"$\sigma$"),
    ):
        axes[0].plot(steps, path, label=f"{label} online posterior mean")
        axes[0].axhline(truth, ls=":", color="gray")
    axes[0].set_title("Storvik filter: online parameter learning (dotted = truth)")
    axes[0].legend(loc="upper right")

    axes[1].plot(np.asarray(x_s), color="gray", lw=0.8, label="true state")
    axes[1].plot(np.asarray(fres.filter_means), lw=0.8, label="filter mean")
    axes[1].plot(traj_mean[1:], lw=0.8, label=f"FFBSi mean (N={n_smooth})")
    axes[1].set_title("Rejection-FFBSi smoothing")
    axes[1].legend(loc="upper right")

    axes[2].plot(rmse_unloc, label="EnKF, no localization")
    axes[2].plot(rmse_letkf, label="LETKF, Gaspari-Cohn r=4")
    axes[2].axhline(0.25, ls=":", color="gray", label="obs noise")
    axes[2].set_title(f"Ring diffusion d={d}, ensemble M={m_size}")
    axes[2].set_xlabel("assimilation step")
    axes[2].set_ylabel("state RMSE")
    axes[2].legend(loc="upper right")

    path = os.path.join(args.out, "online_smoothing_ensembles.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
