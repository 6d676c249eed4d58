"""Headline benchmark: SISR particle-steps/sec at N=1e6 on stochastic volatility.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against the CPU PyTorch reference implementation
(tingiskhan/pyfilter is pure torch — SURVEY.md §0): the reference package and
its deps are not installable here, so a minimal, operation-faithful torch
re-implementation of its SISR hot loop (normalize -> ESS gate -> systematic
resample via cumsum+searchsorted -> Euler-Maruyama propagate -> log-prob
reweight; reference sisr.py, resampling.py:24-52, utils.py:49-64) is timed on
the same workload. Its measured throughput is cached in
``.bench_torch_baseline.json`` so TPU runs don't re-pay the CPU measurement.
"""

from __future__ import annotations

import json
import math
import os
import time

N_PARTICLES = 1_000_000
N_OBS = 20          # observations to time
DT = 0.2
OES = int(1.0 / DT)  # hidden sub-steps per observation
KAPPA, GAMMA, SIGMA = 0.1, 1.0, 0.05
MU, NU, TAU = 0.0, 0.0, 1.0

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_torch_baseline.json")


def _simulate_obs(n_obs):
    """Host-side data simulation (numpy) shared by both implementations."""
    import numpy as np

    rng = np.random.default_rng(0)
    vol = GAMMA
    ys = []
    for _ in range(n_obs):
        for _ in range(OES):
            vol = vol + KAPPA * (GAMMA - vol) * vol * DT + SIGMA * vol * math.sqrt(DT) * rng.normal()
            vol = max(vol, 1e-4)
        z = rng.normal()
        ys.append(MU + vol * math.sinh((math.asinh(z) + NU) * TAU))
    return np.asarray(ys, np.float32)


def bench_jax(y):
    import jax

    # rbg is substantially faster than threefry on TPU for bulk normal draws
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    import pyfilter_tpu as pf
    from pyfilter_tpu import examples

    model = examples.stochastic_volatility_model(KAPPA, GAMMA, SIGMA, MU, NU, TAU, dt=DT)
    filt = pf.SISR(model, N_PARTICLES, record_moments=False)

    key = jax.random.PRNGKey(0)
    y = jnp.asarray(y)

    # warmup/compile; the host fetch forces real completion (block_until_ready
    # returns early through the axon TPU tunnel)
    res = filt.batch_filter(key, y, unroll=4)
    ll = float(res.log_likelihood)

    times = []
    for i in range(3):
        k = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        res = filt.batch_filter(k, y, unroll=4)
        ll = float(res.log_likelihood)
        times.append(time.perf_counter() - t0)

    elapsed = min(times)
    hidden_steps = y.shape[0] * OES
    return N_PARTICLES * hidden_steps / elapsed, ll


def bench_torch_reference(y, n_obs_torch=3):
    """Faithful torch-CPU SISR step (the reference's algorithm and ops)."""
    import numpy as np
    import torch

    torch.manual_seed(0)
    n = N_PARTICLES
    y_t = torch.from_numpy(np.asarray(y[:n_obs_torch]))

    kappa, gamma, sigma = KAPPA, GAMMA, SIGMA
    sqrt_dt = math.sqrt(DT)

    x = torch.distributions.Normal(gamma, sigma).sample((n,)).clamp_min(1e-4)
    w = torch.zeros(n)

    def normalize(lw):
        lw = torch.where(torch.isnan(lw) | torch.isposinf(lw), torch.tensor(-float("inf")), lw)
        m = lw.max()
        probs = (lw - m).exp()
        return probs / probs.sum()

    def systematic(probs):
        u = torch.rand(())
        positions = (torch.arange(n, dtype=probs.dtype) + u) / n
        cumw = probs.cumsum(0)
        cumw[-1] = 1.0
        return torch.searchsorted(cumw, positions, right=True).clamp_max(n - 1)

    start = time.perf_counter()
    for t in range(n_obs_torch):
        probs = normalize(w)
        ess = 1.0 / probs.pow(2).sum()
        if ess < 0.9 * n:
            idx = systematic(probs)
            x = x[idx]
            w = torch.zeros(n)
        for _ in range(OES):
            noise = torch.randn(n)
            x = x + kappa * (gamma - x) * x * DT + sigma * x * sqrt_dt * noise
        x = x.clamp_min(1e-6)
        # sinh-arcsinh observation log-prob (reference TransformedDistribution path)
        z_aff = (y_t[t] - MU) / x
        z = torch.sinh(torch.asinh(z_aff) / TAU - NU)
        base_lp = -0.5 * z.pow(2) - 0.5 * math.log(2 * math.pi)
        ladj = (
            math.log(TAU)
            + torch.log(torch.cosh((torch.asinh(z) + NU) * TAU))
            - 0.5 * torch.log1p(z.pow(2))
            + torch.log(x)
        )
        w = w + base_lp - ladj
    elapsed = time.perf_counter() - start

    hidden_steps = n_obs_torch * OES
    return n * hidden_steps / elapsed


def get_torch_baseline(y):
    if os.path.exists(_CACHE):
        with open(_CACHE) as f:
            return json.load(f)["particle_steps_per_sec"]
    try:
        rate = bench_torch_reference(y)
        with open(_CACHE, "w") as f:
            json.dump({"particle_steps_per_sec": rate, "n_particles": N_PARTICLES}, f)
        return rate
    except Exception:
        return None


def main():
    y = _simulate_obs(N_OBS)
    baseline = get_torch_baseline(y)
    value, _ll = bench_jax(y)

    vs_baseline = (value / baseline) if baseline else None
    print(
        json.dumps(
            {
                "metric": "sisr_stochvol_particle_steps_per_sec_n1e6",
                "value": value,
                "unit": "particle-steps/s",
                "vs_baseline": vs_baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
