"""Benchmarks vs the CPU PyTorch reference (BASELINE.md's two target metrics).

Prints ONE JSON line with the headline metric (SISR particle-steps/sec at
N=1e6 on stochastic volatility) plus an ``extra_metrics`` entry for the SMC2
end-to-end wall-clock ratio:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "extra_metrics": [{"metric": "smc2_stochvol_wallclock", ...}]}

``vs_baseline`` compares against the CPU PyTorch reference implementation
(tingiskhan/pyfilter is pure torch — SURVEY.md §0): the reference package and
its deps are not installable here, so minimal, operation-faithful torch
re-implementations of its hot loops are timed on the same workloads:

- metric 1: the SISR step (normalize -> ESS gate -> systematic resample via
  cumsum+searchsorted -> Euler-Maruyama propagate -> log-prob reweight;
  reference sisr.py, resampling.py:24-52, utils.py:49-64);
- metric 2: SMC2 on the stochastic-volatility flagship (reference
  examples/stochastic-volatility.ipynb: APF state filter with bootstrap
  proposal + propagate-to-mean pre-weights inside the parameter-lane SMC of
  smc2.py, with MVN rejuvenation and full re-filtering of the history,
  kernels/mh.py + batch/mcmc/utils.py) at T=200, N=400, K=1000.

CPU measurements are cached in ``.bench_torch_baseline.json`` /
``.bench_smc2_torch.json`` so TPU runs don't re-pay them.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

N_PARTICLES = 1_000_000
# Observations to time. Long enough that the axon tunnel's fixed per-launch
# overhead (~17 ms/executable-launch, measured — pure environment artifact,
# not device work) is <10% of the run: at N_OBS=20 it ate ~45% of the wall
# clock and under-reported device throughput by >2x. Scan length doesn't
# change the compiled body, so the one-time compile cost is unaffected.
N_OBS = 200
DT = 0.2
OES = int(1.0 / DT)  # hidden sub-steps per observation
KAPPA, GAMMA, SIGMA = 0.1, 1.0, 0.05
MU, NU, TAU = 0.0, 0.0, 1.0

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_torch_baseline.json")
_LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_last_good.json")

# timed repetitions per metric. 5, not 3: r02->r03 headline drift (7.03G vs
# 6.80G, no code change) showed min-of-3 through the axon tunnel is not a
# stable estimator — the emitted record now carries min/median/max so drift
# is classifiable as run noise vs regression at a glance (BASELINE.md).
N_REPS = 5


def _timing_stats(times):
    s = sorted(times)
    return {
        "reps": len(s),
        "min_s": s[0],
        "median_s": s[len(s) // 2],
        "max_s": s[-1],
        "spread_pct": 100.0 * (s[-1] - s[0]) / s[0] if s[0] else None,
    }


def _enable_compile_cache():
    """Persist XLA compiles across bench runs. The fused inference
    transitions compile once per (shape, config); without the cache a rare
    mid-run particle doubling pays a fresh ~50 s compile at the doubled
    shape on every process start."""
    from pyfilter_tpu.compile_cache import enable_compile_cache

    path = enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_bench_cache"),
        min_compile_time_secs=1.0,
    )
    if path is None:
        print("compile cache unavailable", file=sys.stderr)


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


def bench_jax(y, profile_dir=None):
    import contextlib

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

    # attributable regressions, not just timed ones: `--profile DIR` wraps
    # the measured runs in a jax.profiler trace (open with xprof/tensorboard)
    trace = (
        jax.profiler.trace(profile_dir) if profile_dir else contextlib.nullcontext()
    )
    times = []
    with trace:
        for i in range(N_REPS):
            k = jax.random.PRNGKey(i + 1)
            t0 = time.perf_counter()
            res = filt.batch_filter(k, y, unroll=4)
            ll = float(res.log_likelihood)
            times.append(time.perf_counter() - t0)

    elapsed = min(times)
    hidden_steps = y.shape[0] * OES
    return N_PARTICLES * hidden_steps / elapsed, ll, _timing_stats(times)


def bench_torch_reference(y, n_obs_torch=30, n_warmup=5):
    """Faithful torch-CPU SISR step (the reference's algorithm and ops).

    Methodology (BASELINE.md): ``n_warmup`` observations run UNTIMED first
    (allocator + thread-pool warmup — short torch runs are warmup-flavored
    and would inflate the JAX-side speedup), then ``n_obs_torch`` >= 30
    observations are timed and converted to particle-steps/s."""
    import numpy as np
    import torch

    torch.manual_seed(0)
    n = N_PARTICLES
    n_total = n_warmup + n_obs_torch
    y_t = torch.from_numpy(np.asarray(y[:n_total]))

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

    def step(t, x, w):
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
        return x, w + base_lp - ladj

    for t in range(n_warmup):  # untimed warmup (see docstring)
        x, w = step(t, x, w)

    start = time.perf_counter()
    for t in range(n_warmup, n_total):
        x, w = step(t, x, w)
    elapsed = time.perf_counter() - start

    hidden_steps = n_obs_torch * OES
    return n * hidden_steps / elapsed


# --------------------------------------------------------------------------
# metric 2: SMC2 end-to-end wall-clock (stoch-vol flagship, scaled to T=200)
# --------------------------------------------------------------------------

SMC2_T = 200
SMC2_N = 400       # state particles (reference notebook: APF 400)
SMC2_K = 1000      # parameter particles (reference notebook: SMC2 1000)
SMC2_STEPS = 2     # PMMH transitions per rejuvenation
SMC2_THRESHOLD = 0.2

_SMC2_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_smc2_torch.json"
)


def bench_smc2_jax(y):
    import jax

    # threefry, not rbg: the headline's bulk 5M-draw steps favor the rbg
    # generator, but SMC2's many small draws + split chains measure 0.91 s
    # (threefry) vs 1.43 s (rbg) on the same seed — and bench_jax sets the
    # global default to rbg, so pin it back here
    jax.config.update("jax_default_prng_impl", "threefry2x32")
    import jax.numpy as jnp

    import pyfilter_tpu as pf
    from pyfilter_tpu import inference as inf
    from pyfilter_tpu.examples import stochastic_volatility_builder

    y = jnp.asarray(y)

    def run(seed):
        ctx = inf.make_context(key=jax.random.PRNGKey(seed))
        filt = pf.APF(stochastic_volatility_builder, SMC2_N, record_moments=False)
        alg = inf.SMC2(
            filt,
            SMC2_K,
            threshold=SMC2_THRESHOLD,
            num_steps=SMC2_STEPS,
            context=ctx,
            key=jax.random.PRNGKey(seed + 1),
            record_moments=False,
        )
        state = alg.fit(y, logging=inf.logging.DefaultLogger())
        return float(jnp.sum(state.w)), ctx, state  # host fetch = sync

    run(0)  # warm the compile caches (chunk scan + rejuvenation shapes)
    # min-of-N: each fit is seed-identical, but the rejuvenation path's host
    # round-trips make single runs jitter by tens of percent through the
    # axon tunnel (0.92-1.39 s observed for the same code + seed)
    times = []
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        _, ctx, state = run(7)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    import numpy as np

    w = np.asarray(state.normalized_weights())
    post = w @ np.asarray(ctx.stack_parameters(True))
    return elapsed, post, _timing_stats(times)


def bench_smc2_torch(y):
    """Operation-faithful torch-CPU SMC2 (the reference's algorithm): APF with
    bootstrap proposal + propagate-to-mean pre-weights over (N, K) tensors,
    parameter-ESS-triggered rejuvenation with lane resampling, MVN proposal
    (SymmetricMH's 1.1-scaled weighted covariance), and ``num_steps`` PMMH
    transitions each re-filtering the FULL parsed history (reference
    smc2.py:53-65, kernels/mh.py:52-108, batch/mcmc/utils.py:14-77; particle
    doubling omitted — it fires rarely and only raises the torch cost)."""
    import numpy as np
    import torch

    torch.manual_seed(0)
    y_t = torch.from_numpy(np.asarray(y, np.float32))
    T, N, K = len(y_t), SMC2_N, SMC2_K
    sqrt_dt = math.sqrt(DT)
    log2pi = math.log(2 * math.pi)

    # priors (reference notebook): kappa~Exp(10), gamma~LogN(0,1),
    # sigma~LogN(log .05,1), mu~N(0,.5), nu~N(0,.15), tau~LogN(0,.1)
    def sample_params(k):
        return torch.stack(
            [
                torch.distributions.Exponential(10.0).sample((k,)).log(),
                torch.randn(k),
                torch.randn(k) + math.log(0.05),
                torch.randn(k) * 0.5,
                torch.randn(k) * 0.15,
                torch.randn(k) * 0.1,
            ],
            dim=1,
        )  # unconstrained: [log kappa, log gamma, log sigma, mu, nu, log tau]

    def log_prior(u):
        lk, lg, ls, mu, nu, lt = u.unbind(1)
        # Exp(10) on kappa with log-jacobian; LogNormal == Normal on logs + |J|
        lp = math.log(10.0) - 10.0 * lk.exp() + lk
        lp = lp - 0.5 * lg.pow(2) - 0.5 * log2pi
        lp = lp - 0.5 * ((ls - math.log(0.05))).pow(2) - 0.5 * log2pi
        lp = lp - 0.5 * (mu / 0.5).pow(2) - 0.5 * log2pi - math.log(0.5)
        lp = lp - 0.5 * (nu / 0.15).pow(2) - 0.5 * log2pi - math.log(0.15)
        lp = lp - 0.5 * (lt / 0.1).pow(2) - 0.5 * log2pi - math.log(0.1)
        return lp

    def normalize(lw, dim=0):
        lw = torch.where(torch.isnan(lw) | torch.isposinf(lw), torch.tensor(-float("inf")), lw)
        m = lw.max(dim=dim, keepdim=True).values
        p = (lw - m).exp()
        return p / p.sum(dim=dim, keepdim=True)

    def systematic_lanes(probs):
        # probs (N, K): one shared uniform per lane (reference resampling.py)
        n = probs.shape[0]
        u = torch.rand(probs.shape[1])
        pos = (torch.arange(n, dtype=probs.dtype)[:, None] + u) / n
        cumw = probs.cumsum(0)
        cumw[-1] = 1.0
        idx = torch.searchsorted(cumw.T.contiguous(), pos.T.contiguous(), right=True)
        return idx.clamp_max(n - 1).T  # (N, K)

    def obs_logpdf(yv, x, mu, nu, tau):
        z_aff = (yv - mu) / x
        z = torch.sinh(torch.asinh(z_aff) / tau - nu)
        base = -0.5 * z.pow(2) - 0.5 * log2pi
        ladj = (
            tau.log()
            + torch.log(torch.cosh((torch.asinh(z) + nu) * tau))
            - 0.5 * torch.log1p(z.pow(2))
            + x.log()
        )
        return base - ladj

    def filter_batch(u_params, ys):
        """Full APF pass over ys; returns (x, w, lane loglik)."""
        kappa, gamma, sigma = u_params[:, 0].exp(), u_params[:, 1].exp(), u_params[:, 2].exp()
        mu, nu, tau = u_params[:, 3], u_params[:, 4], u_params[:, 5].exp()
        x = (gamma + sigma * torch.randn(N, K)).clamp_min(1e-4)
        w = torch.zeros(N, K)
        ll = torch.zeros(K)
        for t in range(len(ys)):
            # pre-weight at the propagated mean (OES deterministic steps)
            m = x
            for _ in range(OES):
                m = (m + kappa * (gamma - m) * m * DT).clamp_min(1e-6)
            pre_w = obs_logpdf(ys[t], m, mu, nu, tau)
            probs = normalize(pre_w + w, dim=0)
            idx = systematic_lanes(probs)
            x = torch.gather(x, 0, idx)
            pre_g = torch.gather(pre_w, 0, idx)
            for _ in range(OES):
                noise = torch.randn(N, K)
                x = (x + kappa * (gamma - x) * x * DT + sigma * x * sqrt_dt * noise).clamp_min(1e-6)
            new_w = obs_logpdf(ys[t], x, mu, nu, tau) - pre_g
            # loglik = log mean exp(new_w) + log sum(norm_prev * exp(pre_w))
            mx = new_w.max(0).values
            step_ll = mx + (new_w - mx).exp().mean(0).log()
            aux = (normalize(w, dim=0) * pre_w.exp()).sum(0).log()
            ll = ll + step_ll + aux
            w = new_w
        return x, w, ll

    start = time.perf_counter()
    params = sample_params(K)
    x, w, ll = filter_batch(params, y_t[:1])
    lane_w = ll.clone()
    prev_ll = ll.clone()

    for t in range(1, T):
        # one APF step (same ops as filter_batch's body)
        kappa, gamma, sigma = params[:, 0].exp(), params[:, 1].exp(), params[:, 2].exp()
        mu, nu, tau = params[:, 3], params[:, 4], params[:, 5].exp()
        m = x
        for _ in range(OES):
            m = (m + kappa * (gamma - m) * m * DT).clamp_min(1e-6)
        pre_w = obs_logpdf(y_t[t], m, mu, nu, tau)
        probs = normalize(pre_w + w, dim=0)
        idx = systematic_lanes(probs)
        x = torch.gather(x, 0, idx)
        pre_g = torch.gather(pre_w, 0, idx)
        for _ in range(OES):
            noise = torch.randn(N, K)
            x = (x + kappa * (gamma - x) * x * DT + sigma * x * sqrt_dt * noise).clamp_min(1e-6)
        new_w = obs_logpdf(y_t[t], x, mu, nu, tau) - pre_g
        mx = new_w.max(0).values
        step_ll = mx + (new_w - mx).exp().mean(0).log()
        aux = (normalize(w, dim=0) * pre_w.exp()).sum(0).log()
        prev_ll = prev_ll + step_ll + aux
        w = new_w
        lane_w = lane_w + step_ll + aux

        probs_l = normalize(lane_w, dim=0)
        ess = 1.0 / probs_l.pow(2).sum()
        if ess < SMC2_THRESHOLD * K or not torch.isfinite(lane_w).all():
            # rejuvenate: lane resample -> MVN -> num_steps PMMH full re-filters
            lidx = systematic_lanes(probs_l[:, None])[:, 0]
            params = params[lidx]
            x = x[:, lidx]
            w = w[:, lidx]
            prev_ll = prev_ll[lidx]
            mean = probs_l @ params
            c = params - mean
            cov = (probs_l[:, None] * c).T @ c * 1.1
            chol = torch.linalg.cholesky(cov + 1e-6 * torch.eye(6))
            for _ in range(SMC2_STEPS):
                # independent MVN draw (SymmetricMH, symmetric -> no q terms)
                prop = mean + torch.randn(K, 6) @ chol.T
                x_new, w_new, ll_new = filter_batch(prop, y_t[: t + 1])
                log_u = torch.rand(K).log()
                accept = log_u < (ll_new + log_prior(prop)) - (prev_ll + log_prior(params))
                a = accept[None, :]
                x = torch.where(a, x_new, x)
                w = torch.where(a, w_new, w)
                prev_ll = torch.where(accept, ll_new, prev_ll)
                params = torch.where(accept[:, None], prop, params)
            lane_w = torch.zeros(K)

    elapsed = time.perf_counter() - start
    return elapsed


def get_smc2_torch_baseline(y):
    if os.path.exists(_SMC2_CACHE):
        with open(_SMC2_CACHE) as f:
            return json.load(f)["wall_clock_sec"]
    try:
        elapsed = bench_smc2_torch(y)
        with open(_SMC2_CACHE, "w") as f:
            json.dump(
                {"wall_clock_sec": elapsed, "t": SMC2_T, "n": SMC2_N, "k": SMC2_K},
                f,
            )
        return elapsed
    except Exception:
        return None


def get_torch_baseline(y):
    if os.path.exists(_CACHE):
        with open(_CACHE) as f:
            return json.load(f)["particle_steps_per_sec"]
    try:
        rate = bench_torch_reference(y)
        with open(_CACHE, "w") as f:
            json.dump(
                {
                    "particle_steps_per_sec": rate,
                    "n_particles": N_PARTICLES,
                    "n_obs_timed": 30,
                    "n_obs_warmup": 5,
                },
                f,
            )
        return rate
    except Exception:
        return None


def _probe_backend(deadline_sec: float = 240.0) -> str | None:
    """Return an error string when the accelerator backend cannot initialize.

    The TPU tunnel has been observed to WEDGE (device init hangs forever in
    ``jax.devices()``, see CLAUDE.md). Probing in a subprocess with a deadline
    turns that hang into an explicit, recorded failure — the benchmark then
    prints its JSON line with an ``error`` field instead of never returning.
    Healthy init through the tunnel takes well under a minute."""
    import subprocess

    probe_src = (
        "import os, jax\n"
        # the axon plugin ignores the JAX_PLATFORMS env var; apply it through
        # the config knob so a CPU-forced run probes the CPU backend (under
        # axon the env var is 'axon' and this is the default behavior)
        "p = os.environ.get('JAX_PLATFORMS')\n"
        "jax.config.update('jax_platforms', p) if p else None\n"
        "jax.devices()\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", probe_src],
            timeout=deadline_sec,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return f"backend init did not respond within {deadline_sec:.0f}s (wedged tunnel?)"
    if proc.returncode != 0:
        return f"backend init failed: {proc.stderr.strip()[-400:]}"
    return None


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--profile",
        nargs="?",
        const="/tmp/pyfilter_tpu_trace",
        default=None,
        help="write a jax.profiler trace of the measured runs to this directory",
    )
    parser.add_argument(
        "--skip-smc2", action="store_true", help="headline metric only"
    )
    args = parser.parse_args()

    err = _probe_backend()
    if err is not None:
        print(f"benchmark aborted: {err}", file=sys.stderr)
        record = {
            "metric": "sisr_stochvol_particle_steps_per_sec_n1e6",
            "value": None,
            "unit": "particle-steps/s",
            "vs_baseline": None,
            "error": err,
        }
        if os.path.exists(_LAST_GOOD):
            # context, clearly labeled: the most recent SUCCESSFUL run's
            # numbers (this run measured nothing)
            with open(_LAST_GOOD) as f:
                record["last_successful_run"] = json.load(f)
        print(json.dumps(record))
        return

    # honor an explicit non-axon JAX_PLATFORMS (e.g. cpu smoke runs): the
    # axon plugin ignores the env var, only the config knob works
    platform = os.environ.get("JAX_PLATFORMS", "")
    if platform and platform != "axon":
        import jax

        jax.config.update("jax_platforms", platform)

    _enable_compile_cache()
    y = _simulate_obs(N_OBS)
    baseline = get_torch_baseline(y)
    try:
        value, _ll, timing = bench_jax(y, profile_dir=args.profile)
    except Exception as exc:  # record the failure; a bare traceback leaves
        # the driver with no JSON line at all
        print(f"headline benchmark FAILED: {exc!r}", file=sys.stderr)
        record = {
            "metric": "sisr_stochvol_particle_steps_per_sec_n1e6",
            "value": None,
            "unit": "particle-steps/s",
            "vs_baseline": None,
            "error": repr(exc)[:800],
        }
        if os.path.exists(_LAST_GOOD):
            with open(_LAST_GOOD) as f:
                record["last_successful_run"] = json.load(f)
        print(json.dumps(record))
        return
    vs_baseline = (value / baseline) if baseline else None

    smc2_extra = []
    if not args.skip_smc2:
        y2 = _simulate_obs(SMC2_T)
        smc2_torch = get_smc2_torch_baseline(y2)
        try:
            smc2_sec, _post, smc2_timing = bench_smc2_jax(y2)
            smc2_extra = [
                {
                    "metric": "smc2_stochvol_wallclock_t200_n400_k1000",
                    "value": smc2_sec,
                    "unit": "s",
                    "vs_baseline": (smc2_torch / smc2_sec) if smc2_torch else None,
                    "torch_cpu_sec": smc2_torch,
                    "timing": smc2_timing,
                }
            ]
        except Exception as exc:  # record the failure — a silent drop reads as a skip
            print(f"SMC2 benchmark FAILED: {exc!r}", file=sys.stderr)
            smc2_extra = [
                {
                    "metric": "smc2_stochvol_wallclock_t200_n400_k1000",
                    "value": None,
                    "unit": "s",
                    "vs_baseline": None,
                    "error": repr(exc),
                }
            ]

    record = {
        "metric": "sisr_stochvol_particle_steps_per_sec_n1e6",
        "value": value,
        "unit": "particle-steps/s",
        "vs_baseline": vs_baseline,
        "timing": timing,
        "extra_metrics": smc2_extra,
    }
    try:
        import subprocess
        import time as _time

        import jax

        # only a real accelerator run is worth remembering — a CPU smoke run
        # would replace the TPU context with meaningless numbers
        if jax.default_backend() != "cpu":
            rev = subprocess.run(
                ["git", "-C", os.path.dirname(os.path.abspath(__file__)), "rev-parse", "--short", "HEAD"],
                capture_output=True,
                text=True,
            ).stdout.strip()
            with open(_LAST_GOOD, "w") as f:
                json.dump({**record, "measured_at_commit": rev, "ts": _time.time()}, f)
    except Exception:
        pass  # last-good is best-effort context, never a bench failure
    print(json.dumps(record))


if __name__ == "__main__":
    main()
