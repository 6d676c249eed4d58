"""A/B the recording-config cost cliff on SMC2 (PERF.md; VERDICT r2 weak #8).

Recording configs silently drop SMC2 off the fused dispatch tiers:
``record_moments=True`` (the constructor default) excludes the in-scan
rejuvenation (its moment histories are host lists gathered eagerly), and
``record_states=True`` on the filter additionally drops every rejuvenation
re-filter to the full ``batch_filter`` (the masked fused core can't record).
This script measures the three configurations on the flagship SMC2 config
(T=200, APF N=400, K=1000) so the cliff is a documented number, not a
surprise.

Run ON THE TPU: python tools/record_cost_ab.py  (min-of-3, compile-cached)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_bench_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import pyfilter_tpu as pf
from pyfilter_tpu import examples, inference as inf

T, N, K, STEPS = 200, 400, 1000, 2


def simulate():
    model = examples.stochastic_volatility_model()
    path = model.sample_states(jax.random.PRNGKey(11), T * model.observe_every_step)
    ys = path.y
    return ys[~jnp.isnan(ys)]


def run_fit(y, record_moments, record_states, seed=7):
    ctx = inf.make_context(key=jax.random.PRNGKey(seed))
    filt = pf.APF(
        examples.stochastic_volatility_builder,
        N,
        record_moments=record_moments,
        record_states=record_states,
    )
    alg = inf.SMC2(
        filt, K, num_steps=STEPS, context=ctx,
        key=jax.random.PRNGKey(seed + 1), record_moments=record_moments,
    )
    state = alg.fit(y, logging=inf.logging.DefaultLogger())
    return float(jnp.sum(state.w))  # host fetch = sync


def measure(y, label, **cfg):
    run_fit(y, **cfg)  # warm compile caches
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_fit(y, **cfg)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"| {label} | {best:.2f} s | {', '.join(f'{t:.2f}' for t in times)} |")
    return best


def main():
    jax.config.update("jax_default_prng_impl", "threefry2x32")
    y = simulate()
    print(f"backend: {jax.default_backend()}, T={T}, N={N}, K={K}")
    print("| config | min wall | runs |")
    print("|---|---|---|")
    base = measure(y, "record_moments=False (fused in-scan rejuvenation)",
                   record_moments=False, record_states=False)
    mom = measure(y, "record_moments=True (default; eager moment gathers)",
                  record_moments=True, record_states=False)
    st = measure(y, "record_states=True (full batch_filter re-filters)",
                 record_moments=True, record_states=True)
    print(f"\ncliff: moments {mom / base:.2f}x, states {st / base:.2f}x vs fused base")


if __name__ == "__main__":
    main()
