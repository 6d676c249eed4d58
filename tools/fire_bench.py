import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
"""In-scan A/B harness for the N=1e6 resample fire (run from repo root).

Keep log-weights FIXED across steps (the changing key defeats hoisting):
a per-step additive ramp degenerates the weights and routes every fire to
the XLA fallback, which silently benchmarks the wrong path.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pyfilter_tpu.ops.expand import systematic_expand

N = 1_000_000
T = 50


def make_logw(key, ess_frac):
    # log-weights with roughly the requested ESS fraction
    sigma = {0.99: 0.1, 0.4: 1.0, 0.014: 2.6}[ess_frac]
    return sigma * jax.random.normal(key, (N,))


def bench(ess_frac, d):
    key = jax.random.PRNGKey(0)
    logw = make_logw(key, ess_frac)
    vals = tuple(jax.random.normal(jax.random.fold_in(key, i), (N,)) for i in range(d))
    if d == 1:
        vals = vals[0]

    def step(carry, _):
        logw, vals, k = carry
        k, sub = jax.random.split(k)
        out, idx = systematic_expand(sub, logw, vals)
        # the key + values mutate, so nothing hoists; logw stays in-regime
        return (logw, out, k), None

    @jax.jit
    def run(c):
        return jax.lax.scan(step, c, None, length=T)

    c0 = (logw, vals, jax.random.PRNGKey(1))
    out, _ = run(c0)
    jax.block_until_ready(out)
    float(np.asarray(out[1][0][0]) if isinstance(out[1], tuple) else np.asarray(out[1][0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out, _ = run(c0)
        float(np.asarray(out[1][0][0]) if isinstance(out[1], tuple) else np.asarray(out[1][0]))
        best = min(best, time.perf_counter() - t0)
    print(f"ess~{ess_frac:5} d={d}: {best / T * 1e3:.3f} ms/fire")


for ess in (0.99, 0.4, 0.014):
    bench(ess, 3)
