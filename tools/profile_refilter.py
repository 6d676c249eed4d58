"""Profile the APF masked re-filter at the SMC2 flagship shape (N=400, K=1000).

Measures per-obs cost of batch_filter_masked at full T=256 bucket, and
optionally wraps a run in a jax.profiler trace (--trace DIR).
"""
import os, sys, time
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", os.path.join(_repo, ".jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pyfilter_tpu as pf
from pyfilter_tpu import inference as inf
from pyfilter_tpu.examples import stochastic_volatility_builder
from pyfilter_tpu.filters.base import pad_observations

N, K, T = 400, 1000, 200

# synthesize y like bench._simulate_obs
import math
rng = np.random.default_rng(0)
DT = 0.2; OES = 5
KAPPA, GAMMA, SIGMA, MU, NU, TAU = 0.1, 1.0, 0.05, 0.0, 0.0, 1.0
vol = GAMMA; ys = []
for _ in range(T):
    for _ in range(OES):
        vol = vol + KAPPA*(GAMMA-vol)*vol*DT + SIGMA*vol*math.sqrt(DT)*rng.normal()
        vol = max(vol, 1e-4)
    z = rng.normal()
    ys.append(MU + vol*math.sinh((math.asinh(z)+NU)*TAU))
y = np.asarray(ys, np.float32)

ctx = inf.make_context(key=jax.random.PRNGKey(0))
filt = pf.APF(stochastic_volatility_builder, N, record_moments=False)
filt = filt.set_batch_shape((K,))
ctx.set_batch_shape((K,))
filt = filt.initialize_model(ctx)
ctx.initialize_parameters()
filt = filt.initialize_model(ctx)

y_padded, n_valid = pad_observations(y, bucket=256)
key = jax.random.PRNGKey(1)

def run(nv):
    res = filt.batch_filter_masked(key, y_padded, nv)
    return float(jnp.sum(res.log_likelihood))

t0 = time.perf_counter(); run(200)
print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)

for nv in (40, 200):
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); run(nv)
        ts.append(time.perf_counter() - t0)
    print(f"n_valid={nv}: {min(ts)*1e3:8.1f} ms total, {min(ts)/nv*1e3:6.3f} ms/obs", flush=True)

if "--trace" in sys.argv:
    with jax.profiler.trace("/tmp/prof_refilter"):
        run(200)
    print("trace written to /tmp/prof_refilter", flush=True)
