"""Where the FFBSi backward step spends its time (on-chip breakdown).

Times one full smoothing pass at N=J=1e5 under ablations of
``backward_indices``'s knobs:

- ``max_rounds`` sweep (the R·J candidate work vs fallback-failure trade);
- ``fallback_subset`` sweep (the streaming-categorical pass is O(N·k_sub)
  per firing, and at J=1e5 the expected failure count per step is ~J·(1-a)^R
  — i.e. the fallback FIRES on essentially every backward step, so its cost
  is steady-state, not rare).

Usage: python tools/ffbsi_breakdown.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import pyfilter_tpu as pf
    from pyfilter_tpu import timeseries as ts
    from pyfilter_tpu.compile_cache import enable_compile_cache
    from pyfilter_tpu.filters.particle import transition_log_sup
    from pyfilter_tpu.filters.particle.smoothing import ffbsi_smooth
    from pyfilter_tpu.timeseries import models

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_bench_cache")
    )

    T, N = 200, 100_000
    model = ts.LinearStateSpaceModel(models.AR(0.2, 0.7, 0.4), (1.0, 0.25))
    _, y = model.sample_states(jax.random.PRNGKey(0), T).get_paths()
    log_sup = transition_log_sup(model)
    filt = pf.SISR(model, N, record_states=True, record_moments=False)
    hist = jax.jit(filt.batch_filter)(jax.random.PRNGKey(1), y).states

    def timed(tag, **kw):
        smooth = jax.jit(
            lambda k, h: ffbsi_smooth(
                k, model, h, filt.resampler, log_density_sup=log_sup, **kw
            )
        )
        t0 = time.perf_counter()
        _ = float(smooth(jax.random.PRNGKey(2), hist)[0, 0])
        compile_s = time.perf_counter() - t0
        times = []
        for r in range(3):
            t0 = time.perf_counter()
            _ = float(smooth(jax.random.PRNGKey(10 + r), hist)[0, 0])
            times.append(time.perf_counter() - t0)
        print(json.dumps({"config": tag, "min": min(times), "compile_s": compile_s, **kw}), flush=True)
        return min(times)

    timed("default_r16_sub_auto")
    for r in (8, 12, 24):
        timed(f"rounds_{r}", max_rounds=r)
    for sub in (32, 64, 512):
        timed(f"sub_{sub}", fallback_subset=sub)
    timed("r24_sub32", max_rounds=24, fallback_subset=32)


if __name__ == "__main__":
    main()
