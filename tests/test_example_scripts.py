"""The worked examples must execute end-to-end in --quick mode and write
their plots (VERDICT r1 'ship worked examples'; reference examples/*.ipynb)."""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPTS = [
    "sine_apf.py",
    "stochastic_volatility_smc2.py",
    "lorenz_ness.py",
    "nutria_svi.py",
    "numpyro_interop.py",
    "spmd_scaling.py",
    "gaussian_filters_and_gradients.py",
    "batch_inference_zoo.py",
    "online_smoothing_ensembles.py",
    "streaming_and_switching.py",
    "qmc_blocks_and_variance.py",
]


@pytest.mark.slow
@pytest.mark.parametrize("script", SCRIPTS)
def test_example_runs_quick(script, tmp_path):
    # share the suite's persistent compile cache with the subprocess: on a
    # cold single-core run the scripts' own compile stacks otherwise race
    # the timeout while the rest of the suite saturates the host (one
    # observed 900 s timeout for the SMC2 example during a fully cold run)
    env = dict(
        os.environ,
        PYFILTER_COMPILE_CACHE=os.path.join(os.path.dirname(__file__), ".jax_cache"),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "examples", script), "--quick", "--out", str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=_ROOT,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    pngs = list(tmp_path.glob("*.png"))
    assert pngs, proc.stdout
