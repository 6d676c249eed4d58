"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes its backends; importing this
conftest is the first thing pytest does, so do it here.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config knob works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: repeat suite runs skip XLA compiles entirely —
# much faster, and fewer compiles means less exposure to rare LLVM-compile
# segfaults observed on this single-core host. The cache is keyed by a host
# CPU-feature fingerprint: XLA AOT entries written by a different-CPU host
# load anyway ("prefer-no-scatter is not supported on the host machine") and
# silently change float results (seen as a spurious NaN in one NESS lane), so
# each host population gets its own subdirectory.
from pyfilter_tpu.compile_cache import enable_compile_cache  # noqa: E402

_cache_dir = enable_compile_cache(
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
    min_compile_time_secs=0.5,
)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running statistical tests")


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_state_per_module():
    # XLA's CPU backend aborts/segfaults inside LLVM after hundreds of
    # in-process compilations on this single-core host (observed in test_ops,
    # then test_parallel once test_ops was shielded). Clearing the in-process
    # caches at every module boundary keeps the compile count per LLVM
    # context bounded; the persistent disk cache makes the re-misses cheap.
    jax.clear_caches()


@pytest.fixture
def key():
    return jax.random.PRNGKey(123)
