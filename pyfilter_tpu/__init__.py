"""pyfilter-tpu — a TPU-native sequential Monte Carlo framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
tingiskhan/pyfilter (particle filters, proposal distributions, smoothing, and
particle-filter-based joint state/parameter inference), built functional-first:
filters are pure step functions over pytrees, time loops are ``lax.scan``,
parameter particles / MCMC chains are a vmapped-and-shardable lane axis, and
randomness is explicit ``jax.random`` keys.
"""

__version__ = "0.1.0"

from . import distributions, resampling, utils
from .utils import get_ess, log_likelihood, normalize

__all__ = ["distributions", "resampling", "utils", "normalize", "get_ess", "log_likelihood"]
