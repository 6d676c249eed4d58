"""pyfilter-tpu — a TPU-native sequential Monte Carlo framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
tingiskhan/pyfilter (particle filters, proposal distributions, smoothing, and
particle-filter-based joint state/parameter inference), built functional-first:
filters are pure step functions over pytrees, time loops are ``lax.scan``,
parameter particles / MCMC chains are a vmapped-and-shardable lane axis, and
randomness is explicit ``jax.random`` keys.
"""

__version__ = "0.3.0"

from . import distributions, examples, filters, inference, interop, io, ops, parallel, resampling, timeseries, utils
from .compile_cache import enable_compile_cache
from .filters import (
    APF,
    GPF,
    SISR,
    SQMC,
    ExtendedKalmanFilter,
    FilterResult,
    UnscentedKalmanFilter,
    CubatureKalmanFilter,
    GaussianSumFilter,
    InteractingMultipleModel,
    MarkovSwitchingModel,
    BlockParticleFilter,
    EnsembleKalmanFilter,
    EnsembleTransformKalmanFilter,
    Localization,
    GaussianMarginalFilter,
    KalmanFilter,
    ParticleFilter,
    RaoBlackwellizedPF,
)
from .inference import NESS, NESSMC2, PMMH, SMC2, SMC2FW, make_context
from .utils import get_ess, log_likelihood, normalize

__all__ = [
    "distributions",
    "filters",
    "examples",
    "io",
    "ops",
    "parallel",
    "KalmanFilter",
    "ExtendedKalmanFilter",
    "UnscentedKalmanFilter",
    "CubatureKalmanFilter",
    "GaussianSumFilter",
    "InteractingMultipleModel",
    "MarkovSwitchingModel",
    "BlockParticleFilter",
    "EnsembleKalmanFilter",
    "EnsembleTransformKalmanFilter",
    "Localization",
    "GaussianMarginalFilter",
    "RaoBlackwellizedPF",
    "timeseries",
    "resampling",
    "utils",
    "enable_compile_cache",
    "normalize",
    "get_ess",
    "log_likelihood",
    "ParticleFilter",
    "SISR",
    "APF",
    "GPF",
    "SQMC",
    "FilterResult",
    "inference",
    "interop",
    "make_context",
    "SMC2",
    "NESS",
    "NESSMC2",
    "SMC2FW",
    "PMMH",
]
