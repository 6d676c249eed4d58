"""Particle filters (reference pyfilter/filters/particle/)."""

from . import proposals
from .apf import APF
from .base import ParticleFilter
from .gpf import GPF
from .sisr import SISR
from .sqmc import SQMC, SQMCState
from .smoothing import ffbsi_smooth, paris, transition_log_sup
from .variance import (
    VarianceEstimate,
    eve_indices,
    filter_mean_variance,
    lag_ancestor_indices,
    log_likelihood_variance,
)

__all__ = [
    "ParticleFilter",
    "SISR",
    "APF",
    "GPF",
    "SQMC",
    "SQMCState",
    "proposals",
    "ffbsi_smooth",
    "paris",
    "transition_log_sup",
    "VarianceEstimate",
    "eve_indices",
    "lag_ancestor_indices",
    "log_likelihood_variance",
    "filter_mean_variance",
]
