"""Particle filters (reference pyfilter/filters/particle/)."""

from . import proposals
from .apf import APF
from .base import ParticleFilter
from .gpf import GPF
from .sisr import SISR
from .smoothing import ffbsi_smooth, paris, transition_log_sup

__all__ = [
    "ParticleFilter",
    "SISR",
    "APF",
    "GPF",
    "proposals",
    "ffbsi_smooth",
    "paris",
    "transition_log_sup",
]
