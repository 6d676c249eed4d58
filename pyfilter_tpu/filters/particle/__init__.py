"""Particle filters (reference pyfilter/filters/particle/)."""

from . import proposals
from .apf import APF
from .base import ParticleFilter
from .gpf import GPF
from .sisr import SISR

__all__ = ["ParticleFilter", "SISR", "APF", "GPF", "proposals"]
