"""Particle MCMC (reference inference/batch/mcmc/)."""

from . import proposals
from .pmmh import PMMH
from .proposals import BaseProposal, GradientBasedProposal, RandomWalk, SymmetricMH
from .state import PMMHResult
from .utils import PMMHStep, run_pmmh

__all__ = [
    "PMMH",
    "PMMHResult",
    "run_pmmh",
    "PMMHStep",
    "BaseProposal",
    "RandomWalk",
    "SymmetricMH",
    "GradientBasedProposal",
    "proposals",
]
