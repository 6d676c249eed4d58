"""Particle MCMC (reference inference/batch/mcmc/)."""

from . import proposals
from .pgas import PGAS, PGASResult, csmc_sweep
from .pmmh import PMMH
from .proposals import AdaptiveRandomWalk, BaseProposal, GradientBasedProposal, RandomWalk, SymmetricMH
from .state import PMMHResult
from .utils import PMMHStep, run_pmmh

__all__ = [
    "PMMH",
    "PGAS",
    "PGASResult",
    "csmc_sweep",
    "PMMHResult",
    "run_pmmh",
    "PMMHStep",
    "BaseProposal",
    "RandomWalk",
    "AdaptiveRandomWalk",
    "SymmetricMH",
    "GradientBasedProposal",
    "proposals",
]
