"""Proposal distributions for particle filters (reference §2.4)."""

from .approximate import GaussianLinear, GaussianLinearized, GaussianProposal
from .base import Proposal, get_pre_weight_func
from .bootstrap import Bootstrap
from .linear import LinearGaussianObservations
from .linearized import Linearized
from .local_linearization import LocalLinearization
from .nested import NestedProposal
from .utils import find_mode, find_optimal_density, linear_marginal_density

__all__ = [
    "Proposal",
    "Bootstrap",
    "LinearGaussianObservations",
    "Linearized",
    "LocalLinearization",
    "GaussianProposal",
    "GaussianLinearized",
    "GaussianLinear",
    "NestedProposal",
    "find_optimal_density",
    "find_mode",
    "linear_marginal_density",
    "get_pre_weight_func",
]
