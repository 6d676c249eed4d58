"""Sequential (online) joint inference algorithms (reference inference/sequential/)."""

from . import collectors, kernels, threshold
from .base import CombinedSequentialParticleAlgorithm, SequentialParticleAlgorithm
from .collectors import Collector, MeanCollector, ParameterPosterior, Standardizer
from .ness import NESS, BaseOnlineAlgorithm, FixedWidthNESS
from .nessmc2 import NESSMC2, SMC2FW
from .smc2 import SMC2
from .storvik import (
    NIGARUnknownObsVariance,
    NIGAutoregression,
    NIGVectorAutoregression,
    PoissonGammaCounts,
    StorvikFilter,
    StorvikResult,
)
from .threshold import ConstantThreshold, DecayingThreshold, IntervalThreshold, Thresholder

__all__ = [
    "SequentialParticleAlgorithm",
    "CombinedSequentialParticleAlgorithm",
    "BaseOnlineAlgorithm",
    "NESS",
    "StorvikFilter",
    "StorvikResult",
    "NIGAutoregression",
    "NIGARUnknownObsVariance",
    "NIGVectorAutoregression",
    "PoissonGammaCounts",
    "FixedWidthNESS",
    "SMC2",
    "NESSMC2",
    "SMC2FW",
    "Thresholder",
    "ConstantThreshold",
    "DecayingThreshold",
    "IntervalThreshold",
    "Collector",
    "MeanCollector",
    "Standardizer",
    "ParameterPosterior",
    "kernels",
    "threshold",
    "collectors",
]
