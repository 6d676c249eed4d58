"""Filter layer (reference pyfilter/filters/)."""

from . import particle
from .base import BaseFilter
from .kalman import KalmanFilter, KalmanState
from .particle import APF, GPF, SISR, ParticleFilter
from .result import FilterHistory, FilterResult
from .state import ParticleFilterCorrection, ParticleFilterPrediction

__all__ = [
    "BaseFilter",
    "KalmanFilter",
    "KalmanState",
    "ParticleFilter",
    "SISR",
    "APF",
    "GPF",
    "FilterResult",
    "FilterHistory",
    "ParticleFilterCorrection",
    "ParticleFilterPrediction",
    "particle",
]
