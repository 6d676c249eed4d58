"""Filter layer (reference pyfilter/filters/)."""

from . import particle
from .base import BaseFilter
from .block import BlockParticleFilter, BlockPFState
from .diagnostics import crps, predictive_pit
from .ekf import EKFState, ExtendedKalmanFilter
from .enkf import EnKFState, EnsembleKalmanFilter
from .etkf import EnsembleTransformKalmanFilter, Localization, gaspari_cohn
from .gsf import GaussianSumFilter, GSFState
from .imm import IMMState, InteractingMultipleModel, MarkovSwitchingModel
from .kalman import KalmanFilter, KalmanState
from .marginal import GaussianMarginalFilter
from .particle import APF, GPF, SISR, SQMC, ParticleFilter
from .rbpf import LinearSubstructure, RaoBlackwellizedPF
from .result import FilterHistory, FilterResult
from .ukf import CubatureKalmanFilter, UnscentedKalmanFilter
from .state import ParticleFilterCorrection, ParticleFilterPrediction

# reference import-path aliases (pyfilter.filters exports Prediction/Correction,
# filters/__init__.py:1-4)
Prediction = ParticleFilterPrediction
Correction = ParticleFilterCorrection

__all__ = [
    "BaseFilter",
    "BlockParticleFilter",
    "BlockPFState",
    "predictive_pit",
    "crps",
    "KalmanFilter",
    "KalmanState",
    "ExtendedKalmanFilter",
    "EKFState",
    "UnscentedKalmanFilter",
    "CubatureKalmanFilter",
    "GaussianSumFilter",
    "GSFState",
    "InteractingMultipleModel",
    "IMMState",
    "MarkovSwitchingModel",
    "EnsembleKalmanFilter",
    "EnsembleTransformKalmanFilter",
    "Localization",
    "gaspari_cohn",
    "GaussianMarginalFilter",
    "EnKFState",
    "RaoBlackwellizedPF",
    "LinearSubstructure",
    "ParticleFilter",
    "SISR",
    "APF",
    "GPF",
    "SQMC",
    "FilterResult",
    "FilterHistory",
    "ParticleFilterCorrection",
    "ParticleFilterPrediction",
    "Prediction",
    "Correction",
    "particle",
]
