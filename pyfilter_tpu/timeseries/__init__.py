"""TPU-native model layer — the stochproc equivalent (SURVEY.md §2.9)."""

from . import models
from .affine import affine_transform
from .joint import JointDistribution, JointProcess, joint_process
from .process import (
    AffineEulerMaruyama,
    AffineProcess,
    LinearModel,
    StructuralStochasticProcess,
)
from .ssm import LinearStateSpaceModel, StateSpaceModel
from .state import StateSpacePath, TimeseriesState

__all__ = [
    "TimeseriesState",
    "StateSpacePath",
    "StructuralStochasticProcess",
    "AffineProcess",
    "AffineEulerMaruyama",
    "LinearModel",
    "JointProcess",
    "JointDistribution",
    "joint_process",
    "StateSpaceModel",
    "LinearStateSpaceModel",
    "affine_transform",
    "models",
]
