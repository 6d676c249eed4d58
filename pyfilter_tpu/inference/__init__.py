"""Joint state/parameter inference (reference pyfilter/inference/)."""

from . import batch, diagnostics, prior, sequential, variational
from .base import BaseAlgorithm
from .diagnostics import effective_sample_size, potential_scale_reduction, summarize_chains
from .batch import IF2, IF2Result, TemperedSMC, TemperedSMCResult
from .batch.mcmc import PGAS, PMMH, AdaptiveRandomWalk, GradientBasedProposal, RandomWalk, SymmetricMH, run_pmmh
from .context import (
    InferenceContext,
    NotSamePriorError,
    ParameterDoesNotExist,
    QuasiInferenceContext,
    make_context,
)
from .parameter import PriorBoundParameter
from .qmc import EngineContainer
from .sequential import (
    NESS,
    NESSMC2,
    SMC2,
    SMC2FW,
    FixedWidthNESS,
    NIGARUnknownObsVariance,
    NIGAutoregression,
    NIGVectorAutoregression,
    PoissonGammaCounts,
    StorvikFilter,
    StorvikResult,
)
from .state import (
    AlgorithmState,
    FilterAlgorithmState,
    RunningFilterResult,
    SequentialAlgorithmState,
    SMC2State,
)
from .utils import QuasiMultivariateNormal, calc_mean_chol, construct_mvn
from .score import OnlineScoreResult, StreamingMLEResult, fit_mle_streaming, online_score
from .variational import MLEResult, SVIResult, fit_mle, fit_svi

__all__ = [
    "InferenceContext",
    "QuasiInferenceContext",
    "make_context",
    "NotSamePriorError",
    "ParameterDoesNotExist",
    "PriorBoundParameter",
    "EngineContainer",
    "BaseAlgorithm",
    "SMC2",
    "NESS",
    "StorvikFilter",
    "online_score",
    "fit_mle_streaming",
    "OnlineScoreResult",
    "StreamingMLEResult",
    "StorvikResult",
    "NIGAutoregression",
    "NIGARUnknownObsVariance",
    "NIGVectorAutoregression",
    "PoissonGammaCounts",
    "FixedWidthNESS",
    "NESSMC2",
    "SMC2FW",
    "PMMH",
    "PGAS",
    "IF2",
    "IF2Result",
    "TemperedSMC",
    "TemperedSMCResult",
    "run_pmmh",
    "RandomWalk",
    "AdaptiveRandomWalk",
    "SymmetricMH",
    "GradientBasedProposal",
    "AlgorithmState",
    "FilterAlgorithmState",
    "SequentialAlgorithmState",
    "SMC2State",
    "RunningFilterResult",
    "construct_mvn",
    "calc_mean_chol",
    "QuasiMultivariateNormal",
    "prior",
    "sequential",
    "batch",
    "variational",
    "fit_svi",
    "fit_mle",
    "MLEResult",
    "SVIResult",
    "diagnostics",
    "potential_scale_reduction",
    "effective_sample_size",
    "summarize_chains",
]
