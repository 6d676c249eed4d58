"""JAX-native distribution layer for pyfilter-tpu.

Replaces the pyro-ppl / torch.distributions dependency of the reference
(SURVEY.md §2.9). Distributions are immutable pytrees safe under jit/vmap/scan.
"""

from . import bijectors, constraints
from .base import Distribution
from .bijectors import (
    Affine,
    Bijector,
    Chain,
    Exp,
    Identity,
    Log,
    Power,
    Sigmoid,
    SinhArcsinh,
    Softplus,
    Tanh,
    biject_to,
)
from .core import (
    Bernoulli,
    Beta,
    Binomial,
    Categorical,
    Cauchy,
    Delta,
    Exponential,
    Gamma,
    InverseGamma,
    Laplace,
    LogNormal,
    NegativeBinomial,
    Normal,
    Poisson,
    StudentT,
    Uniform,
    Weibull,
)
from .independent import Independent
from .mvn import MultivariateNormal, robust_cholesky
from .transformed import TransformedDistribution

__all__ = [
    "Distribution",
    "Normal",
    "LogNormal",
    "Uniform",
    "Exponential",
    "Gamma",
    "InverseGamma",
    "Beta",
    "StudentT",
    "Categorical",
    "Delta",
    "Poisson",
    "Bernoulli",
    "Binomial",
    "NegativeBinomial",
    "Laplace",
    "Cauchy",
    "Weibull",
    "MultivariateNormal",
    "Independent",
    "TransformedDistribution",
    "robust_cholesky",
    "Bijector",
    "Identity",
    "Exp",
    "Log",
    "Affine",
    "Power",
    "Sigmoid",
    "Softplus",
    "Tanh",
    "SinhArcsinh",
    "Chain",
    "biject_to",
    "bijectors",
    "constraints",
]
