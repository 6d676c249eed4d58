"""TPU-optimized kernels for the SMC hot ops."""

from .expand import systematic_expand
from .fused import fused_bootstrap_filter, fused_propagate_weight_step
from .resample import systematic_counts

__all__ = [
    "systematic_counts",
    "systematic_expand",
    "fused_bootstrap_filter",
    "fused_propagate_weight_step",
]
