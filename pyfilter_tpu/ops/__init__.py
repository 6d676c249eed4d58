"""TPU-optimized kernels for the SMC hot ops."""

from .fused import fused_bootstrap_filter, fused_propagate_weight_step
from .resample import systematic_counts

__all__ = [
    "systematic_counts",
    "fused_bootstrap_filter",
    "fused_propagate_weight_step",
]
