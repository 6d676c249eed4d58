"""TPU-optimized kernels for the SMC hot ops.

(The round-1 fused observation-step kernel was retired: XLA already fuses
the elementwise scan body to parity — measured speed-neutral, PERF.md — and
the resample fire it could not touch is now the Pallas expansion kernel.)
"""

from .expand import systematic_expand, systematic_expand_lanes
from .hilbert import hilbert_argsort, hilbert_keys
from .resample import systematic_counts

__all__ = [
    "systematic_counts",
    "systematic_expand",
    "systematic_expand_lanes",
    "hilbert_argsort",
    "hilbert_keys",
]
