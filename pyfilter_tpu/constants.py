"""Numeric constants derived from the working dtype.

Mirrors the behavior of the reference's ``pyfilter/constants.py`` (constants.py:1-12):
``INFTY``, ``EPS = sqrt(machine eps)``, ``EPS2 = machine eps``, ``MAX``.
Here they are plain Python floats (usable as static values under ``jit``).
"""

import numpy as np

_finfo32 = np.finfo(np.float32)
_finfo64 = np.finfo(np.float64)

INFTY = float("inf")

#: sqrt of machine epsilon for float32 — the "loose" epsilon used for damping / clamps.
EPS = float(np.sqrt(_finfo32.eps))

#: machine epsilon for float32.
EPS2 = float(_finfo32.eps)

#: largest representable float32.
MAX = float(_finfo32.max)

#: float64 variants, for code that runs with jax_enable_x64.
EPS_64 = float(np.sqrt(_finfo64.eps))
EPS2_64 = float(_finfo64.eps)
MAX_64 = float(_finfo64.max)


def eps_for(dtype) -> float:
    """sqrt(machine eps) for the given dtype."""
    return float(np.sqrt(np.finfo(np.dtype(dtype)).eps))


def eps2_for(dtype) -> float:
    """Machine eps for the given dtype."""
    return float(np.finfo(np.dtype(dtype)).eps)
