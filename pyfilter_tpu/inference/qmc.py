"""Quasi-Monte-Carlo engine: scrambled Sobol with optional random shift.

Re-design of the reference's ``pyfilter/inference/qmc.py`` (EngineContainer over
``torch.quasirandom.SobolEngine``). JAX core has no Sobol engine; draws come
from ``scipy.stats.qmc.Sobol`` on the host (QMC initialization and proposal
sampling happen outside jit in the reference too) and are shipped to device as
jnp arrays.
"""

from __future__ import annotations

import warnings

import numpy as np

import jax.numpy as jnp

# EPS2 = machine eps (reference constants.py)
_EPS2 = float(np.finfo(np.float32).eps)


class EngineContainer:
    """Sobol engine with the reference's exact post-processing: optional
    constant random-shift rotation (qmc.py:41-46) and the nchopin/particles
    degeneracy squeeze ``0.5 + (1 - eps)(p - 0.5)`` (qmc.py:48-49)."""

    def __init__(self, dim: int, randomize: bool, seed: int | None = None):
        from scipy.stats import qmc

        self.dimension = int(dim)
        self._engine = qmc.Sobol(self.dimension, scramble=True, seed=seed)
        self._randomize = randomize
        self._rng = np.random.default_rng(None if seed is None else seed + 1)
        self._rotation_vector: np.ndarray | None = None
        self._num_drawn = 0

    def sample(self, shape) -> jnp.ndarray:
        """Draw ``prod(shape)`` points; returns shape ``(*shape, dim)``
        (a single-element shape squeezes the leading axis, reference qmc.py:37-38)."""
        shape = tuple(int(s) for s in shape)
        numel = int(np.prod(shape)) if shape else 1

        with warnings.catch_warnings():
            # lane counts are rarely powers of two; scipy's balance-property
            # warning would fire on every draw (torch's SobolEngine, which
            # the reference samples the same way, does not warn)
            warnings.simplefilter("ignore", UserWarning)
            probs = self._engine.random(numel)
        self._num_drawn += numel

        if numel == 1:
            probs = probs[0]

        if self._randomize:
            if self._rotation_vector is None:
                self._rotation_vector = self._rng.uniform(size=probs.shape[-1])
            probs = np.remainder(probs + self._rotation_vector, 1.0)

        safe_probs = 0.5 + (1.0 - _EPS2) * (probs - 0.5)
        return jnp.asarray(
            safe_probs.reshape(shape + (self.dimension,)), dtype=jnp.float32
        )

    def rewind(self, num_points: int):
        """Step the sequence position back by ``num_points`` draws.

        Fused rejuvenations (``sequential.kernels.mh``) pre-draw uniforms for
        all ``n_steps`` PMMH transitions in one block; when the device-side
        early abort fires after fewer transitions, the unconsumed tail is
        returned here so the stream position matches what a step-by-step host
        loop would have consumed. ``Sobol.reset`` keeps the scramble (it is
        fixed at construction), so replaying to an earlier position is exact.
        """
        num_points = int(num_points)
        if num_points <= 0:
            return
        target = self._num_drawn - num_points
        if target < 0:
            raise ValueError(
                f"cannot rewind {num_points} points; only {self._num_drawn} drawn"
            )
        self._engine.reset()
        if target > 0:
            self._engine.fast_forward(target)
        self._num_drawn = target
