"""Support constraints for distributions and priors.

Minimal equivalent of the constraint objects the reference consumes from
``torch.distributions.constraints`` via ``biject_to(support)``
(reference inference/prior.py:199-225). Each constraint is a lightweight,
hashable singleton/value object; ``bijectors.biject_to`` maps it to a bijector
from unconstrained R^d onto the support.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


class Constraint:
    event_dim: int = 0

    def check(self, value):
        raise NotImplementedError


class _Real(Constraint):
    def check(self, value):
        return jnp.isfinite(value)

    def __repr__(self):
        return "Real()"


class _Positive(Constraint):
    def check(self, value):
        return value > 0

    def __repr__(self):
        return "Positive()"


class _Nonnegative(Constraint):
    def check(self, value):
        return value >= 0

    def __repr__(self):
        return "Nonnegative()"


@dataclasses.dataclass(frozen=True)
class Interval(Constraint):
    low: float
    high: float

    def check(self, value):
        return (value > self.low) & (value < self.high)


@dataclasses.dataclass(frozen=True)
class GreaterThan(Constraint):
    low: float

    def check(self, value):
        return value > self.low


class _RealVector(Constraint):
    event_dim = 1

    def check(self, value):
        return jnp.all(jnp.isfinite(value), axis=-1)

    def __repr__(self):
        return "RealVector()"


class _Simplex(Constraint):
    event_dim = 1

    def check(self, value):
        return jnp.all(value >= 0, axis=-1) & (jnp.abs(jnp.sum(value, axis=-1) - 1.0) < 1e-6)

    def __repr__(self):
        return "Simplex()"


class _LowerCholesky(Constraint):
    event_dim = 2

    def check(self, value):
        diag_ok = jnp.all(jnp.diagonal(value, axis1=-2, axis2=-1) > 0, axis=-1)
        upper = jnp.triu(value, k=1)
        return diag_ok & jnp.all(upper == 0, axis=(-2, -1))

    def __repr__(self):
        return "LowerCholesky()"


real = _Real()
positive = _Positive()
nonnegative = _Nonnegative()
unit_interval = Interval(0.0, 1.0)
real_vector = _RealVector()
simplex = _Simplex()
lower_cholesky = _LowerCholesky()
