"""Bijectors (invertible transforms) and ``biject_to``.

Minimal equivalent of the transform layer the reference consumes from pyro/torch
(``biject_to(support)``, ``TransformedDistribution`` — reference
inference/prior.py:31-57, stochastic-volatility.ipynb's ``SinhArcsinhTransform``).

All bijectors here are elementwise (``event_dim == 0``) unless noted; the
``log_abs_det_jacobian`` is per-element and the caller (``TransformedDistribution``)
sums over event dims. Bijectors are stateless w.r.t. arrays except for parameters,
which are registered as pytree leaves so bijectors can cross ``jit`` boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node

from . import constraints


class Bijector:
    """Invertible elementwise transform."""

    event_dim: int = 0

    def __call__(self, x):
        return self.forward(x)

    def forward(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError

    def log_abs_det_jacobian(self, x, y):
        """log |d forward / dx| evaluated elementwise at ``x`` (``y = forward(x)``)."""
        raise NotImplementedError

    def inverse_and_ladj(self, y):
        """``(inverse(y), log_abs_det_jacobian(inverse(y), y))`` in one pass.

        The density hot path (``TransformedDistribution.log_prob``) needs
        both; transforms whose jacobian shares intermediates with the
        inverse override this to skip the recomputation (SinhArcsinh's
        ``asinh`` chain, Chain's full re-forward of every part — the
        observation-density hot spot of the stochastic-volatility workload,
        reference stochastic-volatility.ipynb)."""
        x = self.inverse(y)
        return x, self.log_abs_det_jacobian(x, y)

    @property
    def inv(self) -> "Bijector":
        return _Inverse(self)

    def tree_flatten(self):
        return (), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls()

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        register_pytree_node(
            cls,
            lambda b: b.tree_flatten(),
            lambda aux, children: cls.tree_unflatten(aux, children),
        )

    def __eq__(self, other):
        return type(self) is type(other) and self.tree_flatten() == other.tree_flatten()

    def __hash__(self):
        return hash(type(self))


class _Inverse(Bijector):
    def __init__(self, bijector: Bijector):
        self.bijector = bijector
        self.event_dim = bijector.event_dim

    def forward(self, x):
        return self.bijector.inverse(x)

    def inverse(self, y):
        return self.bijector.forward(y)

    def log_abs_det_jacobian(self, x, y):
        return -self.bijector.log_abs_det_jacobian(y, x)

    @property
    def inv(self):
        return self.bijector

    def tree_flatten(self):
        return (self.bijector,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


class Identity(Bijector):
    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def log_abs_det_jacobian(self, x, y):
        return jnp.zeros_like(x)


class Exp(Bijector):
    def forward(self, x):
        return jnp.exp(x)

    def inverse(self, y):
        return jnp.log(y)

    def log_abs_det_jacobian(self, x, y):
        return x


class Log(Bijector):
    def forward(self, x):
        return jnp.log(x)

    def inverse(self, y):
        return jnp.exp(y)

    def log_abs_det_jacobian(self, x, y):
        return -jnp.log(x)


class Softplus(Bijector):
    def forward(self, x):
        return jax.nn.softplus(x)

    def inverse(self, y):
        # log(expm1(y)), stable for large y
        return y + jnp.log(-jnp.expm1(-y))

    def log_abs_det_jacobian(self, x, y):
        return -jax.nn.softplus(-x)


class Sigmoid(Bijector):
    def forward(self, x):
        return jax.nn.sigmoid(x)

    def inverse(self, y):
        return jnp.log(y) - jnp.log1p(-y)

    def log_abs_det_jacobian(self, x, y):
        return -jax.nn.softplus(-x) - jax.nn.softplus(x)


class Tanh(Bijector):
    def forward(self, x):
        return jnp.tanh(x)

    def inverse(self, y):
        return jnp.arctanh(y)

    def log_abs_det_jacobian(self, x, y):
        return 2.0 * (jnp.log(2.0) - x - jax.nn.softplus(-2.0 * x))


class Affine(Bijector):
    """y = loc + scale * x."""

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    def forward(self, x):
        return self.loc + self.scale * x

    def inverse(self, y):
        return (y - self.loc) / self.scale

    def log_abs_det_jacobian(self, x, y):
        return jnp.broadcast_to(jnp.log(jnp.abs(jnp.asarray(self.scale, jnp.result_type(x)))), jnp.shape(x))

    def tree_flatten(self):
        return (self.loc, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __eq__(self, other):
        return type(other) is Affine and _leaf_eq(self.loc, other.loc) and _leaf_eq(self.scale, other.scale)

    __hash__ = Bijector.__hash__


class Power(Bijector):
    """y = x ** exponent (x > 0)."""

    def __init__(self, exponent):
        self.exponent = exponent

    def forward(self, x):
        return jnp.power(x, self.exponent)

    def inverse(self, y):
        return jnp.power(y, 1.0 / self.exponent)

    def log_abs_det_jacobian(self, x, y):
        e = jnp.asarray(self.exponent, jnp.result_type(x))
        return jnp.log(jnp.abs(e)) + (e - 1.0) * jnp.log(x)

    def tree_flatten(self):
        return (self.exponent,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _asinh(x):
    # log/sqrt formulation (sign-symmetrized for accuracy) — used instead of
    # jnp.arcsinh so the transform lowers inside Pallas TPU kernels, where
    # asinh/cosh have no lowering (ops/fused.py).
    ax = jnp.abs(x)
    return jnp.sign(x) * jnp.log(ax + jnp.sqrt(jnp.square(ax) + 1.0))


def _sinh(x):
    e = jnp.exp(x)
    return 0.5 * (e - 1.0 / e)


def _log_cosh(x):
    # log((e^x + e^-x)/2) = |x| + log1p(e^{-2|x|}) - log 2, overflow-safe
    ax = jnp.abs(x)
    return ax + jnp.log1p(jnp.exp(-2.0 * ax)) - jnp.log(jnp.asarray(2.0, jnp.result_type(x)))


class SinhArcsinh(Bijector):
    """Sinh-arcsinh transform ``y = sinh((arcsinh(x) + skew) * tailweight)``.

    Equivalent of the ``SinhArcsinhTransform`` used by the reference's
    stochastic-volatility example (stochastic-volatility.ipynb); controls skewness
    and tail weight of a transformed base distribution. Implemented with
    primitive log/exp/sqrt only so it lowers inside Pallas kernels.
    """

    def __init__(self, skew=0.0, tailweight=1.0):
        self.skew = skew
        self.tailweight = tailweight

    def forward(self, x):
        return _sinh((_asinh(x) + self.skew) * self.tailweight)

    def inverse(self, y):
        return _sinh(_asinh(y) / self.tailweight - self.skew)

    def log_abs_det_jacobian(self, x, y):
        t = jnp.asarray(self.tailweight, jnp.result_type(x))
        inner = (_asinh(x) + self.skew) * t
        return jnp.log(t) + _log_cosh(inner) - 0.5 * jnp.log1p(jnp.square(x))

    def inverse_and_ladj(self, y):
        # (asinh(x) + skew) * tailweight == asinh(y) when x = inverse(y), so
        # the jacobian's inner argument is the inverse's own intermediate:
        # one asinh chain serves both (and skips the round-trip error of
        # asinh(sinh(.)))
        t = jnp.asarray(self.tailweight, jnp.result_type(y))
        u = _asinh(y)
        x = _sinh(u / t - self.skew)
        ladj = jnp.log(t) + _log_cosh(u) - 0.5 * jnp.log1p(jnp.square(x))
        return x, ladj

    def tree_flatten(self):
        return (self.skew, self.tailweight), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class Chain(Bijector):
    """Composition: ``forward = parts[-1] o ... o parts[0]``."""

    def __init__(self, parts):
        self.parts = tuple(parts)
        self.event_dim = max((p.event_dim for p in self.parts), default=0)

    def forward(self, x):
        for p in self.parts:
            x = p.forward(x)
        return x

    def inverse(self, y):
        for p in reversed(self.parts):
            y = p.inverse(y)
        return y

    def log_abs_det_jacobian(self, x, y):
        total = jnp.zeros_like(jnp.asarray(x, jnp.result_type(x, 0.0)))
        for p in self.parts:
            x_next = p.forward(x)
            total = total + p.log_abs_det_jacobian(x, x_next)
            x = x_next
        return total

    def inverse_and_ladj(self, y):
        # chain rule: walk the parts backwards, each contributing its own
        # jacobian at its own input — no re-forward of every intermediate
        # (the default path forwards the whole chain again)
        total = None
        for p in reversed(self.parts):
            y, ladj = p.inverse_and_ladj(y)
            total = ladj if total is None else total + ladj
        if total is None:
            total = jnp.zeros_like(jnp.asarray(y, jnp.result_type(y, 0.0)))
        # per-element contract (the caller sums event dims): a part with a
        # data-independent jacobian may return a sub-broadcast ladj
        return y, jnp.broadcast_to(total, jnp.shape(y))

    def tree_flatten(self):
        return (self.parts,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


def _leaf_eq(a, b):
    try:
        import numpy as np

        return bool(np.all(np.asarray(a) == np.asarray(b)))
    except Exception:
        return a is b


def biject_to(constraint: constraints.Constraint) -> Bijector:
    """Bijector from unconstrained reals onto the support of ``constraint``.

    Matches torch's registry choices that the reference relies on
    (inference/prior.py:31-38): positive -> Exp, interval -> Sigmoid + Affine.
    """
    if constraint is constraints.real or constraint is constraints.real_vector:
        return Identity()
    if constraint is constraints.positive or constraint is constraints.nonnegative:
        return Exp()
    if isinstance(constraint, constraints.GreaterThan):
        return Chain([Exp(), Affine(loc=constraint.low, scale=1.0)])
    if isinstance(constraint, constraints.Interval):
        width = constraint.high - constraint.low
        return Chain([Sigmoid(), Affine(loc=constraint.low, scale=width)])
    raise NotImplementedError(f"no bijector registered for constraint {constraint!r}")
