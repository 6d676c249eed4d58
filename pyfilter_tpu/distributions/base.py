"""Distribution base class.

Minimal JAX-native equivalent of the ``torch.distributions`` /
``pyro.distributions`` surface the reference consumes (SURVEY.md §2.9):
``log_prob``, ``sample``, ``icdf``, ``cdf``, ``expand``, ``to_event``,
``batch_shape`` / ``event_shape``, ``support``, ``mean`` / ``variance``.

Distributions are immutable pytrees: parameters are leaves (so they can carry
batch axes through ``vmap`` / ``scan`` / ``jit``); everything shape-like is a
derived property, never stored statically — this is what makes a distribution
built inside a vmapped function correct.

Sampling is reparameterized wherever the underlying ``jax.random`` primitive is
(Normal, MVN, ...); ``rsample`` is an alias of ``sample``.
"""

from __future__ import annotations

from typing import ClassVar, Sequence

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node

from . import constraints


def _broadcast_shapes(*shapes):
    return jnp.broadcast_shapes(*shapes)


class Distribution:
    #: names of constructor args that are array-valued pytree leaves, in order.
    arg_names: ClassVar[tuple] = ()
    #: names of static (non-leaf) constructor kwargs.
    aux_names: ClassVar[tuple] = ()

    has_icdf: ClassVar[bool] = False

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)

        def flatten(d):
            return (
                tuple(getattr(d, n) for n in cls.arg_names),
                tuple(getattr(d, n) for n in cls.aux_names),
            )

        def unflatten(aux, children):
            obj = object.__new__(cls)
            for n, v in zip(cls.arg_names, children):
                object.__setattr__(obj, n, v)
            for n, v in zip(cls.aux_names, aux):
                object.__setattr__(obj, n, v)
            return obj

        register_pytree_node(cls, flatten, unflatten)

    # -- shapes ------------------------------------------------------------
    @property
    def batch_shape(self) -> tuple:
        raise NotImplementedError

    @property
    def event_shape(self) -> tuple:
        return ()

    @property
    def shape(self) -> tuple:
        return self.batch_shape + self.event_shape

    # -- core --------------------------------------------------------------
    def sample(self, key, sample_shape: Sequence[int] = ()) -> jax.Array:
        raise NotImplementedError

    def rsample(self, key, sample_shape: Sequence[int] = ()) -> jax.Array:
        return self.sample(key, sample_shape)

    def log_prob(self, value) -> jax.Array:
        raise NotImplementedError

    def prob(self, value) -> jax.Array:
        return jnp.exp(self.log_prob(value))

    def cdf(self, value) -> jax.Array:
        raise NotImplementedError(f"{type(self).__name__} does not implement cdf")

    def icdf(self, q) -> jax.Array:
        raise NotImplementedError(f"{type(self).__name__} does not implement icdf")

    def entropy(self) -> jax.Array:
        raise NotImplementedError(f"{type(self).__name__} does not implement entropy")

    # -- moments -----------------------------------------------------------
    @property
    def mean(self) -> jax.Array:
        raise NotImplementedError

    @property
    def variance(self) -> jax.Array:
        raise NotImplementedError

    @property
    def stddev(self) -> jax.Array:
        return jnp.sqrt(self.variance)

    # -- structure ---------------------------------------------------------
    @property
    def support(self) -> constraints.Constraint:
        return constraints.real

    def expand(self, batch_shape) -> "Distribution":
        """Broadcast all parameters to the given batch shape."""
        batch_shape = tuple(batch_shape)
        # Broadcast each leaf's batch part; event part (trailing dims beyond the
        # current batch rank) is preserved.
        cur_batch = self.batch_shape
        leaves, treedef = jax.tree_util.tree_flatten(self)
        new_leaves = []
        for leaf in leaves:
            leaf = jnp.asarray(leaf)
            extra = leaf.ndim - len(cur_batch)
            extra = max(extra, 0)
            target = batch_shape + leaf.shape[leaf.ndim - extra:]
            new_leaves.append(jnp.broadcast_to(leaf, target))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    def to_event(self, reinterpreted_batch_ndims: int = 1) -> "Distribution":
        from .independent import Independent

        if reinterpreted_batch_ndims == 0:
            return self
        return Independent(self, reinterpreted_batch_ndims)

    # -- misc --------------------------------------------------------------
    def __repr__(self):
        args = ", ".join(f"{n}={getattr(self, n)!r}" for n in self.arg_names)
        return f"{type(self).__name__}({args})"

    def equivalent_to(self, other: "Distribution") -> bool:
        """Same class with numerically equal parameters/aux (reference prior.py:10-29)."""
        if type(self) is not type(other):
            return False
        import numpy as np

        sc, sa = jax.tree_util.tree_flatten(self)
        oc, oa = jax.tree_util.tree_flatten(other)
        if sa != oa or len(sc) != len(oc):
            return False
        for a, b in zip(sc, oc):
            a, b = np.asarray(a), np.asarray(b)
            if a.shape != b.shape or not np.allclose(a, b):
                return False
        return True
