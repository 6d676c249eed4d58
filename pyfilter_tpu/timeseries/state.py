"""Timeseries state and path pytrees.

Equivalent of stochproc's ``TimeseriesState`` / ``StateSpacePath`` as consumed by
the reference (SURVEY.md §2.9: ``.value``, ``.time_index``, ``.copy(values=…)``,
``.propagate_from(values=…, time_increment=…)``, ``path.get_paths()``,
``path.time_indexes``). Immutable pytrees — "mutation" returns a new state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class


@register_pytree_node_class
class TimeseriesState:
    """A point-in-time state of a stochastic process.

    ``value`` has shape ``(*shape, *event)``; ``time_index`` is a scalar (or a
    batch of scalars) tracking process time — fractional when an SDE sub-steps.
    """

    def __init__(self, time_index, value, event_ndim: int = 0):
        self.time_index = time_index
        self.value = value
        self.event_ndim = event_ndim

    # -- pytree ------------------------------------------------------------
    def tree_flatten(self):
        return (self.time_index, self.value), (self.event_ndim,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])

    # -- shape -------------------------------------------------------------
    @property
    def event_shape(self) -> tuple:
        s = jnp.shape(self.value)
        return s[len(s) - self.event_ndim:]

    @property
    def batch_shape(self) -> tuple:
        s = jnp.shape(self.value)
        return s[: len(s) - self.event_ndim]

    # -- functional updates -------------------------------------------------
    def copy(self, values=None) -> "TimeseriesState":
        """New state at the same time index (optionally with new values)."""
        return TimeseriesState(self.time_index, self.value if values is None else values, self.event_ndim)

    def propagate_from(self, values, time_increment=1.0) -> "TimeseriesState":
        """New state at ``time_index + time_increment`` with the given values."""
        return TimeseriesState(self.time_index + time_increment, values, self.event_ndim)

    def __repr__(self):
        return (
            f"TimeseriesState(time_index={self.time_index!r}, "
            f"value.shape={jnp.shape(self.value)}, event_ndim={self.event_ndim})"
        )


class StateSpacePath(NamedTuple):
    """A sampled trajectory of a state-space model.

    ``x``/``y`` are stacked along the leading time axis; unobserved sub-steps in
    ``y`` are NaN (matching the reference's ``observe_every_step`` semantics,
    lorenz.ipynb's ``~isnan(y).all(dim=1)`` masking).
    """

    time_indexes: jax.Array
    x: jax.Array
    y: jax.Array | None = None

    def get_paths(self):
        return self.x, self.y
