"""Joint processes — stack independent processes into one vector-valued process.

Equivalent of stochproc's ``joint_process`` as used by the reference's tests
(tests/filters/models.py:56-59: two scalar RandomWalks joined into a 2-D
process filtered against a 2-D Kalman oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from ..distributions import Distribution
from .process import AffineProcess, StructuralStochasticProcess
from .state import TimeseriesState


class JointDistribution(Distribution):
    """Product distribution over a concatenated event vector.

    ``slices`` maps each component distribution onto ``[start, start+size)`` of
    the event axis; scalar-event components are expanded to width 1.
    """

    arg_names = ("dists",)
    aux_names = ("slices",)

    def __init__(self, dists: tuple, slices: tuple):
        self.dists = tuple(dists)
        self.slices = tuple(slices)  # (start, size, event_ndim) per component

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(*(d.batch_shape[: len(d.batch_shape)] for d in self.dists))

    @property
    def event_shape(self):
        total = sum(size for _, size, _ in self.slices)
        return (total,)

    def sample(self, key, sample_shape=()):
        keys = jax.random.split(key, len(self.dists))
        parts = []
        for k, d, (_, size, ev) in zip(keys, self.dists, self.slices):
            s = d.sample(k, sample_shape)
            if ev == 0:
                s = s[..., None]
            parts.append(jnp.broadcast_to(s, tuple(sample_shape) + self.batch_shape + (size,)))
        return jnp.concatenate(parts, axis=-1)

    def log_prob(self, value):
        total = 0.0
        for d, (start, size, ev) in zip(self.dists, self.slices):
            v = value[..., start : start + size]
            if ev == 0:
                v = v[..., 0]
            total = total + d.log_prob(v)
        return total

    @property
    def mean(self):
        parts = []
        for d, (_, size, ev) in zip(self.dists, self.slices):
            m = d.mean
            if ev == 0:
                m = m[..., None]
            parts.append(jnp.broadcast_to(m, self.batch_shape + (size,)))
        return jnp.concatenate(parts, axis=-1)

    @property
    def variance(self):
        parts = []
        for d, (_, size, ev) in zip(self.dists, self.slices):
            v = d.variance
            if ev == 0:
                v = v[..., None]
            parts.append(jnp.broadcast_to(v, self.batch_shape + (size,)))
        return jnp.concatenate(parts, axis=-1)


@register_pytree_node_class
class JointProcess(StructuralStochasticProcess):
    """Stack named sub-processes into one vector-valued Markov process.

    Exposes ``mean_scale`` when every sub-process is affine, so the joint process
    remains usable with the linear-Gaussian optimal proposal.
    """

    event_ndim = 1

    def __init__(self, **processes: StructuralStochasticProcess):
        self.names = tuple(processes.keys())
        self.processes = tuple(processes.values())
        self._slices = self._build_slices(self.processes)

    @staticmethod
    def _build_slices(processes):
        slices = []
        start = 0
        for p in processes:
            ev = p.event_ndim
            if ev == 0:
                size = 1
            else:
                size = p.event_shape[0]
            slices.append((start, size, ev))
            start += size
        return tuple(slices)

    # -- pytree ------------------------------------------------------------
    def tree_flatten(self):
        return (self.processes,), (self.names,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.processes = children[0]
        obj.names = aux[0]
        obj._slices = cls._build_slices(obj.processes)
        return obj

    # -- helpers -----------------------------------------------------------
    def _sub_state(self, x: TimeseriesState, i: int) -> TimeseriesState:
        start, size, ev = self._slices[i]
        v = x.value[..., start : start + size]
        if ev == 0:
            v = v[..., 0]
        return TimeseriesState(x.time_index, v, ev)

    @property
    def event_shape(self):
        return (sum(size for _, size, _ in self._slices),)

    # -- interface ---------------------------------------------------------
    def initial_distribution(self) -> JointDistribution:
        return JointDistribution(tuple(p.initial_distribution() for p in self.processes), self._slices)

    def build_density(self, x: TimeseriesState) -> JointDistribution:
        dists = tuple(p.build_density(self._sub_state(x, i)) for i, p in enumerate(self.processes))
        return JointDistribution(dists, self._slices)

    def mean_scale(self, x: TimeseriesState):
        """Concatenated per-component drift/diffusion (affine sub-processes only)."""
        means, scales = [], []
        batch = x.batch_shape
        for i, p in enumerate(self.processes):
            if not isinstance(p, AffineProcess):
                raise TypeError("mean_scale requires all sub-processes to be affine")
            m, s = p.mean_scale(self._sub_state(x, i))
            _, size, ev = self._slices[i]
            if ev == 0:
                m, s = m[..., None], jnp.asarray(s)[..., None]
            means.append(jnp.broadcast_to(m, batch + (size,)))
            scales.append(jnp.broadcast_to(s, batch + (size,)))
        return jnp.concatenate(means, axis=-1), jnp.concatenate(scales, axis=-1)


def joint_process(**processes) -> JointProcess:
    """Combine named processes into one joint process (stochproc ``joint_process``)."""
    return JointProcess(**processes)
