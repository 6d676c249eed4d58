"""Sharding utilities: particle-axis and lane-axis SPMD filtering.

Strategy (jax.sharding + GSPMD, per the scaling-book recipe): annotate the
particle (and/or lane) axis of every state leaf with a
:class:`~jax.sharding.NamedSharding`, jit the existing scan-based filter with
those in/out shardings, and let XLA insert the collectives — ``psum`` for the
weight reductions, a sharded prefix-sum + all-to-all gather for systematic
resampling. Nothing in the filter math needs to change: it is already
branchless and fixed-shape.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..filters.base import BaseFilter
from ..filters.state import ParticleFilterCorrection


def make_mesh(
    axis_sizes: Sequence[int] = None,
    axis_names: Sequence[str] = ("particles",),
    devices=None,
) -> Mesh:
    """Build a device mesh. Defaults to all devices on one ``"particles"`` axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (devices.size,)
    axis_sizes = tuple(int(s) for s in axis_sizes)
    if int(np.prod(axis_sizes)) != devices.size:
        raise ValueError(f"mesh sizes {axis_sizes} != #devices {devices.size}")
    return Mesh(devices.reshape(axis_sizes), tuple(axis_names))


def _leaf_spec(
    leaf,
    particle_axis_name: Optional[str],
    lane_axis_name: Optional[str],
    n_lane_dims: int,
    has_particle_dim: bool = True,
):
    """PartitionSpec for one state leaf. Particle-indexed leaves carry the
    particle dim at axis 0 and the lane dims right after (possibly replicated
    on either); per-lane leaves (``has_particle_dim=False``) start with the
    lane dims."""
    ndim = jnp.ndim(leaf)
    if ndim == 0:
        return P()
    spec = [None] * ndim
    lane_dim = 1 if has_particle_dim else 0
    if has_particle_dim and particle_axis_name is not None:
        spec[0] = particle_axis_name
    if lane_axis_name is not None and n_lane_dims > 0 and ndim > lane_dim:
        spec[lane_dim] = lane_axis_name
    return P(*spec)


def _state_shardings(
    state: ParticleFilterCorrection,
    mesh: Mesh,
    particle_axis: Optional[str],
    lane_axis: Optional[str],
    n_lane_dims: int,
):
    """Sharding pytree for a correction state: particle-indexed leaves
    (``x.value``, ``log_weights``, ``prev_indices``) shard on dim 0; per-lane
    leaves (``log_likelihood``, ``mean``, ``variance``) shard on the lane dim."""

    def particle_leaf(leaf):
        return NamedSharding(mesh, _leaf_spec(leaf, particle_axis, lane_axis, n_lane_dims))

    def lane_leaf(leaf):
        return NamedSharding(
            mesh, _leaf_spec(leaf, None, lane_axis, n_lane_dims, has_particle_dim=False)
        )

    return ParticleFilterCorrection(
        x=jax.tree_util.tree_map(particle_leaf, state.x),
        log_weights=particle_leaf(state.log_weights),
        log_likelihood=lane_leaf(state.log_likelihood),
        prev_indices=particle_leaf(state.prev_indices),
        mean=lane_leaf(state.mean),
        variance=lane_leaf(state.variance),
    )


def shard_filter_state(
    state: ParticleFilterCorrection,
    mesh: Mesh,
    particle_axis: str = "particles",
    lane_axis: Optional[str] = None,
    n_lane_dims: int = 0,
) -> ParticleFilterCorrection:
    """Place a correction state on the mesh with the particle axis sharded."""
    shardings = _state_shardings(state, mesh, particle_axis, lane_axis, n_lane_dims)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


@functools.partial(jax.jit, static_argnums=(4,))
def _sharded_step(filt, key, y, state, first_step):
    return filt.filter(key, y, state, first_step=first_step)


def sharded_filter_step(
    filt: BaseFilter,
    key,
    y,
    state: ParticleFilterCorrection,
    mesh: Mesh,
    particle_axis: str = "particles",
    lane_axis: Optional[str] = None,
    first_step: bool = False,
) -> ParticleFilterCorrection:
    """One filter move with the particle axis sharded over ``mesh``.

    The input state's shardings are the contract; XLA propagates them through
    the step and inserts the cross-device reductions/resampling collectives.
    """
    n_lane = len(filt.batch_shape)
    state = shard_filter_state(state, mesh, particle_axis, lane_axis, n_lane)
    return _sharded_step(filt, key, jnp.asarray(y), state, first_step)


def sharded_batch_filter(
    filt: BaseFilter,
    key,
    y,
    mesh: Mesh,
    particle_axis: str = "particles",
    lane_axis: Optional[str] = None,
):
    """Full scan-based filtering pass with the particle axis sharded.

    Initializes on-device with sharded output, then runs the standard
    ``lax.scan`` under jit with sharded carries.
    """
    k_init, k_run = jax.random.split(key)
    n_lane = len(filt.batch_shape)

    init_state = filt.initialize(k_init)
    init_state = shard_filter_state(init_state, mesh, particle_axis, lane_axis, n_lane)

    # reuse the standard scan implementation: the init state's shardings are
    # the contract and XLA propagates them through the whole scan.
    return filt.batch_filter(k_run, jnp.asarray(y), initial_state=init_state)


def lane_sharded_filter(filt: BaseFilter, mesh: Mesh, lane_axis: str = "lanes") -> BaseFilter:
    """Annotate a lane-batched filter's model parameters with lane sharding —
    parameter particles / chains distribute over devices (embarrassingly
    parallel filters; SURVEY.md §5.8)."""
    k = filt.batch_shape[0] if filt.batch_shape else None
    if k is None:
        raise ValueError("filter has no lane axis; call set_batch_shape first")

    def place(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] == k:
            spec = P(lane_axis, *([None] * (leaf.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    model = jax.tree_util.tree_map(place, filt.model)
    return filt.replace(model=model)
