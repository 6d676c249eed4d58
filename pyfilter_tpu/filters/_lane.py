"""Lane surgery and lane-vmapped filtering shared by the Gaussian family.

The inference algorithms vectorize K independent filters through one set of
tensor ops (the reference's only parallelism, SURVEY.md §2.8) and perform
"lane surgery" on the results: ``resample(indices)`` permutes lanes,
``exchange(other, mask)`` swaps accepted lanes, ``lane_concat`` rebuilds a
waste-free swarm from chain segments. Every Gaussian-family state is a
NamedTuple whose leaves are lane-LEADING once vmapped, so one generic
implementation serves them all (EKFState, GSFState, IMMState, EnKFState).

``lane_vmap_batch_filter`` is the lane-batching engine itself: ``jax.vmap``
over the model pytree, parameter leaves built from a lane-batched context
carry the K axis, constant leaves broadcast. Inside the vmap each filter sees
single-lane shapes, so all static shape probing works unchanged. The returned
:class:`FilterResult` follows the package convention — per-step leaves
time-major with lanes second, ``latest_state`` lane-leading.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lane_exchange(state, other, mask):
    """Lanes where ``mask`` is True take ``other``'s values (leaf-wise,
    broadcasting the mask over trailing event axes)."""

    def mix(mine, theirs):
        m = jnp.reshape(mask, mask.shape + (1,) * (jnp.ndim(mine) - jnp.ndim(mask)))
        return jnp.where(m, theirs, mine)

    return type(state)(*(mix(a, b) for a, b in zip(state, other)))


def lane_resample(state, indices):
    """Permute the leading lane axis of every leaf by ``indices``."""
    return type(state)(*(jnp.take(leaf, indices, axis=0) for leaf in state))


def lane_concat(cls, states):
    """Concatenate states along the leading lane axis (waste-free SMC swarm
    reconstitution, kernels/mh.py)."""
    return cls(*(jnp.concatenate(leaves, axis=0) for leaves in zip(*states)))


def lane_axes(model, k: int):
    """vmap in_axes for a lane-batched model pytree: leaves whose leading axis
    equals the lane count ride axis 0, everything else broadcasts.

    Heuristic caveat (documented contract of the marginal adapters): a
    CONSTANT leaf whose leading dimension coincidentally equals ``k`` would be
    mis-batched — keep lane counts away from small structural sizes (regime
    counts, event dims), which real inference configs (K in the hundreds) do.
    """

    def axis(leaf):
        leaf = jnp.asarray(leaf)
        return 0 if (leaf.ndim >= 1 and leaf.shape[0] == k) else None

    return jax.tree_util.tree_map(axis, model)


def swap_result_lanes(res):
    """vmap puts the lane axis first; per-step FilterResult leaves are
    time-major with lanes second (the convention exchange/resample rely on) —
    swap them. ``latest_state`` stays lane-leading."""

    def swap(a):
        return None if a is None else jnp.moveaxis(a, 0, 1)

    return res._replace(
        step_log_likelihoods=swap(res.step_log_likelihoods),
        filter_means=swap(res.filter_means),
        filter_variances=swap(res.filter_variances),
        aux=swap(res.aux),
    )


def lane_vmap_batch_filter(make_filter, model, batch_shape, y, key=None):
    """Run ``make_filter(model_lane).batch_filter(...)`` per lane via one
    ``jax.vmap`` over the model pytree.

    ``key``: filters whose pass consumes randomness (EnKF/ETKF forecasts) get
    one split key per lane; deterministic filters (GSF/IMM/EKF/UKF) pass
    ``None`` and their ``batch_filter(y)`` is called without one.
    """
    if len(batch_shape) > 1:
        raise ValueError("Gaussian-family lane batching supports one lane axis")
    if not batch_shape:
        filt = make_filter(model)
        return filt.batch_filter(y) if key is None else filt.batch_filter(key, y)

    k = int(batch_shape[0])
    axes = lane_axes(model, k)
    if key is None:
        res = jax.vmap(lambda mdl: make_filter(mdl).batch_filter(y), in_axes=(axes,))(model)
    else:
        keys = jax.random.split(key, k)
        res = jax.vmap(
            lambda mdl, kk: make_filter(mdl).batch_filter(kk, y), in_axes=(axes, 0)
        )(model, keys)
    return swap_result_lanes(res)
