"""Affine pushforward of a distribution: law of ``loc + scale * eps``.

Analytic special cases for (Independent) Normal and MVN keep the hot filter path
on closed-form densities (the reference relies on torch's AffineTransform +
TransformedDistribution; specializing is both faster and numerically cleaner).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..distributions import (
    Affine,
    Distribution,
    Independent,
    MultivariateNormal,
    Normal,
    TransformedDistribution,
)


def affine_transform(dist: Distribution, loc, scale) -> Distribution:
    """Distribution of ``loc + scale * X`` for ``X ~ dist``.

    ``scale`` is a scalar or an elementwise (diagonal) scale; matrix scales are
    supported for MVN bases only.
    """
    if isinstance(dist, Normal):
        return Normal(loc + scale * dist.loc, jnp.abs(scale) * dist.scale)

    if isinstance(dist, Independent) and isinstance(dist.base_dist, Normal):
        base = dist.base_dist
        new = Normal(loc + scale * base.loc, jnp.abs(scale) * base.scale)
        return Independent(new, dist.reinterpreted_batch_ndims)

    if isinstance(dist, MultivariateNormal):
        scale = jnp.asarray(scale)
        if scale.ndim >= 2 and scale.shape[-1] == scale.shape[-2] == dist.event_shape[0]:
            new_loc = loc + jnp.einsum("...ij,...j->...i", scale, dist.loc)
            new_tril = scale @ dist.scale_tril
        else:
            new_loc = loc + scale * dist.loc
            new_tril = scale[..., None] * dist.scale_tril if scale.ndim >= 1 else scale * dist.scale_tril
        return MultivariateNormal(new_loc, scale_tril=new_tril)

    return TransformedDistribution(dist, Affine(loc, scale))
