"""Independent — reinterpret trailing batch dims as event dims (``to_event``)."""

from __future__ import annotations

import jax.numpy as jnp

from .base import Distribution


class Independent(Distribution):
    arg_names = ("base_dist",)
    aux_names = ("reinterpreted_batch_ndims",)

    def __init__(self, base_dist: Distribution, reinterpreted_batch_ndims: int):
        if isinstance(base_dist, Independent):
            reinterpreted_batch_ndims += base_dist.reinterpreted_batch_ndims
            base_dist = base_dist.base_dist
        self.base_dist = base_dist
        self.reinterpreted_batch_ndims = reinterpreted_batch_ndims

    @property
    def batch_shape(self):
        bs = self.base_dist.batch_shape
        return bs[: len(bs) - self.reinterpreted_batch_ndims]

    @property
    def event_shape(self):
        bs = self.base_dist.batch_shape
        return bs[len(bs) - self.reinterpreted_batch_ndims:] + self.base_dist.event_shape

    @property
    def has_icdf(self):
        return self.base_dist.has_icdf

    @property
    def support(self):
        return self.base_dist.support

    def sample(self, key, sample_shape=()):
        return self.base_dist.sample(key, sample_shape)

    def log_prob(self, value):
        lp = self.base_dist.log_prob(value)
        if self.reinterpreted_batch_ndims == 0:
            return lp
        return jnp.sum(lp, axis=tuple(range(-self.reinterpreted_batch_ndims, 0)))

    def cdf(self, value):
        return self.base_dist.cdf(value)

    def icdf(self, q):
        return self.base_dist.icdf(q)

    def entropy(self):
        ent = self.base_dist.entropy()
        if self.reinterpreted_batch_ndims == 0:
            return ent
        return jnp.sum(ent, axis=tuple(range(-self.reinterpreted_batch_ndims, 0)))

    @property
    def mean(self):
        return self.base_dist.mean

    @property
    def variance(self):
        return self.base_dist.variance
