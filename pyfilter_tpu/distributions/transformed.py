"""TransformedDistribution — push a base distribution through bijectors.

Equivalent of ``torch.distributions.TransformedDistribution`` as used by the
reference's prior machinery (inference/prior.py:40-57: ``unconstrained_prior`` is
the constrained prior pushed through ``biject_to(support).inv``) and examples
(SinhArcsinh observation densities, stochastic-volatility.ipynb).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Distribution
from .bijectors import Bijector, Chain


class TransformedDistribution(Distribution):
    arg_names = ("base_dist", "bijector")

    def __init__(self, base_dist: Distribution, bijector):
        if isinstance(bijector, (list, tuple)):
            bijector = Chain(bijector)
        self.base_dist = base_dist
        self.bijector: Bijector = bijector

    @property
    def batch_shape(self):
        return self.base_dist.batch_shape

    @property
    def event_shape(self):
        # Elementwise bijectors preserve shape. If the bijector reinterprets
        # dims (event_dim > base event rank), extend the event shape.
        base_event = self.base_dist.event_shape
        extra = self.bijector.event_dim - len(base_event)
        if extra > 0:
            bs = self.base_dist.batch_shape
            return bs[len(bs) - extra:] + base_event
        return base_event

    @property
    def has_icdf(self):
        return self.base_dist.has_icdf

    def sample(self, key, sample_shape=()):
        x = self.base_dist.sample(key, sample_shape)
        return self.bijector.forward(x)

    def log_prob(self, value):
        # fused inverse + jacobian: transforms like SinhArcsinh share the
        # asinh chain between the two, and Chain skips a full re-forward of
        # every intermediate (the observation-density hot path)
        x, ladj = self.bijector.inverse_and_ladj(value)
        # An elementwise bijector (event_dim 0) applied to a base with event rank k
        # produces a per-element ladj that must be summed over all k event dims.
        n_sum = len(self.event_shape) - self.bijector.event_dim
        lp = self.base_dist.log_prob(x) - _sum_rightmost(ladj, n_sum)
        return lp

    def cdf(self, value):
        # valid for monotone increasing bijectors
        return self.base_dist.cdf(self.bijector.inverse(value))

    def icdf(self, q):
        return self.bijector.forward(self.base_dist.icdf(q))

    @property
    def mean(self):
        raise NotImplementedError("no closed-form mean for TransformedDistribution")

    @property
    def variance(self):
        raise NotImplementedError("no closed-form variance for TransformedDistribution")


def _sum_rightmost(x, ndims: int):
    if ndims == 0:
        return x
    return jnp.sum(x, axis=tuple(range(-ndims, 0)))
