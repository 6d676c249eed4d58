"""Prior helpers: constrained <-> unconstrained transforms for distributions.

Re-design of the reference's ``pyfilter/inference/prior.py``. The reference
monkey-patches a ``PriorMixin`` onto ``torch.distributions.Distribution`` at
import time (prior.py:225) — the anti-pattern SURVEY.md §8 flags. Here the same
surface is provided as free functions over any
:class:`~pyfilter_tpu.distributions.Distribution` (no import side effects).
"""

from __future__ import annotations

import jax

from ..distributions import Distribution, TransformedDistribution, biject_to
from ..distributions.bijectors import Bijector


def bijection(prior: Distribution) -> Bijector:
    """Bijector mapping unconstrained reals onto the prior's support
    (reference prior.py:31-38: ``biject_to(self.support)``)."""
    return biject_to(prior.support)


def unconstrained_prior(prior: Distribution) -> Distribution:
    """The prior pushed to unconstrained space (reference prior.py:40-57)."""
    return TransformedDistribution(prior, bijection(prior).inv)


def get_constrained(prior: Distribution, unconstrained_value: jax.Array) -> jax.Array:
    """Map an unconstrained value onto the prior's support."""
    return bijection(prior).forward(unconstrained_value)


def get_unconstrained(prior: Distribution, constrained_value: jax.Array) -> jax.Array:
    """Map a constrained value to unconstrained space."""
    return bijection(prior).inverse(constrained_value)


def eval_prior(prior: Distribution, constrained_value: jax.Array, constrained: bool = True) -> jax.Array:
    """Prior log-density of a *constrained* value, evaluated either on the
    constrained or (with the Jacobian correction) unconstrained space
    (reference prior.py:90-106 / parameter.py:89-99)."""
    if constrained:
        return prior.log_prob(constrained_value)
    unconstrained = get_unconstrained(prior, constrained_value)
    return unconstrained_prior(prior).log_prob(unconstrained)


def unconstrained_event_shape(prior: Distribution) -> tuple:
    """Event shape of the unconstrained parameterization."""
    return tuple(unconstrained_prior(prior).event_shape)


def get_numel(prior: Distribution, constrained: bool = True) -> int:
    """Number of elements of one parameter draw (reference prior.py:108-120)."""
    shape = prior.event_shape if constrained else unconstrained_event_shape(prior)
    n = 1
    for s in shape:
        n *= int(s)
    return n


def inverse_sample(prior: Distribution, probs: jax.Array, constrained: bool = True) -> jax.Array:
    """Inverse-CDF sample from uniform probabilities (QMC initialization,
    reference parameter.py:101-108)."""
    if constrained:
        return prior.icdf(probs)
    return unconstrained_prior(prior).icdf(probs)
