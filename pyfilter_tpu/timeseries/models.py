"""Library of ready-made processes.

Equivalents of ``stochproc.timeseries.models`` as used by the reference
(tests/filters/models.py:13,56; tests/inference/models.py:17;
stochastic-volatility.ipynb): AR, RandomWalk, OrnsteinUhlenbeck, Verhulst.
All are scalar-event affine processes with Normal increments.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from ..distributions import Normal
from .process import AffineEulerMaruyama, AffineProcess  # noqa


def _ar_mean_scale(x, alpha, beta, sigma):
    return alpha + beta * x.value, sigma


def _ar_initial(alpha, beta, sigma):
    return Normal(alpha, sigma)


@register_pytree_node_class
class AR(AffineProcess):
    r"""AR(1): ``x' = alpha + beta * x + sigma * eps``; initial ``N(alpha, sigma)``.

    Matches the Kalman configuration the reference pairs with ``ts.models.AR``
    (tests/filters/models.py:13-27: transition offset ``alpha``, matrix ``beta``,
    covariance ``sigma^2``, initial mean ``alpha``, initial covariance ``sigma^2``).
    """

    def __init__(self, alpha, beta, sigma):
        super().__init__(
            _ar_mean_scale,
            (alpha, beta, sigma),
            Normal(jnp.asarray(0.0), jnp.asarray(1.0)),
            _ar_initial,
        )

    def tree_flatten(self):
        return (self.parameters,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[0])


def _rw_mean_scale(x, sigma):
    return x.value, sigma


def _rw_initial(sigma):
    return Normal(jnp.zeros_like(jnp.asarray(sigma)), sigma)


@register_pytree_node_class
class RandomWalk(AffineProcess):
    """Gaussian random walk ``x' = x + sigma * eps``; initial ``N(0, sigma)``
    (matching the reference oracle's initial covariance, tests/filters/models.py:44-50)."""

    def __init__(self, sigma):
        super().__init__(
            _rw_mean_scale,
            (sigma,),
            Normal(jnp.asarray(0.0), jnp.asarray(1.0)),
            _rw_initial,
        )

    def tree_flatten(self):
        return (self.parameters,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[0])


def _ou_factory(dt):
    def mean_scale(x, kappa, gamma, sigma):
        decay = jnp.exp(-kappa * dt)
        loc = gamma + (x.value - gamma) * decay
        scale = sigma * jnp.sqrt((1.0 - jnp.square(decay)) / (2.0 * kappa))
        # mean_scale returns the INCREMENT form expected by AffineEulerMaruyama-style
        # callers; here the exact discretization is used directly.
        return loc, scale

    return mean_scale


def _ou_initial(kappa, gamma, sigma):
    return Normal(gamma, sigma / jnp.sqrt(2.0 * kappa))


@register_pytree_node_class
class OrnsteinUhlenbeck(AffineProcess):
    r"""Exactly discretized OU process.

    ``x' = gamma + (x - gamma) e^{-kappa dt} + sigma sqrt((1 - e^{-2 kappa dt}) / (2 kappa)) eps``;
    initial distribution is the stationary law ``N(gamma, sigma / sqrt(2 kappa))``.
    """

    def __init__(self, kappa, gamma, sigma, dt: float = 1.0):
        super().__init__(
            _ou_factory(dt),
            (kappa, gamma, sigma),
            Normal(jnp.asarray(0.0), jnp.asarray(1.0)),
            _ou_initial,
        )
        self.dt = dt

    def tree_flatten(self):
        return (self.parameters,), (self.dt,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[0], dt=aux[0])


def _verhulst_drift(x, kappa, gamma, sigma):
    return kappa * (gamma - x.value) * x.value, sigma * x.value


def _verhulst_initial(kappa, gamma, sigma):
    # Stationary approximation of the log-process: lognormal around the carrying
    # capacity gamma.
    return Normal(gamma, sigma / jnp.sqrt(2.0 * kappa))


@register_pytree_node_class
class Verhulst(AffineEulerMaruyama):
    r"""Stochastic Verhulst (logistic) SDE, Euler-Maruyama discretized:

    ``dX = kappa (gamma - X) X dt + sigma X dW``

    Used as the volatility process of the reference's stochastic-volatility
    example (stochastic-volatility.ipynb: ``ts.models.Verhulst(kappa, gamma,
    sigma, dt=dt)``).
    """

    def __init__(self, kappa, gamma, sigma, dt: float):
        super().__init__(
            _verhulst_drift,
            (kappa, gamma, sigma),
            Normal(jnp.asarray(0.0), jnp.sqrt(jnp.asarray(dt))),
            _verhulst_initial,
            dt=dt,
        )

    def tree_flatten(self):
        return (self.parameters,), (self.dt,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[0], dt=aux[0])
