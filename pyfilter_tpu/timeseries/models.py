"""Library of ready-made processes.

Equivalents of ``stochproc.timeseries.models`` (the reference's model-layer
dependency, SURVEY.md §2.9). The four the reference's tests/examples consume
(tests/filters/models.py:13,56; tests/inference/models.py:17;
stochastic-volatility.ipynb) — AR, RandomWalk, OrnsteinUhlenbeck, Verhulst —
plus the rest of the stochproc zoo users expect when switching:
LocalLinearTrend, TrendingOU, UCSV, Cyclical.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from ..distributions import Independent, Normal
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


def _llt_mean_scale(x, sigma_level, sigma_slope):
    level = x.value[..., 0]
    slope = x.value[..., 1]
    loc = jnp.stack([level + slope, slope], axis=-1)
    scale = jnp.broadcast_to(
        jnp.stack([jnp.asarray(sigma_level), jnp.asarray(sigma_slope)], axis=-1), loc.shape
    )
    return loc, scale


def _llt_initial(sigma_level, sigma_slope):
    s = jnp.stack([jnp.asarray(sigma_level), jnp.asarray(sigma_slope)], axis=-1)
    return Independent(Normal(jnp.zeros_like(s), s), 1)


@register_pytree_node_class
class LocalLinearTrend(AffineProcess):
    r"""Local linear trend (structural time-series): 2-D state
    ``(level, slope)`` with

    ``level' = level + slope + sigma_level * eps_1``,
    ``slope' = slope + sigma_slope * eps_2``;

    initial ``N(0, diag(sigma))``. Linear-Gaussian, so a Kalman oracle
    applies (stochproc.timeseries.models equivalent beyond the reference's
    direct usage — SURVEY.md §2.9)."""

    def __init__(self, sigma_level, sigma_slope):
        super().__init__(
            _llt_mean_scale,
            (sigma_level, sigma_slope),
            Independent(Normal(jnp.zeros(2), jnp.ones(2)), 1),
            _llt_initial,
        )

    def tree_flatten(self):
        return (self.parameters,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[0])


def _trending_ou_factory(dt):
    def mean_scale(x, kappa, gamma, beta, sigma):
        decay = jnp.exp(-kappa * dt)
        trend = gamma + beta * x.time_index
        loc = trend + (x.value - trend) * decay
        scale = sigma * jnp.sqrt((1.0 - jnp.square(decay)) / (2.0 * kappa))
        return loc, scale

    return mean_scale


def _trending_ou_initial(kappa, gamma, beta, sigma):
    return Normal(gamma, sigma / jnp.sqrt(2.0 * kappa))


@register_pytree_node_class
class TrendingOU(AffineProcess):
    r"""Ornstein-Uhlenbeck reverting to a moving linear trend
    ``theta_t = gamma + beta t`` (stochproc.timeseries.models equivalent):

    ``x' = theta_t + (x - theta_t) e^{-kappa dt} + sigma sqrt((1 - e^{-2 kappa dt}) / (2 kappa)) eps``

    with the trend frozen at the current time index over each step (exact OU
    discretization around a stepwise-constant trend); initial stationary
    ``N(gamma, sigma / sqrt(2 kappa))`` around the trend's intercept."""

    def __init__(self, kappa, gamma, beta, sigma, dt: float = 1.0):
        super().__init__(
            _trending_ou_factory(dt),
            (kappa, gamma, beta, sigma),
            Normal(jnp.asarray(0.0), jnp.asarray(1.0)),
            _trending_ou_initial,
        )
        self.dt = dt

    def tree_flatten(self):
        return (self.parameters,), (self.dt,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[0], dt=aux[0])


def _ucsv_mean_scale(x, sigma_volatility):
    level = x.value[..., 0]
    log_vol = x.value[..., 1]
    loc = jnp.stack([level, log_vol], axis=-1)
    scale = jnp.stack(
        [jnp.exp(log_vol), jnp.broadcast_to(jnp.asarray(sigma_volatility), log_vol.shape)],
        axis=-1,
    )
    return loc, scale


def _ucsv_initial(sigma_volatility):
    sv = jnp.asarray(sigma_volatility)
    loc = jnp.stack([jnp.zeros_like(sv), jnp.zeros_like(sv)], axis=-1)
    scale = jnp.stack([jnp.ones_like(sv), sv], axis=-1)
    return Independent(Normal(loc, scale), 1)


@register_pytree_node_class
class UCSV(AffineProcess):
    r"""Unobserved-components stochastic volatility (Stock-Watson style;
    stochproc.timeseries.models equivalent): a Gaussian random walk whose
    innovation scale is itself a log random walk. 2-D state
    ``(level, log_vol)``:

    ``level' = level + exp(log_vol) * eps_1``,
    ``log_vol' = log_vol + sigma_volatility * eps_2``;

    initial ``level ~ N(0, 1)``, ``log_vol ~ N(0, sigma_volatility)``."""

    def __init__(self, sigma_volatility):
        super().__init__(
            _ucsv_mean_scale,
            (sigma_volatility,),
            Independent(Normal(jnp.zeros(2), jnp.ones(2)), 1),
            _ucsv_initial,
        )

    def tree_flatten(self):
        return (self.parameters,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[0])


def _cyclical_mean_scale(x, rho, lamda, sigma):
    c = x.value[..., 0]
    c_star = x.value[..., 1]
    cos_l = jnp.cos(lamda)
    sin_l = jnp.sin(lamda)
    loc = jnp.stack(
        [rho * (c * cos_l + c_star * sin_l), rho * (-c * sin_l + c_star * cos_l)],
        axis=-1,
    )
    scale = jnp.broadcast_to(jnp.asarray(sigma)[..., None], loc.shape)
    return loc, scale


def _cyclical_initial(rho, lamda, sigma):
    # stationary: both components have variance sigma^2 / (1 - rho^2)
    s = jnp.asarray(sigma) / jnp.sqrt(1.0 - jnp.square(jnp.asarray(rho)))
    scale = jnp.broadcast_to(s[..., None], s.shape + (2,))
    return Independent(Normal(jnp.zeros_like(scale), scale), 1)


@register_pytree_node_class
class Cyclical(AffineProcess):
    r"""Harvey's stochastic cycle (structural time-series;
    stochproc.timeseries.models equivalent — SURVEY.md §2.9): a damped
    rotation of the 2-D state ``(c, c*)`` at frequency ``lamda``:

    ``c'  = rho ( c cos lamda + c* sin lamda) + sigma * eps_1``,
    ``c*' = rho (-c sin lamda + c* cos lamda) + sigma * eps_2``;

    ``0 < rho < 1`` damps the cycle; the initial distribution is the
    stationary law ``N(0, sigma^2 / (1 - rho^2) I)``. Linear-Gaussian, so
    the exact Kalman filter applies (oracle-tested)."""

    def __init__(self, rho, lamda, sigma):
        super().__init__(
            _cyclical_mean_scale,
            (rho, lamda, sigma),
            Independent(Normal(jnp.zeros(2), jnp.ones(2)), 1),
            _cyclical_initial,
        )

    def tree_flatten(self):
        return (self.parameters,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[0])


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
