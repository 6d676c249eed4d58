"""Concrete univariate distributions + Categorical + Delta.

JAX-native equivalents of the pyro/torch distributions the reference and its
examples use (SURVEY.md §2.9): Normal, LogNormal, Uniform, Exponential, Gamma,
Beta, StudentT, Categorical, plus a Delta (point-mass) convenience, plus the
discrete count observation densities (Poisson, Bernoulli, Binomial,
NegativeBinomial) the reference gets from pyro for non-Gaussian SSMs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln, gammainc, gammaincc, gammaln, ndtr, ndtri, xlogy

from . import constraints
from .base import Distribution

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def _bshape(*args):
    return jnp.broadcast_shapes(*(jnp.shape(a) for a in args))


class Normal(Distribution):
    arg_names = ("loc", "scale")
    has_icdf = True
    arg_constraints = {"loc": constraints.real, "scale": constraints.positive}

    def __init__(self, loc, scale):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.loc, self.scale, 0.0)
        eps = jax.random.normal(key, shape, dtype=dtype)
        return self.loc + self.scale * eps

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -0.5 * jnp.square(z) - jnp.log(self.scale) - _LOG_SQRT_2PI

    def cdf(self, value):
        return ndtr((value - self.loc) / self.scale)

    def icdf(self, q):
        return self.loc + self.scale * ndtri(q)

    def entropy(self):
        return 0.5 + _LOG_SQRT_2PI + jnp.log(self.scale) + jnp.zeros(self.batch_shape)

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(jnp.square(self.scale), self.batch_shape)


class LogNormal(Distribution):
    arg_names = ("loc", "scale")
    has_icdf = True
    arg_constraints = {"loc": constraints.real, "scale": constraints.positive}

    def __init__(self, loc, scale):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    @property
    def support(self):
        return constraints.positive

    def sample(self, key, sample_shape=()):
        return jnp.exp(Normal(self.loc, self.scale).sample(key, sample_shape))

    def log_prob(self, value):
        log_v = jnp.log(value)
        return Normal(self.loc, self.scale).log_prob(log_v) - log_v

    def cdf(self, value):
        return ndtr((jnp.log(value) - self.loc) / self.scale)

    def icdf(self, q):
        return jnp.exp(self.loc + self.scale * ndtri(q))

    @property
    def mean(self):
        return jnp.exp(self.loc + 0.5 * jnp.square(self.scale)) + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        s2 = jnp.square(self.scale)
        return (jnp.exp(s2) - 1.0) * jnp.exp(2.0 * self.loc + s2) + jnp.zeros(self.batch_shape)


class Uniform(Distribution):
    arg_names = ("low", "high")
    has_icdf = True
    arg_constraints = {"low": constraints.real, "high": constraints.real}

    def __init__(self, low=0.0, high=1.0):
        self.low = low
        self.high = high

    @property
    def batch_shape(self):
        return _bshape(self.low, self.high)

    @property
    def support(self):
        # priors flow through jit as pytree leaves (inference/context.py), so
        # the bounds may be tracers; ``biject_to``'s Sigmoid+Affine handles
        # array bounds fine — only collapse to Python floats when concrete
        # (nicer constraint reprs / hashability)
        if isinstance(self.low, jax.core.Tracer) or isinstance(self.high, jax.core.Tracer):
            return constraints.Interval(self.low, self.high)
        import numpy as np

        return constraints.Interval(float(np.min(np.asarray(self.low))), float(np.max(np.asarray(self.high))))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.low, self.high, 0.0)
        u = jax.random.uniform(key, shape, dtype=dtype)
        return self.low + (self.high - self.low) * u

    def log_prob(self, value):
        inside = (value >= self.low) & (value <= self.high)
        lp = -jnp.log(self.high - self.low) + jnp.zeros(jnp.shape(value))
        return jnp.where(inside, lp, -jnp.inf)

    def cdf(self, value):
        return jnp.clip((value - self.low) / (self.high - self.low), 0.0, 1.0)

    def icdf(self, q):
        return self.low + (self.high - self.low) * q

    @property
    def mean(self):
        return (self.low + self.high) / 2.0 + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        return jnp.square(self.high - self.low) / 12.0 + jnp.zeros(self.batch_shape)


class Exponential(Distribution):
    arg_names = ("rate",)
    has_icdf = True
    arg_constraints = {"rate": constraints.positive}

    def __init__(self, rate):
        self.rate = rate

    @property
    def batch_shape(self):
        return jnp.shape(self.rate)

    @property
    def support(self):
        return constraints.positive

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.rate, 0.0)
        return jax.random.exponential(key, shape, dtype=dtype) / self.rate

    def log_prob(self, value):
        return jnp.log(self.rate) - self.rate * value

    def cdf(self, value):
        return -jnp.expm1(-self.rate * value)

    def icdf(self, q):
        return -jnp.log1p(-q) / self.rate

    @property
    def mean(self):
        return 1.0 / self.rate + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        return 1.0 / jnp.square(self.rate) + jnp.zeros(self.batch_shape)


class Gamma(Distribution):
    arg_names = ("concentration", "rate")
    arg_constraints = {"concentration": constraints.positive, "rate": constraints.positive}

    def __init__(self, concentration, rate):
        self.concentration = concentration
        self.rate = rate

    @property
    def batch_shape(self):
        return _bshape(self.concentration, self.rate)

    @property
    def support(self):
        return constraints.positive

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.concentration, self.rate, 0.0)
        g = jax.random.gamma(key, jnp.broadcast_to(jnp.asarray(self.concentration, dtype), shape), dtype=dtype)
        return g / self.rate

    def log_prob(self, value):
        a, b = self.concentration, self.rate
        return a * jnp.log(b) + (a - 1.0) * jnp.log(value) - b * value - gammaln(a)

    def cdf(self, value):
        return gammainc(self.concentration, self.rate * value)

    @property
    def mean(self):
        return self.concentration / self.rate + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        return self.concentration / jnp.square(self.rate) + jnp.zeros(self.batch_shape)


class InverseGamma(Distribution):
    """Inverse-gamma (used by the reference's nutria example for observation
    variances, nutria.ipynb): ``X = 1/G`` for ``G ~ Gamma(concentration, rate)``."""

    arg_names = ("concentration", "rate")
    arg_constraints = {"concentration": constraints.positive, "rate": constraints.positive}

    def __init__(self, concentration, rate):
        self.concentration = concentration
        self.rate = rate

    @property
    def batch_shape(self):
        return _bshape(self.concentration, self.rate)

    @property
    def support(self):
        return constraints.positive

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.concentration, self.rate, 0.0)
        g = jax.random.gamma(
            key, jnp.broadcast_to(jnp.asarray(self.concentration, dtype), shape), dtype=dtype
        )
        return self.rate / g

    def log_prob(self, value):
        a, b = self.concentration, self.rate
        return a * jnp.log(b) - (a + 1.0) * jnp.log(value) - b / value - gammaln(a)

    def cdf(self, value):
        return 1.0 - gammainc(self.concentration, self.rate / value)

    @property
    def mean(self):
        a = jnp.asarray(self.concentration)
        m = self.rate / (a - 1.0)
        return jnp.where(a > 1.0, m, jnp.nan) + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        a = jnp.asarray(self.concentration)
        v = jnp.square(self.rate) / (jnp.square(a - 1.0) * (a - 2.0))
        return jnp.where(a > 2.0, v, jnp.nan) + jnp.zeros(self.batch_shape)


class Beta(Distribution):
    arg_names = ("concentration1", "concentration0")
    arg_constraints = {
        "concentration1": constraints.positive,
        "concentration0": constraints.positive,
    }

    def __init__(self, concentration1, concentration0):
        self.concentration1 = concentration1
        self.concentration0 = concentration0

    @property
    def batch_shape(self):
        return _bshape(self.concentration1, self.concentration0)

    @property
    def support(self):
        return constraints.unit_interval

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.concentration1, self.concentration0, 0.0)
        return jax.random.beta(key, self.concentration1, self.concentration0, shape, dtype=dtype)

    def log_prob(self, value):
        a, b = self.concentration1, self.concentration0
        return (a - 1.0) * jnp.log(value) + (b - 1.0) * jnp.log1p(-value) - betaln(a, b)

    @property
    def mean(self):
        a, b = self.concentration1, self.concentration0
        return a / (a + b) + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        a, b = self.concentration1, self.concentration0
        tot = a + b
        return a * b / (jnp.square(tot) * (tot + 1.0)) + jnp.zeros(self.batch_shape)


class StudentT(Distribution):
    arg_names = ("df", "loc", "scale")
    arg_constraints = {
        "df": constraints.positive,
        "loc": constraints.real,
        "scale": constraints.positive,
    }

    def __init__(self, df, loc=0.0, scale=1.0):
        self.df = df
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return _bshape(self.df, self.loc, self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.df, self.loc, self.scale, 0.0)
        t = jax.random.t(key, jnp.asarray(self.df, dtype), shape=shape, dtype=dtype)
        return self.loc + self.scale * t

    def log_prob(self, value):
        df = self.df
        z = (value - self.loc) / self.scale
        return (
            gammaln((df + 1.0) / 2.0)
            - gammaln(df / 2.0)
            - 0.5 * jnp.log(df * math.pi)
            - jnp.log(self.scale)
            - (df + 1.0) / 2.0 * jnp.log1p(jnp.square(z) / df)
        )

    @property
    def mean(self):
        return jnp.where(self.df > 1, self.loc, jnp.nan) + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        v = jnp.square(self.scale) * self.df / (self.df - 2.0)
        return jnp.where(self.df > 2, v, jnp.nan) + jnp.zeros(self.batch_shape)


class Laplace(Distribution):
    """Laplace (double-exponential) — the standard robust/heavy-tailed
    observation noise and sparsity prior. Closed-form icdf → QMC-compatible."""

    arg_names = ("loc", "scale")
    has_icdf = True
    arg_constraints = {"loc": constraints.real, "scale": constraints.positive}

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.loc, self.scale, 0.0)
        return self.loc + self.scale * jax.random.laplace(key, shape, dtype=dtype)

    def log_prob(self, value):
        z = jnp.abs(value - self.loc) / self.scale
        return -z - jnp.log(2.0 * self.scale) + jnp.zeros(self.batch_shape)

    def cdf(self, value):
        z = (value - self.loc) / self.scale
        # 0.5 * exp(z) below loc; 1 - 0.5 * exp(-z) above
        return jnp.where(z < 0, 0.5 * jnp.exp(z), 1.0 - 0.5 * jnp.exp(-z))

    def icdf(self, q):
        # sign(q - 1/2) * log(1 - 2|q - 1/2|), stable at both tails
        a = q - 0.5
        return self.loc - self.scale * jnp.sign(a) * jnp.log1p(-2.0 * jnp.abs(a))

    @property
    def mean(self):
        return self.loc + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        return 2.0 * jnp.square(self.scale) + jnp.zeros(self.batch_shape)


class Cauchy(Distribution):
    """Cauchy — extreme heavy tails (undefined mean/variance, torch
    convention: both report NaN). Closed-form icdf → QMC-compatible."""

    arg_names = ("loc", "scale")
    has_icdf = True
    arg_constraints = {"loc": constraints.real, "scale": constraints.positive}

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.loc, self.scale, 0.0)
        return self.loc + self.scale * jax.random.cauchy(key, shape, dtype=dtype)

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -jnp.log1p(jnp.square(z)) - jnp.log(math.pi * self.scale) + jnp.zeros(self.batch_shape)

    def cdf(self, value):
        z = (value - self.loc) / self.scale
        return jnp.arctan(z) / math.pi + 0.5

    def icdf(self, q):
        return self.loc + self.scale * jnp.tan(math.pi * (q - 0.5))

    @property
    def mean(self):
        return jnp.full(self.batch_shape, jnp.nan) + self.loc * 0.0

    @property
    def variance(self):
        return jnp.full(self.batch_shape, jnp.nan) + self.scale * 0.0


class Weibull(Distribution):
    """Weibull with ``scale`` λ and ``concentration`` k (torch parameterization;
    duration/survival observation density). Closed-form icdf → QMC-compatible."""

    arg_names = ("scale", "concentration")
    has_icdf = True
    arg_constraints = {"scale": constraints.positive, "concentration": constraints.positive}

    def __init__(self, scale, concentration):
        self.scale = scale
        self.concentration = concentration

    @property
    def batch_shape(self):
        return _bshape(self.scale, self.concentration)

    @property
    def support(self):
        return constraints.positive

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.scale, self.concentration, 0.0)
        # inverse-CDF of a unit exponential: X = λ * E^(1/k)
        e = jax.random.exponential(key, shape, dtype=dtype)
        return self.scale * jnp.power(e, 1.0 / jnp.asarray(self.concentration, dtype))

    def log_prob(self, value):
        lam, k = self.scale, self.concentration
        z = value / lam
        return jnp.log(k / lam) + (k - 1.0) * jnp.log(z) - jnp.power(z, k)

    def cdf(self, value):
        return -jnp.expm1(-jnp.power(value / self.scale, self.concentration))

    def icdf(self, q):
        return self.scale * jnp.power(-jnp.log1p(-q), 1.0 / self.concentration)

    @property
    def mean(self):
        k = self.concentration
        return self.scale * jnp.exp(gammaln(1.0 + 1.0 / k)) + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        k = self.concentration
        m1 = jnp.exp(gammaln(1.0 + 1.0 / k))
        m2 = jnp.exp(gammaln(1.0 + 2.0 / k))
        return jnp.square(self.scale) * (m2 - jnp.square(m1)) + jnp.zeros(self.batch_shape)


class HalfNormal(Distribution):
    """|N(0, scale²)| — the standard weakly-informative scale prior.
    Closed-form icdf → QMC-compatible."""

    arg_names = ("scale",)
    has_icdf = True
    arg_constraints = {"scale": constraints.positive}

    def __init__(self, scale=1.0):
        self.scale = scale

    @property
    def batch_shape(self):
        return jnp.shape(self.scale)

    @property
    def support(self):
        return constraints.positive

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.scale, 0.0)
        return jnp.abs(self.scale * jax.random.normal(key, shape, dtype=dtype))

    def log_prob(self, value):
        z = value / self.scale
        return (
            math.log(2.0)
            - 0.5 * jnp.square(z)
            - jnp.log(self.scale)
            - _LOG_SQRT_2PI
            + jnp.zeros(self.batch_shape)
        )

    def cdf(self, value):
        return 2.0 * ndtr(value / self.scale) - 1.0

    def icdf(self, q):
        return self.scale * ndtri(0.5 * (q + 1.0))

    @property
    def mean(self):
        return self.scale * math.sqrt(2.0 / math.pi) + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        return jnp.square(self.scale) * (1.0 - 2.0 / math.pi) + jnp.zeros(self.batch_shape)


class HalfCauchy(Distribution):
    """|Cauchy(0, scale)| — the heavy-tailed scale prior (Gelman's default for
    hierarchical variance components). Closed-form icdf → QMC-compatible."""

    arg_names = ("scale",)
    has_icdf = True
    arg_constraints = {"scale": constraints.positive}

    def __init__(self, scale=1.0):
        self.scale = scale

    @property
    def batch_shape(self):
        return jnp.shape(self.scale)

    @property
    def support(self):
        return constraints.positive

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.scale, 0.0)
        return jnp.abs(self.scale * jax.random.cauchy(key, shape, dtype=dtype))

    def log_prob(self, value):
        z = value / self.scale
        return (
            math.log(2.0 / math.pi)
            - jnp.log1p(jnp.square(z))
            - jnp.log(self.scale)
            + jnp.zeros(self.batch_shape)
        )

    def cdf(self, value):
        return (2.0 / math.pi) * jnp.arctan(value / self.scale)

    def icdf(self, q):
        return self.scale * jnp.tan(0.5 * math.pi * q)

    @property
    def mean(self):
        return jnp.full(self.batch_shape, jnp.nan) + self.scale * 0.0

    @property
    def variance(self):
        return jnp.full(self.batch_shape, jnp.nan) + self.scale * 0.0


class Gumbel(Distribution):
    """Gumbel (type-I extreme value) — block-maxima observation density.
    Closed-form icdf → QMC-compatible."""

    arg_names = ("loc", "scale")
    has_icdf = True
    arg_constraints = {"loc": constraints.real, "scale": constraints.positive}
    _EULER = 0.5772156649015329

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.loc, self.scale, 0.0)
        return self.loc + self.scale * jax.random.gumbel(key, shape, dtype=dtype)

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -(z + jnp.exp(-z)) - jnp.log(self.scale) + jnp.zeros(self.batch_shape)

    def cdf(self, value):
        z = (value - self.loc) / self.scale
        return jnp.exp(-jnp.exp(-z))

    def icdf(self, q):
        return self.loc - self.scale * jnp.log(-jnp.log(q))

    @property
    def mean(self):
        return self.loc + self.scale * self._EULER + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        return jnp.square(math.pi * jnp.asarray(self.scale)) / 6.0 + jnp.zeros(
            self.batch_shape
        )


class Logistic(Distribution):
    """Logistic — near-Gaussian body with heavier tails; the latent noise of
    logit-link models. Closed-form icdf → QMC-compatible."""

    arg_names = ("loc", "scale")
    has_icdf = True
    arg_constraints = {"loc": constraints.real, "scale": constraints.positive}

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = loc
        self.scale = scale

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.loc, self.scale, 0.0)
        return self.loc + self.scale * jax.random.logistic(key, shape, dtype=dtype)

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        # -z - 2*softplus(-z) is the stable form of log( e^{-z} / (1+e^{-z})² )
        return -z - 2.0 * jax.nn.softplus(-z) - jnp.log(self.scale) + jnp.zeros(self.batch_shape)

    def cdf(self, value):
        return jax.nn.sigmoid((value - self.loc) / self.scale)

    def icdf(self, q):
        return self.loc + self.scale * (jnp.log(q) - jnp.log1p(-q))

    @property
    def mean(self):
        return self.loc + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        return jnp.square(math.pi * jnp.asarray(self.scale)) / 3.0 + jnp.zeros(
            self.batch_shape
        )


class Chi2(Distribution):
    """Chi-squared with ``df`` degrees of freedom = Gamma(df/2, rate=1/2)."""

    arg_names = ("df",)
    arg_constraints = {"df": constraints.positive}

    def __init__(self, df):
        self.df = df

    def _gamma(self) -> Gamma:
        return Gamma(jnp.asarray(self.df) / 2.0, 0.5)

    @property
    def batch_shape(self):
        return jnp.shape(self.df)

    @property
    def support(self):
        return constraints.positive

    def sample(self, key, sample_shape=()):
        return self._gamma().sample(key, sample_shape)

    def log_prob(self, value):
        return self._gamma().log_prob(value)

    def cdf(self, value):
        return self._gamma().cdf(value)

    @property
    def mean(self):
        return jnp.asarray(self.df) + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        return 2.0 * jnp.asarray(self.df) + jnp.zeros(self.batch_shape)


class TruncatedNormal(Distribution):
    """Normal(loc, scale²) truncated to ``[low, high]`` (either bound may be
    ±inf). Sampling uses ``jax.random.truncated_normal`` (robust in the
    tails); the icdf is closed-form → QMC-compatible."""

    arg_names = ("loc", "scale", "low", "high")
    has_icdf = True
    arg_constraints = {
        "loc": constraints.real,
        "scale": constraints.positive,
        "low": constraints.real,
        "high": constraints.real,
    }

    def __init__(self, loc=0.0, scale=1.0, low=-jnp.inf, high=jnp.inf):
        self.loc = loc
        self.scale = scale
        self.low = low
        self.high = high

    @property
    def batch_shape(self):
        return _bshape(self.loc, self.scale, self.low, self.high)

    @property
    def support(self):
        return constraints.Interval(self.low, self.high)

    def _std_bounds(self):
        a = (jnp.asarray(self.low) - self.loc) / self.scale
        b = (jnp.asarray(self.high) - self.loc) / self.scale
        return a, b

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.loc, self.scale, 0.0)
        a, b = self._std_bounds()
        z = jax.random.truncated_normal(
            key, jnp.asarray(a, dtype), jnp.asarray(b, dtype), shape, dtype=dtype
        )
        return self.loc + self.scale * z

    def _log_z(self):
        a, b = self._std_bounds()
        return jnp.log(ndtr(b) - ndtr(a))

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        in_support = (value >= self.low) & (value <= self.high)
        lp = (
            -0.5 * jnp.square(z)
            - jnp.log(self.scale)
            - _LOG_SQRT_2PI
            - self._log_z()
        )
        return jnp.where(in_support, lp, -jnp.inf)

    def cdf(self, value):
        a, b = self._std_bounds()
        ca = ndtr(a)
        raw = (ndtr((value - self.loc) / self.scale) - ca) / (ndtr(b) - ca)
        return jnp.clip(raw, 0.0, 1.0)

    def icdf(self, q):
        a, b = self._std_bounds()
        ca, cb = ndtr(a), ndtr(b)
        return self.loc + self.scale * ndtri(ca + q * (cb - ca))

    @property
    def mean(self):
        a, b = self._std_bounds()
        z = ndtr(b) - ndtr(a)
        pa, pb = _std_normal_pdf(a), _std_normal_pdf(b)
        return self.loc + self.scale * (pa - pb) / z + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        a, b = self._std_bounds()
        z = ndtr(b) - ndtr(a)
        pa, pb = _std_normal_pdf(a), _std_normal_pdf(b)
        # x·φ(x) → 0 as x → ±inf: mask the indeterminate inf·0 products
        apa = jnp.where(jnp.isfinite(a), a * pa, 0.0)
        bpb = jnp.where(jnp.isfinite(b), b * pb, 0.0)
        frac = (apa - bpb) / z
        return jnp.square(self.scale) * (1.0 + frac - jnp.square((pa - pb) / z)) + jnp.zeros(
            self.batch_shape
        )


def _std_normal_pdf(x):
    return jnp.exp(-0.5 * jnp.square(x)) / math.sqrt(2.0 * math.pi)


class Categorical(Distribution):
    """Categorical over the last axis of ``logits``/``probs``."""

    arg_names = ("logits",)

    def __init__(self, logits=None, probs=None):
        if (logits is None) == (probs is None):
            raise ValueError("exactly one of logits or probs must be given")
        if probs is not None:
            logits = jnp.log(probs)
        self.logits = logits

    @property
    def batch_shape(self):
        return jnp.shape(self.logits)[:-1]

    @property
    def num_categories(self):
        return jnp.shape(self.logits)[-1]

    @property
    def probs(self):
        return jax.nn.softmax(self.logits, axis=-1)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.categorical(key, self.logits, axis=-1, shape=shape)

    def log_prob(self, value):
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        value = jnp.asarray(value, jnp.int32)
        logp = jnp.broadcast_to(logp, jnp.broadcast_shapes(jnp.shape(value), self.batch_shape) + logp.shape[-1:])
        return jnp.take_along_axis(logp, value[..., None], axis=-1)[..., 0]

    @property
    def mean(self):
        k = jnp.arange(self.num_categories, dtype=self.probs.dtype)
        return jnp.sum(self.probs * k, axis=-1)

    @property
    def variance(self):
        k = jnp.arange(self.num_categories, dtype=self.probs.dtype)
        m = self.mean[..., None]
        return jnp.sum(self.probs * jnp.square(k - m), axis=-1)


class Poisson(Distribution):
    """Poisson counts with intensity ``rate``.

    Samples are returned in the ``rate`` float dtype (torch/pyro convention) so
    count observations flow through the float weight/impute paths unchanged.
    Covers the pyro observation densities the reference consumes for count
    data (SURVEY.md §2.9 distribution contract).
    """

    arg_names = ("rate",)
    arg_constraints = {"rate": constraints.positive}

    def __init__(self, rate):
        self.rate = rate

    @property
    def batch_shape(self):
        return jnp.shape(self.rate)

    @property
    def support(self):
        return constraints.nonnegative

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.rate, 0.0)
        k = jax.random.poisson(key, jnp.asarray(self.rate, dtype), shape=shape)
        return jnp.asarray(k, dtype)

    def log_prob(self, value):
        return xlogy(value, self.rate) - self.rate - gammaln(value + 1.0)

    def cdf(self, value):
        # P(X <= k) = Q(floor(k)+1, rate), the regularized upper incomplete gamma
        return gammaincc(jnp.floor(value) + 1.0, self.rate)

    @property
    def mean(self):
        return jnp.asarray(self.rate) + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        return jnp.asarray(self.rate) + jnp.zeros(self.batch_shape)


def _resolve_logits(logits, probs):
    if (logits is None) == (probs is None):
        raise ValueError("exactly one of logits or probs must be given")
    if probs is not None:
        probs = jnp.asarray(probs)
        logits = jnp.log(probs) - jnp.log1p(-probs)
    return logits


class Bernoulli(Distribution):
    """Bernoulli in {0, 1}; parameterized by ``logits`` or ``probs``.

    ``log_prob`` uses the softplus form (no exp/log round-trip), stable for
    extreme logits. Samples are floats (torch convention).
    """

    arg_names = ("logits",)

    def __init__(self, logits=None, probs=None):
        self.logits = _resolve_logits(logits, probs)

    @property
    def batch_shape(self):
        return jnp.shape(self.logits)

    @property
    def support(self):
        return constraints.Interval(0.0, 1.0)

    @property
    def probs(self):
        return jax.nn.sigmoid(self.logits)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.logits, 0.0)
        return jnp.asarray(jax.random.bernoulli(key, self.probs, shape=shape), dtype)

    def log_prob(self, value):
        # v*log(sigmoid(l)) + (1-v)*log(sigmoid(-l))
        l = self.logits
        return -value * jax.nn.softplus(-l) - (1.0 - value) * jax.nn.softplus(l)

    @property
    def mean(self):
        return self.probs + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        p = self.probs
        return p * (1.0 - p) + jnp.zeros(self.batch_shape)


class Binomial(Distribution):
    """Binomial counts out of ``total_count`` trials; ``logits`` or ``probs``."""

    arg_names = ("total_count", "logits")

    def __init__(self, total_count, logits=None, probs=None):
        self.total_count = total_count
        self.logits = _resolve_logits(logits, probs)

    @property
    def batch_shape(self):
        return _bshape(self.total_count, self.logits)

    @property
    def support(self):
        return constraints.nonnegative

    @property
    def probs(self):
        return jax.nn.sigmoid(self.logits)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.logits, 0.0)
        n = jnp.asarray(self.total_count, dtype)
        return jnp.asarray(jax.random.binomial(key, n, self.probs, shape=shape), dtype)

    def log_prob(self, value):
        n, l = jnp.asarray(self.total_count), self.logits
        log_comb = gammaln(n + 1.0) - gammaln(value + 1.0) - gammaln(n - value + 1.0)
        return log_comb - value * jax.nn.softplus(-l) - (n - value) * jax.nn.softplus(l)

    @property
    def mean(self):
        return self.total_count * self.probs + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        p = self.probs
        return self.total_count * p * (1.0 - p) + jnp.zeros(self.batch_shape)


class NegativeBinomial(Distribution):
    """Negative binomial: failures before ``total_count`` successes, torch
    parameterization (``probs`` = success probability, mean = r*p/(1-p)) —
    the standard over-dispersed count observation density.

    Sampling uses the exact Gamma-Poisson mixture: ``lam ~ Gamma(r, (1-p)/p)``
    then ``k ~ Poisson(lam)`` — two vectorized draws, no rejection loop (TPU-
    friendly: static shapes, no data-dependent control flow).
    """

    arg_names = ("total_count", "logits")

    def __init__(self, total_count, logits=None, probs=None):
        self.total_count = total_count
        self.logits = _resolve_logits(logits, probs)

    @property
    def batch_shape(self):
        return _bshape(self.total_count, self.logits)

    @property
    def support(self):
        return constraints.nonnegative

    @property
    def probs(self):
        return jax.nn.sigmoid(self.logits)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        dtype = jnp.result_type(self.logits, 0.0)
        k_gamma, k_pois = jax.random.split(key)
        r = jnp.broadcast_to(jnp.asarray(self.total_count, dtype), shape)
        # rate = Gamma(r, 1) * p/(1-p) = Gamma(r, 1) * exp(logits)
        lam = jax.random.gamma(k_gamma, r, dtype=dtype) * jnp.exp(jnp.asarray(self.logits, dtype))
        return jnp.asarray(jax.random.poisson(k_pois, lam, shape=shape), dtype)

    def log_prob(self, value):
        r, l = jnp.asarray(self.total_count), self.logits
        log_comb = gammaln(value + r) - gammaln(r) - gammaln(value + 1.0)
        # + r*log(1-p) + k*log(p)
        return log_comb - r * jax.nn.softplus(l) - value * jax.nn.softplus(-l)

    @property
    def mean(self):
        # r * p/(1-p) = r * exp(logits)
        return self.total_count * jnp.exp(self.logits) + jnp.zeros(self.batch_shape)

    @property
    def variance(self):
        return self.mean / jax.nn.sigmoid(-self.logits)


class Delta(Distribution):
    """Point mass at ``value`` (with optional event rank)."""

    arg_names = ("value",)
    aux_names = ("event_ndim",)

    def __init__(self, value, event_ndim: int = 0):
        self.value = value
        self.event_ndim = event_ndim

    @property
    def batch_shape(self):
        s = jnp.shape(self.value)
        return s[: len(s) - self.event_ndim]

    @property
    def event_shape(self):
        s = jnp.shape(self.value)
        return s[len(s) - self.event_ndim:]

    def sample(self, key, sample_shape=()):
        return jnp.broadcast_to(self.value, tuple(sample_shape) + jnp.shape(self.value))

    def log_prob(self, value):
        eq = value == self.value
        if self.event_ndim:
            eq = jnp.all(eq, axis=tuple(range(-self.event_ndim, 0)))
        return jnp.where(eq, 0.0, -jnp.inf)

    @property
    def mean(self):
        return jnp.asarray(self.value)

    @property
    def variance(self):
        return jnp.zeros(jnp.shape(self.value))
