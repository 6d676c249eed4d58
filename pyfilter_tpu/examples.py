"""The reference's bundled example models, rebuilt on pyfilter_tpu.

These are the de-facto benchmark workloads (BASELINE.md / SURVEY.md §6):

- sine diffusion (reference README.md:35-82)
- stochastic volatility: Verhulst vol + sinh-arcsinh observation
  (reference examples/stochastic-volatility.ipynb)
- Lorenz-63 SDE with partial 2-D observation (reference examples/lorenz.ipynb)
- nutria population model (reference examples/nutria.ipynb)

Each workload ships two builders: a fixed-parameter model (for filtering /
benchmarks) and a prior-registering ``*_builder(context)`` (for inference).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from . import distributions as dist
from . import timeseries as ts
from .timeseries import models


def maybe_enable_compile_cache() -> None:
    """Honor ``PYFILTER_COMPILE_CACHE=<dir>``: persist XLA compiles there.

    The example scripts call this right after their imports so that harnesses
    running them as subprocesses (tests/test_example_scripts.py) can share
    one persistent cache across scripts and suite runs — a cold
    single-core run otherwise pays every example's full compile stack inside
    the subprocess timeout (observed: the SMC2 example exceeding 900 s while
    a cold full-suite run saturated the host's one core). No-op when the
    variable is unset."""
    import os

    path = os.environ.get("PYFILTER_COMPILE_CACHE")
    if path:
        from .compile_cache import enable_compile_cache

        enable_compile_cache(path, min_compile_time_secs=0.5)


# ---------------------------------------------------------------------------
# sine diffusion (README example)
# ---------------------------------------------------------------------------


def _sine_drift(x, gamma, sigma):
    return jnp.sin(x.value - gamma), sigma


def sine_diffusion_model(gamma: float = 0.0, sigma: float = 1.0, dt: float = 0.05, obs_a: float = 1.0, obs_s: float = 0.1):
    """Sine-drift SDE observed linearly (reference README.md:35-82)."""
    proc = ts.AffineEulerMaruyama(
        _sine_drift,
        (gamma, sigma),
        dist.Normal(0.0, math.sqrt(dt)),
        lambda g, s: dist.Normal(0.0, 1.0),
        dt=dt,
    )
    return ts.LinearStateSpaceModel(proc, (obs_a, obs_s))


# ---------------------------------------------------------------------------
# stochastic volatility (flagship)
# ---------------------------------------------------------------------------


def sv_observation(x, mu, nu, tau):
    """Sinh-arcsinh-skewed observation with the volatility as scale
    (reference stochastic-volatility.ipynb ``build_obs``)."""
    scale = x.value
    base = dist.Normal(jnp.zeros_like(scale), jnp.ones_like(scale))
    return dist.TransformedDistribution(
        base, [dist.SinhArcsinh(nu, tau), dist.Affine(mu, scale)]
    )


def stochastic_volatility_model(
    kappa: float = 0.1,
    gamma: float = 1.0,
    sigma: float = 0.05,
    mu: float = 0.0,
    nu: float = 0.0,
    tau: float = 1.0,
    dt: float = 0.2,
):
    """Verhulst volatility + sinh-arcsinh observation, ``observe_every_step =
    1/dt`` (reference stochastic-volatility.ipynb ``build_model``)."""
    vol = models.Verhulst(kappa, gamma, sigma, dt=dt)
    return ts.StateSpaceModel(
        vol, sv_observation, (mu, nu, tau), observe_every_step=int(1.0 / dt)
    )


def stochastic_volatility_builder(context, dt: float = 0.2):
    """Prior-registering builder for joint inference (same priors as the
    reference notebook)."""
    kappa = context.named_parameter("kappa", dist.Exponential(10.0))
    gamma = context.named_parameter("gamma", dist.LogNormal(0.0, 1.0))
    sigma = context.named_parameter("sigma", dist.LogNormal(math.log(0.05), 1.0))

    vol = models.Verhulst(kappa, gamma, sigma, dt=dt)

    mu = context.named_parameter("mu", dist.Normal(0.0, 0.5))
    nu = context.named_parameter("nu", dist.Normal(0.0, 0.15))
    tau = context.named_parameter("tau", dist.LogNormal(0.0, 0.1))

    return ts.StateSpaceModel(
        vol, sv_observation, (mu, nu, tau), observe_every_step=int(1.0 / dt)
    )


# ---------------------------------------------------------------------------
# Lorenz-63
# ---------------------------------------------------------------------------


def _lorenz_drift(x, s, r, b, sigma):
    x0, x1, x2 = x.value[..., 0], x.value[..., 1], x.value[..., 2]
    dx = -s * (x0 - x1)
    dy = r * x0 - x1 - x0 * x2
    dz = x0 * x1 - b * x2
    return jnp.stack((dx, dy, dz), axis=-1), sigma


def _lorenz_initial(s, r, b, *rest):
    mean = jnp.asarray([-5.91652, -5.52332, 24.5723])
    scale = math.sqrt(10.0) * jnp.ones(3)
    return dist.Normal(mean, scale).to_event(1)


def lorenz63_model(
    s: float = 10.0,
    r: float = 28.0,
    b: float = 8.0 / 3.0,
    observe_every_step: int = 10,
    dt: float = 1e-2,
):
    """3-D Lorenz SDE, partial 2-D linear observation (reference lorenz.ipynb)."""
    sigma = 1.0
    increment = dist.Normal(0.0, math.sqrt(dt)).expand((3,)).to_event(1)
    hidden = ts.AffineEulerMaruyama(
        _lorenz_drift,
        (s, r, b, sigma),
        increment,
        _lorenz_initial,
        dt=dt,
        event_ndim=1,
    )
    mat = jnp.asarray([[0.8, 0.0, 0.0], [0.0, 0.0, 0.8]])
    offset = jnp.zeros(2)
    scale = math.sqrt(0.1) * jnp.ones(2)
    return ts.LinearStateSpaceModel(
        hidden, (mat, offset, scale), event_shape=(2,), observe_every_step=observe_every_step
    )


def lorenz63_builder(context, observe_every_step: int = 10):
    """Uniform priors on (s, r, b) (reference lorenz.ipynb ``build_prob_model``)."""
    s = context.named_parameter("s", dist.Uniform(5.0, 40.0))
    r = context.named_parameter("r", dist.Uniform(10.0, 50.0))
    b = context.named_parameter("b", dist.Uniform(1.0, 20.0))
    return lorenz63_model(s, r, b, observe_every_step=observe_every_step)


# ---------------------------------------------------------------------------
# nutria population model
# ---------------------------------------------------------------------------


def _nutria_drift(x, a, b, c, sigma_e):
    exped = jnp.exp(x.value)
    return x.value + a + b * exped + c * exped**2.0, sigma_e


def _nutria_initial(a, b, c, sigma_e):
    return dist.Normal(jnp.zeros_like(jnp.asarray(a)), 1.0)


def nutria_model(a=0.1, b=-0.05, c=0.0, sigma_e=0.3, sigma_n=0.2):
    """Log-population growth model with linear observation (reference
    nutria.ipynb)."""
    hidden = ts.AffineProcess(
        _nutria_drift, (a, b, c, sigma_e), dist.Normal(0.0, 1.0), _nutria_initial
    )
    return ts.LinearStateSpaceModel(hidden, (1.0, sigma_n))


def nutria_builder(context, num_obs: int = 100):
    """Normal priors on the drift coefficients, inverse-gamma on the variances
    (reference nutria.ipynb ``build_model``)."""
    a = context.named_parameter("a", dist.Normal(0.0, 1.0))
    b = context.named_parameter("b", dist.Normal(0.0, 1.0))
    c = context.named_parameter("c", dist.Normal(0.0, 1.0))

    alpha = num_obs / 2.0
    beta = 2.0 * (alpha - 1.0) / 10.0
    sigma_e = jnp.sqrt(
        context.named_parameter("sigma_e", dist.InverseGamma(alpha, beta))
    )
    hidden = ts.AffineProcess(
        _nutria_drift, (a, b, c, sigma_e), dist.Normal(0.0, 1.0), _nutria_initial
    )

    sigma_n = jnp.sqrt(
        context.named_parameter("sigma_n", dist.InverseGamma(alpha, beta))
    )
    return ts.LinearStateSpaceModel(hidden, (jnp.ones_like(sigma_n), sigma_n))
