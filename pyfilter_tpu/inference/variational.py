"""Variational inference over model parameters via the particle-filter factor.

Re-design of the reference's pyro bridge (reference filters/particle/base.py:176-229
+ tests/filters/test_pyro.py): the filter supplies an FFBS-smoothed, parameter-
differentiable log-likelihood factor; here the surrounding SVI machinery is
explicit — a diagonal-Gaussian guide on the unconstrained parameter space and
an optax Adam loop maximizing the ELBO

.. math::
    \\mathcal{L} = E_q[ \\hat\\ell(\\theta) + \\log p(\\theta) - \\log q(\\theta) ]

with the expectation vectorized over ``num_elbo_samples`` parameter lanes
(pyro's ``vectorize_particles=True``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..distributions import Normal
from .context import InferenceContext


class GuideState(NamedTuple):
    loc: jax.Array
    log_scale: jax.Array


class SVIResult(NamedTuple):
    guide: GuideState
    losses: jax.Array
    context: InferenceContext

    def posterior(self):
        """Diagonal-Gaussian posterior over the unconstrained parameters."""
        return Normal(self.guide.loc, jnp.exp(self.guide.log_scale)).to_event(1)

    def posterior_quantiles(self, context: InferenceContext = None, qs=(0.05, 0.5, 0.95)):
        """Per-parameter constrained-space quantiles (reference test_pyro.py:50-63
        reads the guide's median/std)."""
        from . import prior as prior_ops

        ctx = context if context is not None else self.context
        out = {}
        for q in qs:
            z = self.guide.loc + jnp.exp(self.guide.log_scale) * jnp.asarray(
                jax.scipy.stats.norm.ppf(q), self.guide.loc.dtype
            )
            index = 0
            for name in ctx.parameters:
                shape = ctx.get_shape(name, constrained=False)
                numel = int(np.prod(shape, dtype=np.int64)) if shape else 1
                chunk = z[index : index + numel].reshape(shape)
                constrained = prior_ops.get_constrained(ctx.get_prior(name), chunk)
                out.setdefault(name, {})[q] = np.asarray(constrained)
                index += numel
        return out


def fit_svi(
    build_model: Callable,
    y: jax.Array,
    filter_factory: Callable,
    key,
    num_steps: int = 500,
    num_elbo_samples: int = 4,
    learning_rate: float = 1e-2,
    context: InferenceContext = None,
    init_scale: float = 0.1,
    chunk_size: int = None,
) -> SVIResult:
    """Fit a diagonal-Gaussian guide by stochastic ELBO ascent.

    ``filter_factory(build_model) -> ParticleFilter`` constructs the filter
    whose smoothed log-likelihood acts as the (stop-gradient-filtered,
    density-differentiable) likelihood factor.

    ``chunk_size``: Adam steps advanced per compiled ``lax.scan`` (default:
    all ``num_steps`` in ONE dispatch). The reference's pyro SVI — and this
    function through round 2 — dispatched one step per iteration, paying one
    host→device round-trip per Adam step; the scanned loop is bit-identical
    (the key chain is threaded through the scan carry) and costs one
    dispatch per chunk.
    """
    import optax

    k_ctx, k_loop = jax.random.split(jax.random.PRNGKey(0) if key is None else key)

    ctx = context if context is not None else InferenceContext(key=k_ctx)
    if ctx.batch_shape is None:
        ctx.set_batch_shape((num_elbo_samples,))
    elif tuple(ctx.batch_shape) != (num_elbo_samples,):
        raise ValueError(
            f"context batch shape {ctx.batch_shape} must equal (num_elbo_samples,) "
            f"= ({num_elbo_samples},) — the ELBO samples ride the lane axis"
        )

    filt = filter_factory(build_model)
    filt = filt.set_batch_shape((num_elbo_samples,)).replace(record_states=True)
    filt = filt.initialize_model(ctx)

    theta0 = ctx.stack_parameters(constrained=False)  # (S, D)
    dim = theta0.shape[-1]
    guide = GuideState(jnp.mean(theta0, axis=0), jnp.full((dim,), jnp.log(init_scale)))

    y = jnp.asarray(y)
    opt = optax.adam(learning_rate)
    opt_state = opt.init(guide)

    def neg_elbo(g: GuideState, k):
        k_eps, k_factor = jax.random.split(k)
        eps = jax.random.normal(k_eps, (num_elbo_samples, dim))
        scale = jnp.exp(g.log_scale)
        theta = g.loc + scale * eps  # (S, D) reparameterized

        ctx2 = ctx.unstack_parameters(theta, constrained=False)
        filt2 = filt.initialize_model(ctx2)

        ll = filt2.smoothed_log_likelihood(k_factor, y)  # (S,)
        log_prior = ctx2.eval_priors(constrained=False)  # (S,)
        log_q = Normal(g.loc, scale).to_event(1).log_prob(theta)  # (S,)
        return -jnp.mean(ll + log_prior - log_q)

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chunk(g, o, k, n):
        def body(carry, _):
            g, o, k = carry
            k, k_i = jax.random.split(k)  # == the per-step loop's key chain
            loss, grads = jax.value_and_grad(neg_elbo)(g, k_i)
            updates, o = opt.update(grads, o)
            g = jax.tree_util.tree_map(lambda p, u: p + u, g, updates)
            return (g, o, k), loss

        (g, o, k), losses = jax.lax.scan(body, (g, o, k), None, length=n)
        return g, o, k, losses

    chunk = num_steps if chunk_size is None else max(int(chunk_size), 1)
    losses = []
    done = 0
    while done < num_steps:
        n = min(chunk, num_steps - done)
        guide, opt_state, k_loop, chunk_losses = run_chunk(guide, opt_state, k_loop, n)
        losses.append(chunk_losses)
        done += n

    return SVIResult(guide, jnp.concatenate(losses), ctx)


class MLEResult(NamedTuple):
    theta: jax.Array  # (1, D) unconstrained stacked parameters
    losses: jax.Array
    context: InferenceContext

    def parameters(self):
        """Fitted constrained parameter values, by name."""
        ctx = self.context.unstack_parameters(self.theta, constrained=False)
        return {n: np.asarray(v) for n, v in ctx.get_parameters(constrained=True)}


def fit_mle(
    build_model: Callable,
    y: jax.Array,
    filter_factory: Callable,
    key,
    num_steps: int = 200,
    learning_rate: float = 5e-2,
    context: InferenceContext = None,
    map_estimate: bool = False,
    chunk_size: int = None,
) -> MLEResult:
    """Maximum-likelihood (or MAP) point estimation by direct stochastic
    gradient ascent on the particle filter's marginal log-likelihood.

    New capability beyond the reference (whose only gradient path is the
    FFBS-smoothed pyro factor, reference filters/particle/base.py:176-229):
    the filter runs with ``differentiable=True`` — the Ścibior–Wood
    stop-gradient resampling correction (arXiv:2106.10314) makes
    ``result.log_likelihood`` differentiable w.r.t. model parameters with the
    correct expected gradient, so Adam can climb the likelihood surface
    directly, no smoothing pass needed. A fresh PRNG key per step keeps the
    gradient estimator unbiased across iterations (stochastic-approximation
    style rather than fixed-seed optimization of one realization).

    ``map_estimate=True`` adds the log-prior, yielding the posterior mode.
    ``chunk_size``: Adam steps per compiled ``lax.scan`` (default: all in one
    dispatch), same contract as :func:`fit_svi`.
    """
    import functools

    import optax

    k_ctx, k_loop = jax.random.split(jax.random.PRNGKey(0) if key is None else key)

    ctx = context if context is not None else InferenceContext(key=k_ctx)
    if ctx.batch_shape is None:
        ctx.set_batch_shape(())
    elif tuple(ctx.batch_shape) != ():
        raise ValueError(
            "fit_mle is a point estimator — the context's batch shape must be "
            "() (use fit_svi / the sequential algorithms for lane-batched "
            "posterior inference)"
        )

    filt = filter_factory(build_model)
    filt = filt.replace(differentiable=True)
    filt = filt.initialize_model(ctx)

    theta0 = ctx.stack_parameters(constrained=False)  # (1, D)
    y = jnp.asarray(y)
    opt = optax.adam(learning_rate)
    opt_state = opt.init(theta0)

    def loss_fn(theta, k):
        ctx2 = ctx.unstack_parameters(theta, constrained=False)
        filt2 = filt.initialize_model(ctx2)
        obj = filt2.batch_filter(k, y, use_jit=False).log_likelihood
        if map_estimate:
            obj = obj + ctx2.eval_priors(constrained=False)
        return -jnp.sum(obj)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chunk(theta, o, k, n):
        def body(carry, _):
            theta, o, k = carry
            k, k_i = jax.random.split(k)
            loss, grads = jax.value_and_grad(loss_fn)(theta, k_i)
            updates, o = opt.update(grads, o)
            theta = theta + updates
            return (theta, o, k), loss

        (theta, o, k), losses = jax.lax.scan(body, (theta, o, k), None, length=n)
        return theta, o, k, losses

    chunk = num_steps if chunk_size is None else max(int(chunk_size), 1)
    theta, losses, done = theta0, [], 0
    while done < num_steps:
        n = min(chunk, num_steps - done)
        theta, opt_state, k_loop, chunk_losses = run_chunk(theta, opt_state, k_loop, n)
        losses.append(chunk_losses)
        done += n

    return MLEResult(theta, jnp.concatenate(losses), ctx)
