"""IF2 — iterated filtering for maximum-likelihood estimation (Ionides,
Nguyen, Atchadé, Stoev & King 2015; the ``mif2`` algorithm of the pomp
ecosystem).

New capability beyond the reference (whose batch algorithms are Bayesian —
PMMH, pyfilter/inference/batch/mcmc/pmmh.py): a simulated-annealing swarm of
K parameter particles rides the filter's lane axis, each lane's parameters
perturbed by a random walk (on the unconstrained space) at EVERY observation
and the lanes resampled by their one-step likelihood contribution. Repeating
the pass with a geometrically cooled perturbation scale concentrates the
swarm at the maximum-likelihood estimate — no gradients, no MCMC, just the
same lane-vectorized filter the sequential algorithms use.

TPU mapping: one fit pass is ONE compiled ``lax.scan`` over the data (the
per-step perturb → model rebuild → filter move → systematic lane resample is
all traced; the context is a pytree, so rebuilding models from perturbed
parameters costs no recompile), and the cooled scale rides in as a device
argument so every iteration reuses the same executable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...resampling import systematic
from ...utils import normalize
from .. import prior as prior_ops
from ..logging import TQDMWrapper
from ..sequential.base import SequentialParticleAlgorithm


class IF2Result:
    """``theta_trace[name]``: per-iteration swarm means ``(M, *event)``
    (constrained); ``swarm[name]``: the final swarm ``(K, *event)``;
    ``mle[name]``: the final swarm mean; ``log_likelihoods``: ``(M,)``
    per-pass marginal log-likelihood estimates (at the *perturbed* models, so
    they are a noisy lower-bound-flavored trace — use them to monitor
    convergence, not as the exact likelihood at the MLE)."""

    def __init__(self, theta_trace, swarm, mle, log_likelihoods):
        self.theta_trace = theta_trace
        self.swarm = swarm
        self.mle = mle
        self.log_likelihoods = log_likelihoods


class IF2(SequentialParticleAlgorithm):
    """Iterated filtering over a model-builder filter.

    ``sigma`` is the initial random-walk scale on the UNCONSTRAINED parameter
    space (scalar or per-flat-parameter vector of length D); each of the
    ``num_iterations`` passes cools it by ``cooling``; ``sigma_init``
    multiplies the extra start-of-pass perturbation (the IF2 paper's
    initial-value jitter, keeping the swarm overdispersed between passes).
    """

    def __init__(
        self,
        filter_,
        num_particles: int,
        num_iterations: int = 30,
        sigma: float = 0.1,
        cooling: float = 0.9,
        sigma_init: float = 2.0,
        resampler=systematic,
        context=None,
        key=None,
    ):
        super().__init__(
            filter_, num_particles, context=context, key=key, record_moments=False
        )
        self.num_iterations = int(num_iterations)
        self.sigma = sigma
        self.cooling = float(cooling)
        self.sigma_init = float(sigma_init)
        self._resampler = resampler

    def fit(self, y, logging=None) -> IF2Result:
        y = jnp.asarray(y)
        state = self.initialize()  # registers priors; swarm ~ prior over (K,)
        ctx = self.context
        filt = self._filter
        resampler = self._resampler

        theta = ctx.stack_parameters(constrained=False)  # (K, D)
        sd0 = jnp.broadcast_to(
            jnp.asarray(self.sigma, theta.dtype), (theta.shape[1],)
        )
        sigma_init = self.sigma_init

        def move(k, theta, corr, y_t, sd, first_step):
            k_perturb, k_filter, k_resample = jax.random.split(k, 3)
            theta = theta + sd * jax.random.normal(k_perturb, theta.shape, theta.dtype)
            f_t = filt.initialize_model(ctx.unstack_parameters(theta, constrained=False))
            new = f_t.filter(k_filter, y_t, corr, first_step=first_step)
            inc = new.log_likelihood  # (K,) one-step lane contributions
            indices = resampler(k_resample, normalize(inc), normalized=True)
            theta = jnp.take(theta, indices, axis=0)
            new = new.resample(indices)
            # pass-level marginal loglik estimate: log mean_k exp(inc_k)
            ll_t = jax.scipy.special.logsumexp(inc) - jnp.log(1.0 * inc.shape[0])
            return theta, new, ll_t

        @jax.jit
        def one_pass(key, theta, sd):
            k_jit, k_cloud, k_first, k_scan = jax.random.split(key, 4)
            # start-of-pass overdispersion (the paper's initial-value jitter)
            theta = theta + sigma_init * sd * jax.random.normal(
                k_jit, theta.shape, theta.dtype
            )
            f0 = filt.initialize_model(ctx.unstack_parameters(theta, constrained=False))
            corr = f0.initialize(k_cloud)
            theta, corr, ll0 = move(k_first, theta, corr, y[0], sd, True)

            def body(carry, inp):
                theta, corr = carry
                k, y_t = inp
                theta, corr, ll_t = move(k, theta, corr, y_t, sd, False)
                return (theta, corr), ll_t

            keys = jax.random.split(k_scan, y.shape[0] - 1)
            (theta, corr), lls = jax.lax.scan(body, (theta, corr), (keys, y[1:]))
            return theta, ll0 + lls.sum(), theta.mean(axis=0)

        trace, lls = [], []
        logger = logging if logging is not None else TQDMWrapper()
        with logger.initialize(self, self.num_iterations):
            for m in range(self.num_iterations):
                sd = sd0 * (self.cooling**m)
                theta, ll, mean_m = one_pass(self._next_key(), theta, sd)
                trace.append(np.asarray(mean_m))
                lls.append(float(ll))
                logger.do_log(m + 1, None)

        trace = jnp.asarray(np.stack(trace))  # (M, D) unconstrained swarm means
        theta_trace, swarm, mle = {}, {}, {}
        index = 0
        for name in ctx.parameters:
            shape = ctx.get_shape(name, constrained=False)
            numel = int(np.prod(shape, dtype=np.int64)) if shape else 1
            prior = ctx.get_prior(name)
            tr = trace[:, index : index + numel].reshape((trace.shape[0],) + shape)
            sw = theta[:, index : index + numel].reshape((theta.shape[0],) + shape)
            theta_trace[name] = np.asarray(prior_ops.get_constrained(prior, tr))
            swarm[name] = np.asarray(prior_ops.get_constrained(prior, sw))
            mle[name] = swarm[name].mean(axis=0)
            index += numel

        # absorb the final swarm into the user-held context
        ctx.absorb(ctx.unstack_parameters(theta, constrained=False))
        return IF2Result(theta_trace, swarm, mle, np.asarray(lls))
