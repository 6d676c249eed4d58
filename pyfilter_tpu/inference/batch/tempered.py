"""Density-tempered SMC — batch posterior sampling by likelihood annealing
(Duan & Fulop 2015's density-tempered marginalized SMC; Del Moral, Doucet &
Jasra 2006 SMC samplers with an adaptive temperature ladder).

New capability beyond the reference (whose batch algorithm is PMMH,
pyfilter/inference/batch/mcmc/pmmh.py): a population of K parameter particles
is transported from the prior to the posterior through the bridge
:math:`\\pi_\\lambda(\\theta) \\propto p(\\theta)\\, \\hat p(y|\\theta)^\\lambda`,
with the temperature increments chosen ADAPTIVELY so each stage's incremental
weights keep a target ESS, and the swarm refreshed by random-walk MH moves
against the tempered target. Complements the data-tempered SMC2 (one
observation at a time) with a likelihood-tempered ladder — typically far
fewer re-filters on long series — and yields the model log-evidence for free
(the summed log-mean incremental weights).

With an exact filter likelihood (Kalman/EKF/UKF builders) this is an exact
SMC sampler; with a particle-filter likelihood it is the standard
density-tempered *marginalized* construction (the PF estimate rides as a
pseudo-marginal, refreshed together with θ on MH accepts).

TPU mapping: every stage is lane-vectorized — one ``batch_filter`` over K
lanes per MH move (the same compiled executable every stage; λ rides in as a
device scalar), host work is only the scalar bisection for the next λ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...resampling import systematic, systematic_m
from ...utils import normalize
from .. import prior as prior_ops
from ..base import BaseAlgorithm
from ..logging import TQDMWrapper


def _host_ess(log_w: np.ndarray) -> float:
    w = log_w - log_w.max()
    p = np.exp(w)
    p = p / p.sum()
    return float(1.0 / np.square(p).sum())


def find_increment(loglik: np.ndarray, lam: float, target: float) -> float:
    """Largest Δλ ≤ 1-λ whose incremental weights ``Δλ·loglik`` keep
    ``ESS ≥ target·K`` (bisection on the host; Jasra et al.'s adaptive
    ladder)."""
    lo, hi = 0.0, 1.0 - lam
    k = loglik.shape[0]
    if _host_ess(hi * loglik) >= target * k:
        return hi
    for _ in range(50):
        mid = 0.5 * (lo + hi)
        if _host_ess(mid * loglik) >= target * k:
            lo = mid
        else:
            hi = mid
    return max(lo, 1e-6)


class TemperedSMCResult:
    """``samples[name]``: the final equal-weight swarm ``(K, *event)``
    (constrained); ``lambdas``: the adaptive temperature ladder (ends at 1);
    ``acceptance_rates``: per-stage MH acceptance; ``log_evidence``: the
    marginal-likelihood estimate ``Σ_s log mean_k exp(Δλ_s loglik_k)``."""

    def __init__(self, samples, lambdas, acceptance_rates, log_evidence):
        self.samples = samples
        self.lambdas = lambdas
        self.acceptance_rates = acceptance_rates
        self.log_evidence = float(log_evidence)


class TemperedSMC(BaseAlgorithm):
    """Adaptive density-tempered SMC over a model-builder filter.

    ``target_ess`` sets the per-stage incremental-weight ESS fraction (0.5 is
    the conventional choice); ``num_mh_steps`` random-walk MH refreshes run
    after every resample, with proposal covariance ``mh_scale² · Cov(swarm)``
    (``mh_scale=None`` → the 2.38/√D optimal-scaling default).

    ``waste_free=True`` (Dau & Chopin 2022, "Waste-free sequential Monte
    Carlo"): instead of moving all K particles and discarding every MH
    intermediate, each stage resamples ``K / (num_mh_steps + 1)`` chain
    ROOTS, runs ``num_mh_steps`` moves on those, and the next swarm is ALL
    chain states (roots + intermediates) — the same K-particle swarm from
    ``num_mh_steps + 1`` times fewer log-likelihood re-filters per stage,
    which is exactly the cost PERF.md shows dominating tempered wall-clock.
    Requires ``num_particles % (num_mh_steps + 1) == 0``.
    """

    def __init__(
        self,
        filter_,
        num_particles: int,
        target_ess: float = 0.5,
        num_mh_steps: int = 2,
        mh_scale: float = None,
        max_stages: int = 1000,
        resampler=systematic,
        waste_free: bool = False,
        context=None,
        key=None,
    ):
        super().__init__(filter_=filter_, context=context, key=key)
        self.num_particles = int(num_particles)
        self.target_ess = float(target_ess)
        self.num_mh_steps = int(num_mh_steps)
        self.mh_scale = mh_scale
        self.max_stages = int(max_stages)
        self._resampler = resampler
        self.waste_free = bool(waste_free)
        if self.waste_free:
            chain_len = self.num_mh_steps + 1
            if self.num_particles % chain_len:
                raise ValueError(
                    f"waste_free needs num_particles ({self.num_particles}) "
                    f"divisible by num_mh_steps + 1 ({chain_len})"
                )
            # the move step acts on the M roots only — the filter and context
            # are laned at M, the swarm statistics still use all K states
            self._n_roots = self.num_particles // chain_len

        self.context.set_batch_shape((self.num_particles,))
        self._filter = self._filter.set_batch_shape((self.num_particles,))

    def fit(self, y, logging=None) -> TemperedSMCResult:
        y = jnp.asarray(y)
        ctx = self.context
        ctx.set_key(self._next_key())
        self._filter = self._filter.initialize_model(ctx)
        ctx.initialize_parameters()
        filt = self._filter.initialize_model(ctx)
        resampler = self._resampler

        theta = ctx.stack_parameters(constrained=False)  # (K, D)
        d = theta.shape[1]
        scale = self.mh_scale if self.mh_scale is not None else 2.38 / np.sqrt(d)

        if self.waste_free:
            # the MH chains act on the M roots only: separate M-laned
            # context/filter views so re-filters run M lanes, not K
            m_roots = self._n_roots
            ctx_m = ctx._clone_registry()
            ctx_m.batch_shape = (m_roots,)
            filt_m = self._filter.set_batch_shape((m_roots,))
        else:
            m_roots, ctx_m, filt_m = self.num_particles, ctx, self._filter

        def _lane_logliks(ctx_b, filt_b):
            def f(key, theta_b):
                ctx2 = ctx_b.unstack_parameters(theta_b, constrained=False)
                f2 = filt_b.initialize_model(ctx2)
                res = f2.batch_filter(key, y, use_jit=False)
                return res.log_likelihood, ctx2.eval_priors(constrained=False)

            return f

        lane_logliks = jax.jit(_lane_logliks(ctx, filt))
        move_logliks = jax.jit(_lane_logliks(ctx_m, filt_m))

        @functools.partial(jax.jit, static_argnames=("steps", "collect"))
        def mh_refresh(key, theta, loglik, logprior, chol, lam, steps: int, collect: bool):
            def body(carry, k):
                theta, loglik, logprior = carry
                k_prop, k_ll, k_acc = jax.random.split(k, 3)
                eps = jax.random.normal(k_prop, theta.shape, theta.dtype)
                theta_star = theta + scale * eps @ chol.T
                ll_star, lp_star = move_logliks(k_ll, theta_star)
                log_acc = lam * (ll_star - loglik) + (lp_star - logprior)
                accept = jnp.log(jax.random.uniform(k_acc, (theta.shape[0],))) < log_acc
                theta = jnp.where(accept[:, None], theta_star, theta)
                loglik = jnp.where(accept, ll_star, loglik)
                logprior = jnp.where(accept, lp_star, logprior)
                out = ((theta, loglik, logprior), accept.mean()) if collect else accept.mean()
                return (theta, loglik, logprior), out

            carry, outs = jax.lax.scan(
                body, (theta, loglik, logprior), jax.random.split(key, steps)
            )
            if collect:
                chain, rates = outs
                # waste-free swarm: roots + every intermediate, (L, M, ...)
                swarm = jax.tree_util.tree_map(
                    lambda root, steps_arr: jnp.concatenate(
                        [root[None], steps_arr], axis=0
                    ).reshape((-1,) + root.shape[1:]),
                    (theta, loglik, logprior),
                    chain,
                )
                return swarm + (rates.mean(),)
            theta, loglik, logprior = carry
            return theta, loglik, logprior, outs.mean()

        @jax.jit
        def swarm_chol(theta):
            # proposal covariance from the full K swarm (equal weights: the
            # waste-free swarm and the post-resample standard swarm both are)
            centered = theta - theta.mean(axis=0)
            cov = centered.T @ centered / (theta.shape[0] - 1)
            return jnp.linalg.cholesky(cov + 1e-8 * jnp.eye(d))

        loglik, logprior = lane_logliks(self._next_key(), theta)

        lam = 0.0
        lambdas, rates = [], []
        log_evidence = 0.0
        logger = logging if logging is not None else TQDMWrapper()
        with logger.initialize(self, self.max_stages):
            for stage in range(self.max_stages):
                ll_np = np.asarray(loglik, np.float64)
                ll_np = np.where(np.isfinite(ll_np), ll_np, -1e300)
                dlam = find_increment(ll_np, lam, self.target_ess)
                lam = min(lam + dlam, 1.0)
                lambdas.append(lam)

                inc = dlam * ll_np
                m = inc.max()
                log_evidence += m + np.log(np.mean(np.exp(inc - m)))

                chol = swarm_chol(theta)
                probs = normalize(jnp.asarray(dlam) * loglik)
                if self.waste_free:
                    # resample only the chain roots; the refresh returns the
                    # FULL waste-free swarm (roots + all MH intermediates)
                    indices = systematic_m(
                        self._next_key(), probs, self._n_roots, normalized=True
                    )
                else:
                    indices = resampler(self._next_key(), probs, normalized=True)
                theta = jnp.take(theta, indices, axis=0)
                loglik = jnp.take(loglik, indices, axis=0)
                logprior = jnp.take(logprior, indices, axis=0)

                theta, loglik, logprior, rate = mh_refresh(
                    self._next_key(), theta, loglik, logprior, chol,
                    jnp.asarray(lam, theta.dtype),
                    steps=self.num_mh_steps,
                    collect=self.waste_free,
                )
                rates.append(float(rate))
                logger.do_log(stage + 1, None)
                if lam >= 1.0:
                    break
        if lam < 1.0:
            # a truncated ladder targets the wrong distribution — refuse to
            # hand back prior-flavored samples dressed up as the posterior
            raise RuntimeError(
                f"temperature ladder stalled at lambda={lam:.4g} after "
                f"{self.max_stages} stages (the swarm still targets the "
                "partially-tempered bridge, not the posterior) — raise "
                "max_stages, increase num_particles, or lower target_ess"
            )

        samples = {}
        index = 0
        for name in ctx.parameters:
            shape = ctx.get_shape(name, constrained=False)
            numel = int(np.prod(shape, dtype=np.int64)) if shape else 1
            block = theta[:, index : index + numel].reshape((theta.shape[0],) + shape)
            samples[name] = np.asarray(
                prior_ops.get_constrained(ctx.get_prior(name), block)
            )
            index += numel

        ctx.absorb(ctx.unstack_parameters(theta, constrained=False))
        return TemperedSMCResult(samples, np.asarray(lambdas), np.asarray(rates), log_evidence)
