"""MCMC proposal builders for PMMH-type updates.

Re-design of the reference's ``pyfilter/inference/batch/mcmc/proposals/``:
``RandomWalk`` (random_walk.py), ``SymmetricMH`` (symmetric_mh.py) and
``GradientBasedProposal`` (gradient.py — MALA-style, here with ``jax.grad``
through the rebuilt model instead of torch autograd on in-place parameters).
Proposal kernels are built on the *unconstrained* parameter space.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ....distributions import MultivariateNormal, Normal, robust_cholesky
from ....timeseries import TimeseriesState
from ...context import QuasiInferenceContext
from ...utils import construct_mvn


class BaseProposal:
    """Builds candidate kernels :math:`q(\\theta^* | \\theta)`
    (reference proposals/base.py)."""

    #: True when ``build``/``exchange`` are pure jnp functions of the context
    #: values and lane weights, so the whole PMMH transition can run as one
    #: compiled call (utils._run_pmmh_masked_core). Proposals that need host
    #: state or recorded filter histories must set this False.
    jit_compatible = True

    #: True when ``build`` on a quasi context yields an engine-sampled kernel
    #: (QuasiMultivariateNormal) — tells the fused rejuvenation to pre-draw
    #: the Sobol uniforms host-side (sequential.kernels.mh).
    uses_quasi_engine = False

    # Proposals ride through jit as STATIC arguments, so equality must be
    # structural: every fit builds a fresh proposal instance, and identity
    # hashing would force a full recompile of the fused PMMH transition per
    # run (~16 s measured for the SMC2 flagship).
    def _config(self):
        return tuple(sorted(self.__dict__.items()))

    def __eq__(self, other):
        return type(self) is type(other) and self._config() == other._config()

    def __hash__(self):
        return hash((type(self), self._config()))

    def build(self, context, state, filter_, y, key=None):
        raise NotImplementedError

    def exchange(self, latest, candidate, mask):
        """Return a kernel whose lanes where ``mask`` take ``candidate``'s
        parameters (pure version of reference random_walk.py:34-36)."""
        raise NotImplementedError


class RandomWalk(BaseProposal):
    r"""Independent-Normal random walk on the unconstrained parameters,
    ``scale`` defaults to 1e-2 (reference random_walk.py)."""

    def __init__(self, scale: float = 1e-2):
        self._scale = scale

    @property
    def scale(self):
        return self._scale

    def build(self, context, state, filter_, y, key=None):
        loc = context.stack_parameters(constrained=False)
        # scale broadcast to loc's shape up front: ``exchange`` produces a
        # per-lane scale, and a scan-carried kernel (the fused PMMH chain,
        # utils._pmmh_chain_scan) needs build/exchange outputs shape-stable
        scale = jnp.broadcast_to(jnp.asarray(self._scale, loc.dtype), loc.shape)
        return Normal(loc, scale).to_event(1)

    def exchange(self, latest, candidate, mask):
        m = mask[..., None]
        loc = jnp.where(m, candidate.base_dist.loc, latest.base_dist.loc)
        scale = jnp.where(m, candidate.base_dist.scale, latest.base_dist.scale)
        return Normal(loc, scale).to_event(1)


class SymmetricMH(BaseProposal):
    """Weighted-particle MVN scaled by 1.1, QMC-aware — the SMC2 rejuvenation
    proposal (reference symmetric_mh.py)."""

    uses_quasi_engine = True

    def build(self, context, state, filter_, y, key=None):
        values = context.stack_parameters(constrained=False)
        weights = state.normalized_weights()
        return construct_mvn(
            values,
            weights,
            scale=1.1,
            quasi_engine=context.quasi_engine
            if isinstance(context, QuasiInferenceContext)
            else None,
        )

    def exchange(self, latest, candidate, mask):
        return latest


class _AdaptiveRWKernel(NamedTuple):
    """Pytree kernel for :class:`AdaptiveRandomWalk`: the current chain
    position plus Welford running moments of the whole chain — the running
    state IS the kernel, so adaptation rides the fused chain scan's carry
    with no host round-trips."""

    loc: jax.Array         # (K, D) current chain position
    scale_tril: jax.Array  # (K, D, D) proposal Cholesky
    mean: jax.Array        # (K, D) running per-chain sample mean
    m2: jax.Array          # (K, D, D) running per-chain scatter matrix
    count: jax.Array       # scalar: transitions absorbed so far

    @property
    def batch_shape(self):
        return self.loc.shape[:-1]

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.loc.shape
        eps = jax.random.normal(key, shape, jnp.asarray(self.loc).dtype)
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)

    def log_prob(self, value):
        # the kernel is symmetric within a step (one shared covariance for
        # both directions), so the Hastings correction cancels identically —
        # report 0 and the transition's diff_prop vanishes exactly.
        value = jnp.asarray(value)
        shape = jnp.broadcast_shapes(value.shape[:-1], self.batch_shape)
        return jnp.zeros(shape, value.dtype)


class AdaptiveRandomWalk(BaseProposal):
    r"""Haario et al. (2001) adaptive-Metropolis random walk: the proposal
    covariance is the running empirical covariance of the chain itself,
    scaled by the optimal :math:`2.38^2/D`,

    .. math:: \theta^* \sim N(\theta_n,\ 2.38^2/D\, \widehat{\mathrm{Cov}}
              (\theta_{1:n}) + \epsilon I).

    The running moments live INSIDE the kernel pytree
    (:class:`_AdaptiveRWKernel`), updated by ``exchange`` every transition —
    Welford's recursion, one rank-1 update + a ``(K, D, D)`` Cholesky per
    step — so adaptive PMMH rides the fused chain scan unmodified
    (utils._pmmh_chain_scan) and both paths stay bit-identical.

    Adaptation starts once ``2 D`` transitions have accumulated (before that
    the kernel is the isotropic ``initial_scale`` walk) and — when
    ``adapt_until`` is set — FREEZES after that many transitions, so the
    post-freeze samples are exact Metropolis draws (the default ``None``
    adapts forever under the standard diminishing-adaptation argument: the
    1/n moment updates vanish).

    No reference counterpart (the reference ships RandomWalk with a fixed
    scalar scale, proposals/random_walk.py) — this removes its one tuning
    knob and handles correlated posteriors the isotropic walk cannot.
    """

    def __init__(
        self,
        initial_scale: float = 1e-2,
        adapt_until: int | None = None,
        eps: float = 1e-6,
    ):
        self._scale0 = float(initial_scale)
        self._adapt_until = None if adapt_until is None else int(adapt_until)
        self._eps = float(eps)

    def build(self, context, state, filter_, y, key=None):
        loc = context.stack_parameters(constrained=False)  # (K, D)
        d = loc.shape[-1]
        tril0 = jnp.broadcast_to(
            self._scale0 * jnp.eye(d, dtype=loc.dtype), loc.shape + (d,)
        )
        return _AdaptiveRWKernel(
            loc=loc,
            scale_tril=tril0,
            mean=loc,
            m2=jnp.zeros(loc.shape + (d,), loc.dtype),
            count=jnp.asarray(0.0, loc.dtype),
        )

    def exchange(self, latest, candidate, mask):
        # new chain position (accepted lanes take the candidate)
        x = jnp.where(mask[..., None], candidate.loc, latest.loc)
        d = x.shape[-1]

        # Welford moment update with the new position
        n1 = latest.count + 1.0
        delta = x - latest.mean
        mean = latest.mean + delta / n1
        m2 = latest.m2 + jnp.einsum("...i,...j->...ij", delta, x - mean)

        lam = 2.38**2 / d
        cov = lam * m2 / jnp.maximum(n1 - 1.0, 1.0) + self._eps * jnp.eye(d, dtype=x.dtype)
        tril_new = robust_cholesky(cov)

        adapting = n1 >= 2.0 * d
        if self._adapt_until is not None:
            adapting = adapting & (n1 <= float(self._adapt_until))
        tril = jnp.where(adapting, tril_new, latest.scale_tril)
        return _AdaptiveRWKernel(x, tril, mean, m2, n1)


class GradientBasedProposal(RandomWalk):
    r"""MALA-style proposal: :math:`\theta^* \sim N(\theta + \epsilon \nabla S(\theta), \sigma)`
    with :math:`S` the FFBS-smoothed joint log-likelihood plus log-prior
    (reference gradient.py). Requires the filter to record states.

    ``use_second_order=True`` (left ``NotImplementedError`` in the reference,
    gradient.py:59-60) upgrades to the simplified-manifold variant: per-lane
    damped negative Hessians :math:`H` of :math:`S` precondition both the
    drift and the noise, :math:`\theta^* \sim N(\theta + \epsilon H^{-1}
    \nabla S, \sigma^2 H^{-1})` — run_pmmh's kernel rebuild on the candidate
    side supplies the asymmetric-density MH correction either way."""

    # build is pure jnp + jax.grad over the recorded state history, so
    # gradient-PMMH rides the fused chain scan — PROVIDED the traced filter
    # result carries that history (record_states=True: batch PMMH's
    # FilterResult does in-trace). The tiers that strip recorded state
    # (SMC2's masked re-filter) already exclude state-recording filters, so
    # they can never reach this proposal's build with the history missing.
    jit_compatible = True

    def __init__(self, scale: float = 1e-2, use_second_order: bool = False):
        super().__init__(scale=scale)
        self._eps = scale**2.0 / 2.0
        self._use_second_order = bool(use_second_order)

    def build(self, context, state, filter_, y, key=None):
        result = state.filter_state
        if getattr(result, "states", None) is None:
            raise ValueError(
                "GradientBasedProposal requires record_states=True on the filter"
            )

        if key is None:
            key = jax.random.PRNGKey(0)
        smoothed = filter_.smooth(key, result, method="ffbs")
        times = result.states.time_indexes
        ev = filter_.model.hidden.event_ndim

        y = jnp.asarray(y)
        y_event_ndim = len(filter_.model.event_shape)
        obs_batch_extra = smoothed.ndim - 1 - ev
        y_shaped = y.reshape(
            y.shape[:1] + (1,) * obs_batch_extra + y.shape[1 : 1 + y_event_ndim]
        )

        # time axis broadcasts against the trajectory/lane axes — NOT aligned
        # with them (time-inhomogeneous models read x.time_index in mean_scale)
        t_shaped = jnp.reshape(times, times.shape[:1] + (1,) * (smoothed.ndim - 1 - ev))

        def joint(vec):
            ctx2 = context.unstack_parameters(vec, constrained=False)
            filt2 = filter_.initialize_model(ctx2)
            model = filt2.model

            x_tm1 = TimeseriesState(t_shaped[:-1], smoothed[:-1], ev)
            x_t = TimeseriesState(t_shaped[1:], smoothed[1:], ev)

            hidden_ll = jnp.sum(model.hidden.build_density(x_tm1).log_prob(smoothed[1:]), axis=0)
            obs_ll = jnp.sum(model.build_density(x_t).log_prob(y_shaped), axis=0)
            init_ll = model.hidden.initial_distribution().log_prob(smoothed[0])

            per_lane = jnp.mean(hidden_ll + obs_ll + init_ll, axis=0)  # over trajectories
            return jnp.sum(per_lane + ctx2.eval_priors(constrained=False))

        vec = context.stack_parameters(constrained=False)
        grad = jax.grad(joint)(vec)

        if not self._use_second_order:
            loc = vec + self._eps * grad
            scale = jnp.broadcast_to(jnp.asarray(self._scale, loc.dtype), loc.shape)
            return Normal(loc, scale).to_event(1)

        # simplified-manifold MALA: joint() sums independent lanes, so the
        # full Hessian is lane-block-diagonal — extract the (K, D, D) blocks
        hess = jax.jacfwd(jax.grad(joint))(vec)  # (K, D, K, D)
        blocks = jnp.moveaxis(jnp.diagonal(hess, axis1=0, axis2=2), -1, 0)  # (K, D, D)
        neg_h = -0.5 * (blocks + jnp.swapaxes(blocks, -1, -2))  # symmetrize

        # damp to PD the way the mode-finder does (proposals/utils.py):
        # eigenvalues clipped from below at a fraction of the spectral radius
        evals, evecs = jnp.linalg.eigh(neg_h)
        floor = 1e-3 * jnp.maximum(jnp.max(jnp.abs(evals), axis=-1, keepdims=True), 1e-6)
        evals = jnp.maximum(evals, floor)
        h_inv = jnp.einsum("...ij,...j,...kj->...ik", evecs, 1.0 / evals, evecs)

        loc = vec + self._eps * jnp.einsum("...ij,...j->...i", h_inv, grad)
        cov = (self._scale**2.0) * h_inv
        return MultivariateNormal(loc, scale_tril=robust_cholesky(cov))

    def exchange(self, latest, candidate, mask):
        if not self._use_second_order:
            return super().exchange(latest, candidate, mask)
        loc = jnp.where(mask[..., None], candidate.loc, latest.loc)
        tril = jnp.where(mask[..., None, None], candidate.scale_tril, latest.scale_tril)
        return MultivariateNormal(loc, scale_tril=tril)
