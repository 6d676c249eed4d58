"""Storvik filter — online parameter learning via sufficient statistics.

Storvik (2002, "Particle filters for state-space models with the presence of
unknown static parameters") / particle learning (Carvalho, Johannes, Lopes &
Polson 2010): when the parameter posterior given the state path,
``p(θ | x_{0:t}, y_{1:t})``, lies in a conjugate family indexed by a
fixed-dimension sufficient statistic ``s_t``, each particle carries its own
statistic and the filter

1. draws ``θ^i ~ p(θ | s_{t-1}^i)`` fresh EVERY step (no jittering, no decay
   knob — the draw is from the exact conditional posterior),
2. propagates ``x_t^i ~ f(· | x_{t-1}^i, θ^i)`` and weights by
   ``g(y_t | x_t^i, θ^i)``,
3. updates ``s_t^i = S(s_{t-1}^i, x_{t-1}^i, x_t^i, y_t)`` and resamples
   particles TOGETHER WITH their statistics.

This is the exact-conditional counterpart of the jitter-based online family
(NESS/SMC2, reference pyfilter/inference/sequential/ness.py): where those
perturb parameter particles artificially to fight degeneracy, the Storvik
filter regenerates them from their own exact posterior — zero jittering bias
— at the price of requiring conjugacy.

TPU mapping: one ``lax.scan`` over time; every step is a vectorized
conjugate draw (per-particle 2x2 solves + gamma sampling), the model's own
batched ``propagate``/``build_density``, and one resample — all static
shapes, no host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...resampling import systematic
from ...timeseries import LinearStateSpaceModel, TimeseriesState, models
from ...utils import get_ess, normalize


class StorvikResult(NamedTuple):
    """``param_means``: per-step posterior means of the learned parameters
    (time-major pytree — the ONLINE parameter-learning trajectory);
    ``stats``: final per-particle sufficient statistics; ``values`` /
    ``log_weights``: the final particle cloud; ``log_likelihood``: the
    running marginal-likelihood estimate; ``ess``: per-step ESS."""

    param_means: object
    stats: object
    values: jax.Array
    log_weights: jax.Array
    log_likelihood: jax.Array
    ess: jax.Array


class NIGAutoregression:
    r"""Normal-inverse-gamma conjugate block for an AR(1) hidden process with
    unknown ``(alpha, beta, sigma^2)`` and a KNOWN linear-Gaussian
    observation ``y = a x + s v``.

    Prior: :math:`\sigma^2 \sim IG(a_0, b_0)`,
    :math:`(\alpha, \beta) | \sigma^2 \sim N(m_0, \sigma^2 V_0)` — conjugate
    to the transition regression ``x_t = [1, x_{t-1}] \cdot (\alpha, \beta)
    + \sigma \epsilon``. The sufficient statistic per particle is
    ``(Λ, η, ssq, n)`` with ``Λ = V_0^{-1} + Σ z z'``, ``η = V_0^{-1} m_0 +
    Σ z x_t``, ``ssq = Σ x_t^2`` — the standard Bayesian-linear-regression
    recursion, updated in O(1) per transition.
    """

    def __init__(self, obs_coeff=1.0, obs_scale=0.1, m0=(0.0, 0.0), v0=10.0, a0=2.0, b0=1.0):
        self.obs_coeff = jnp.asarray(obs_coeff, jnp.float32)
        self.obs_scale = jnp.asarray(obs_scale, jnp.float32)
        self.m0 = jnp.asarray(m0, jnp.float32)
        v0 = jnp.asarray(v0, jnp.float32)
        self.v0 = v0 * jnp.eye(2) if v0.ndim == 0 else v0
        self.a0 = float(a0)
        self.b0 = float(b0)
        self._lam0 = jnp.linalg.inv(self.v0)
        self._eta0 = self._lam0 @ self.m0
        self._quad0 = float(self.m0 @ self._eta0)

    # -- sufficient statistics ------------------------------------------------
    def initial_stats(self, n_particles: int):
        return (
            jnp.broadcast_to(self._lam0, (n_particles, 2, 2)),
            jnp.broadcast_to(self._eta0, (n_particles, 2)),
            jnp.zeros((n_particles,)),
            jnp.zeros((n_particles,)),
        )

    def update_stats(self, stats, x_prev, x_new, y_t):
        lam, eta, ssq, n = stats
        z = jnp.stack([jnp.ones_like(x_prev), x_prev], axis=-1)  # (N, 2)
        lam = lam + jnp.einsum("...i,...j->...ij", z, z)
        eta = eta + z * x_new[..., None]
        return lam, eta, ssq + jnp.square(x_new), n + 1.0

    def _posterior(self, stats):
        lam, eta, ssq, n = stats
        chol = jnp.linalg.cholesky(lam)
        m = jax.scipy.linalg.cho_solve((chol, True), eta[..., None])[..., 0]  # (N, 2)
        a = self.a0 + 0.5 * n
        b = self.b0 + 0.5 * (self._quad0 + ssq - jnp.einsum("...i,...i->...", eta, m))
        return m, chol, a, jnp.maximum(b, 1e-8)

    def sample_params(self, key, stats):
        """One draw ``(alpha, beta, sigma) ~ p(θ | s)`` per particle."""
        m, chol, a, b = self._posterior(stats)
        k_sig, k_coef = jax.random.split(key)
        g = jax.random.gamma(k_sig, a)
        sigma2 = b / jnp.maximum(g, 1e-12)
        eps = jax.random.normal(k_coef, m.shape, m.dtype)
        # (alpha, beta) = m + sigma * L^{-T} eps  with  Λ = L L'
        coef = m + jnp.sqrt(sigma2)[..., None] * jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(chol, -1, -2), eps[..., None], lower=False
        )[..., 0]
        return coef[..., 0], coef[..., 1], jnp.sqrt(sigma2)

    def posterior_mean(self, stats):
        """Per-particle conditional-posterior means ``(E α, E β, E σ²)``."""
        m, _, a, b = self._posterior(stats)
        return m[..., 0], m[..., 1], b / jnp.maximum(a - 1.0, 1e-6)

    # -- model boundary ---------------------------------------------------------
    def build_model(self, theta) -> LinearStateSpaceModel:
        alpha, beta, sigma = theta
        return LinearStateSpaceModel(
            models.AR(alpha, beta, sigma), (self.obs_coeff, self.obs_scale)
        )


class StorvikFilter:
    """Sufficient-statistic online parameter learner over a conjugate block.

    ``conjugate`` supplies the five hooks (``initial_stats``,
    ``sample_params``, ``update_stats``, ``posterior_mean``,
    ``build_model``); :class:`NIGAutoregression` is the built-in
    Normal-inverse-gamma AR(1) block. Resampling fires on the standard
    relative-ESS gate (statistics travel with their particles).
    """

    def __init__(
        self,
        conjugate,
        n_particles: int,
        resampler=systematic,
        ess_threshold: float = 0.9,
    ):
        self.conjugate = conjugate
        self.n_particles = int(n_particles)
        self.resampler = resampler
        self.ess_threshold = float(ess_threshold)

    def fit(self, key, y) -> StorvikResult:
        """Run the full pass as one compiled ``lax.scan``."""
        return _jitted_storvik(self, key, jnp.asarray(y))

    # -- internals (traced) -----------------------------------------------------
    def _run(self, key, y):
        conj = self.conjugate
        n = self.n_particles
        k_init, k_theta0, k_scan = jax.random.split(key, 3)

        stats = conj.initial_stats(n)
        theta0 = conj.sample_params(k_theta0, stats)
        model0 = conj.build_model(theta0)
        x0 = model0.hidden.initial_sample(k_init)
        vals = jnp.asarray(x0.value)
        if vals.shape[:1] != (n,):  # scalar-parameter models broadcast here
            vals = jnp.broadcast_to(vals, (n,) + vals.shape[1:])
        lw = jnp.zeros((n,))
        ev = model0.hidden.event_ndim

        def step(carry, inp):
            vals, lw, stats, ll, t = carry
            y_t, k = inp
            k_theta, k_prop, k_res = jax.random.split(k, 3)

            # θ^i from each particle's exact conditional posterior
            theta = conj.sample_params(k_theta, stats)
            model = conj.build_model(theta)

            state = TimeseriesState(t, vals, ev)
            x_new = model.hidden.propagate(k_prop, state)
            w = model.build_density(x_new).log_prob(y_t)
            w_tot = lw + jnp.where(jnp.isnan(y_t).all(), 0.0, w)

            # marginal-likelihood increment (same estimator as the filters)
            probs_prev = normalize(lw)
            inc = jax.scipy.special.logsumexp(w_tot) - jax.scipy.special.logsumexp(lw)
            ll = ll + jnp.where(jnp.isnan(y_t).all(), 0.0, inc)

            stats = conj.update_stats(stats, vals, x_new.value, y_t)
            ess = get_ess(w_tot)

            def do_resample(op):
                vals_n, stats_n, w_n = op
                idx = self.resampler(k_res, w_n)
                take = lambda leaf: jnp.take(leaf, idx, axis=0)
                return (
                    take(vals_n),
                    jax.tree_util.tree_map(take, stats_n),
                    jnp.zeros_like(w_n),
                )

            vals2, stats2, lw2 = jax.lax.cond(
                ess < self.ess_threshold * n,
                do_resample,
                lambda op: op,
                (x_new.value, stats, w_tot),
            )

            probs = normalize(w_tot)
            means = jax.tree_util.tree_map(
                lambda leaf: jnp.sum(probs * leaf, axis=0), conj.posterior_mean(stats)
            )
            return (vals2, lw2, stats2, ll, x_new.time_index), (means, ess)

        keys = jax.random.split(k_scan, y.shape[0])
        (vals, lw, stats, ll, _), (means, ess) = jax.lax.scan(
            step, (vals, lw, stats, jnp.asarray(0.0), jnp.asarray(0.0)), (y, keys)
        )
        return StorvikResult(means, stats, vals, lw, ll, ess)


@jax.jit
def _jitted_storvik(filt, key, y):
    return filt._run(key, y)


def _storvik_flatten(f):
    return (f.conjugate,), (f.n_particles, f.resampler, f.ess_threshold)


def _storvik_unflatten(aux, children):
    obj = object.__new__(StorvikFilter)
    obj.conjugate = children[0]
    obj.n_particles, obj.resampler, obj.ess_threshold = aux
    return obj


def _nig_flatten(c):
    return (
        (c.obs_coeff, c.obs_scale, c.m0, c.v0, c._lam0, c._eta0),
        (c.a0, c.b0, c._quad0),
    )


def _nig_unflatten(aux, children):
    obj = object.__new__(NIGAutoregression)
    obj.obs_coeff, obj.obs_scale, obj.m0, obj.v0, obj._lam0, obj._eta0 = children
    obj.a0, obj.b0, obj._quad0 = aux
    return obj


jax.tree_util.register_pytree_node(StorvikFilter, _storvik_flatten, _storvik_unflatten)
jax.tree_util.register_pytree_node(NIGAutoregression, _nig_flatten, _nig_unflatten)
