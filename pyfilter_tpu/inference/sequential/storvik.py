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


def _chol2x2(lam):
    """Closed-form Cholesky of a batched ``(..., 2, 2)`` SPD matrix, as the
    triple ``(l11, l21, l22)``.

    ``jnp.linalg.cholesky`` / ``cho_solve`` lower to general linalg
    custom-calls on TPU that dominate the whole Storvik pass at particle
    scale (xprof: two custom-calls were 22 s of a 25 s N=1e5/T=400 pass —
    PERF.md "Round-5 ledger"); the closed-form factor and solves below are
    pure elementwise VPU math over the particle axis.
    """
    a = lam[..., 0, 0]
    b = lam[..., 1, 0]
    c = lam[..., 1, 1]
    l11 = jnp.sqrt(a)
    l21 = b / l11
    l22 = jnp.sqrt(jnp.maximum(c - l21 * l21, 1e-30))
    return l11, l21, l22


def _cho_solve2x2(chol, rhs):
    """Solve ``L L' m = rhs`` for batched 2-vectors ``rhs`` given
    :func:`_chol2x2`'s factor triple."""
    l11, l21, l22 = chol
    z1 = rhs[..., 0] / l11
    z2 = (rhs[..., 1] - l21 * z1) / l22
    m2 = z2 / l22
    m1 = (z1 - l21 * m2) / l11
    return jnp.stack([m1, m2], axis=-1)


def _solve_upper2x2(chol, rhs):
    """Solve ``L' u = rhs`` (upper-triangular back-substitution) for batched
    2-vectors given :func:`_chol2x2`'s factor triple."""
    l11, l21, l22 = chol
    u2 = rhs[..., 1] / l22
    u1 = (rhs[..., 0] - l21 * u2) / l11
    return jnp.stack([u1, u2], axis=-1)


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
        chol = _chol2x2(lam)
        m = _cho_solve2x2(chol, eta)  # (N, 2)
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
        coef = m + jnp.sqrt(sigma2)[..., None] * _solve_upper2x2(chol, eps)
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


class NIGARUnknownObsVariance(NIGAutoregression):
    r"""AR(1) block learning the transition triple AND the observation
    variance: ``x_t = alpha + beta x_{t-1} + sigma eps``, ``y_t = a x_t +
    s v`` with unknown ``(alpha, beta, sigma^2, s^2)`` — the most common
    real-data need (the reference's notebooks all hand-tune the observation
    noise; here it is learned online).

    The observation variance is conditionally conjugate given the state
    path: ``s^2 | x_{0:t}, y_{1:t} ~ IG(c_0 + n_y/2, d_0 + \sum (y - a
    x)^2 / 2)`` (Carvalho, Johannes, Lopes & Polson 2010 particle learning),
    independent of the transition NIG block. Sufficient statistics gain
    ``(ssq_y, n_y)``; NaN observations update the transition statistics only.

    ``theta = (alpha, beta, sigma, s)``.
    """

    def __init__(self, obs_coeff=1.0, m0=(0.0, 0.0), v0=10.0, a0=2.0, b0=1.0,
                 c0: float = 2.0, d0: float = 0.1):
        super().__init__(obs_coeff=obs_coeff, obs_scale=1.0, m0=m0, v0=v0, a0=a0, b0=b0)
        self.c0 = float(c0)
        self.d0 = float(d0)

    def initial_stats(self, n_particles: int):
        return super().initial_stats(n_particles) + (
            jnp.zeros((n_particles,)),
            jnp.zeros((n_particles,)),
        )

    def update_stats(self, stats, x_prev, x_new, y_t):
        lam, eta, ssq, n = super().update_stats(stats[:4], x_prev, x_new, y_t)
        ssq_y, n_y = stats[4], stats[5]
        resid2 = jnp.square(jnp.squeeze(jnp.asarray(y_t)) - self.obs_coeff * x_new)
        finite = jnp.isfinite(jnp.asarray(y_t)).all()
        ssq_y = ssq_y + jnp.where(finite, resid2, 0.0)
        n_y = n_y + jnp.where(finite, 1.0, 0.0)
        return lam, eta, ssq, n, ssq_y, n_y

    def _obs_posterior(self, stats):
        ssq_y, n_y = stats[4], stats[5]
        return self.c0 + 0.5 * n_y, jnp.maximum(self.d0 + 0.5 * ssq_y, 1e-8)

    def sample_params(self, key, stats):
        k_trans, k_obs = jax.random.split(key)
        alpha, beta, sigma = super().sample_params(k_trans, stats[:4])
        c, d = self._obs_posterior(stats)
        g = jax.random.gamma(k_obs, c)
        s2 = d / jnp.maximum(g, 1e-12)
        return alpha, beta, sigma, jnp.sqrt(s2)

    def posterior_mean(self, stats):
        ea, eb, es2 = super().posterior_mean(stats[:4])
        c, d = self._obs_posterior(stats)
        return ea, eb, es2, d / jnp.maximum(c - 1.0, 1e-6)

    def build_model(self, theta) -> LinearStateSpaceModel:
        alpha, beta, sigma, s = theta
        return LinearStateSpaceModel(
            models.AR(alpha, beta, sigma), (self.obs_coeff, s)
        )


def _poisson_log_intensity_obs(x, lam):
    from ...distributions import Poisson

    return Poisson(lam * jnp.exp(x.value))


class PoissonGammaCounts:
    r"""Conjugate block for count observations over a KNOWN latent
    log-intensity process: ``y_t ~ Poisson(lambda * exp(x_t))`` with
    ``lambda ~ Gamma(a_0, b_0)``.

    Given the state path the intensity scale is exactly conjugate:
    ``lambda | x_{0:t}, y_{1:t} ~ Gamma(a_0 + \sum y_t, b_0 + \sum
    exp(x_t))`` — the sufficient statistic is two scalars per particle.
    Pairs with the count distributions the package ships
    (:class:`~pyfilter_tpu.distributions.Poisson`); NaN observations update
    nothing.

    ``hidden`` is any process pytree (e.g. ``models.AR(0, 0.9, 0.3)``) —
    its parameters are treated as known; compose with NESS/SMC2 jittering
    for the non-conjugate residue (see the Storvik-within-NESS recipe in
    the module docstring of :mod:`~pyfilter_tpu.inference.sequential.storvik`).
    """

    def __init__(self, hidden, a0: float = 2.0, b0: float = 1.0):
        self.hidden = hidden
        self.a0 = float(a0)
        self.b0 = float(b0)

    def initial_stats(self, n_particles: int):
        return (jnp.zeros((n_particles,)), jnp.zeros((n_particles,)))

    def update_stats(self, stats, x_prev, x_new, y_t):
        sum_y, sum_g = stats
        y = jnp.squeeze(jnp.asarray(y_t))
        finite = jnp.isfinite(y)
        return (
            sum_y + jnp.where(finite, y, 0.0),
            sum_g + jnp.where(finite, jnp.exp(x_new), 0.0),
        )

    def _posterior(self, stats):
        sum_y, sum_g = stats
        return self.a0 + sum_y, self.b0 + sum_g

    def sample_params(self, key, stats):
        a, b = self._posterior(stats)
        return (jax.random.gamma(key, a) / b,)

    def posterior_mean(self, stats):
        a, b = self._posterior(stats)
        return (a / b,)

    def build_model(self, theta):
        from ...timeseries import StateSpaceModel

        (lam,) = theta
        return StateSpaceModel(self.hidden, _poisson_log_intensity_obs, (lam,))


class NIGVectorAutoregression:
    r"""Normal-inverse-gamma block for a VECTOR AR(1) with per-row noise:
    ``x_t = b + A x_{t-1} + diag(sigma) eps``, observed through a KNOWN
    linear map ``y = B x + s v``.

    Each state row ``i`` is a Bayesian linear regression on the shared
    regressor ``z = [1, x_{t-1}]`` with its own NIG prior
    (:math:`\sigma_i^2 \sim IG(a_0, b_0)`, coefficient row
    :math:`\sim N(m_0^i, \sigma_i^2 V_0)`) — the rows share one ``(p, p)``
    precision recursion (``p = d + 1``) because the regressor is common, so
    the per-particle update is one rank-1 update plus d inner products.

    ``theta = (A (N, d, d), b (N, d), sigma (N, d))``.
    """

    def __init__(self, dim: int, obs_coeff=None, obs_scale=0.1, v0: float = 10.0,
                 a0: float = 2.0, b0: float = 0.5, initial_scale: float = 1.0):
        self.dim = int(dim)
        p = self.dim + 1
        self.obs_coeff = (
            jnp.eye(self.dim) if obs_coeff is None else jnp.asarray(obs_coeff, jnp.float32)
        )
        self.obs_scale = jnp.asarray(obs_scale, jnp.float32)
        self.a0 = float(a0)
        self.b0 = float(b0)
        self.initial_scale = float(initial_scale)
        self._lam0 = jnp.eye(p) / float(v0)  # shared row prior precision

    def initial_stats(self, n_particles: int):
        d, p = self.dim, self.dim + 1
        return (
            jnp.broadcast_to(self._lam0, (n_particles, p, p)),
            jnp.zeros((n_particles, d, p)),  # prior mean 0: eta0 = 0
            jnp.zeros((n_particles, d)),
            jnp.zeros((n_particles,)),
        )

    def update_stats(self, stats, x_prev, x_new, y_t):
        lam, eta, ssq, n = stats
        z = jnp.concatenate([jnp.ones_like(x_prev[..., :1]), x_prev], axis=-1)  # (N, p)
        lam = lam + jnp.einsum("...i,...j->...ij", z, z)
        eta = eta + jnp.einsum("...d,...p->...dp", x_new, z)
        return lam, eta, ssq + jnp.square(x_new), n + 1.0

    def _posterior(self, stats):
        lam, eta, ssq, n = stats
        chol = jnp.linalg.cholesky(lam)
        m = jax.scipy.linalg.cho_solve((chol, True), jnp.swapaxes(eta, -1, -2))
        m = jnp.swapaxes(m, -1, -2)  # (N, d, p) posterior row means
        a = self.a0 + 0.5 * n
        b = self.b0 + 0.5 * (ssq - jnp.einsum("...dp,...dp->...d", eta, m))
        return m, chol, a, jnp.maximum(b, 1e-8)

    def sample_params(self, key, stats):
        m, chol, a, b = self._posterior(stats)
        k_sig, k_coef = jax.random.split(key)
        g = jax.random.gamma(k_sig, jnp.broadcast_to(a[..., None], b.shape))
        sigma2 = b / jnp.maximum(g, 1e-12)  # (N, d)
        eps = jax.random.normal(k_coef, m.shape, m.dtype)  # (N, d, p)
        # all d rows share the regressor precision: one multi-RHS solve
        solved = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(chol, -1, -2), jnp.swapaxes(eps, -1, -2), lower=False
        )  # (N, p, d)
        coef = m + jnp.sqrt(sigma2)[..., None] * jnp.swapaxes(solved, -1, -2)
        return coef[..., 1:], coef[..., 0], jnp.sqrt(sigma2)  # A, b, sigma

    def posterior_mean(self, stats):
        m, _, a, b = self._posterior(stats)
        return m[..., 1:], m[..., 0], b / jnp.maximum(a - 1.0, 1e-6)[..., None]

    def build_model(self, theta) -> LinearStateSpaceModel:
        from ...distributions import Normal
        from ...timeseries import LinearModel

        a_mat, offset, sigma = theta
        d = self.dim
        scale0 = self.initial_scale

        hidden = LinearModel(
            (a_mat, offset, sigma),
            Normal(jnp.zeros(d), jnp.ones(d)).to_event(1),
            lambda *_: Normal(jnp.zeros(d), scale0 * jnp.ones(d)).to_event(1),
            event_ndim=1,
        )
        return LinearStateSpaceModel(
            hidden, (self.obs_coeff, self.obs_scale),
            event_shape=(self.obs_coeff.shape[0],),
        )


class StorvikFilter:
    """Sufficient-statistic online parameter learner over a conjugate block.

    ``conjugate`` supplies the five hooks (``initial_stats``,
    ``sample_params``, ``update_stats``, ``posterior_mean``,
    ``build_model``). Built-in blocks: :class:`NIGAutoregression` (AR(1),
    known observation noise), :class:`NIGARUnknownObsVariance` (AR(1) +
    learned observation variance), :class:`PoissonGammaCounts` (count
    observations over a known log-intensity process), and
    :class:`NIGVectorAutoregression` (vector AR(1), per-row NIG).
    Resampling fires on the standard relative-ESS gate (statistics travel
    with their particles).

    **Storvik-within-NESS recipe** (conjugate block + non-conjugate
    residue): run :class:`~pyfilter_tpu.inference.NESS` over the
    NON-conjugate parameters only, with a model builder that closes over a
    ``StorvikFilter`` whose conjugate block handles the rest — i.e. jitter
    the parameters that have no sufficient statistics and regenerate the
    conjugate ones exactly. In practice: give NESS a builder registering
    the non-conjugate priors, and inside the builder construct the model
    from BOTH the context parameters and ``conjugate.sample_params`` draws
    keyed per step. The package keeps these layers orthogonal rather than
    hiding the composition behind one class: the jittered parameters ride
    the inference context (kernels/jittering.py), the conjugate ones ride
    the particle statistics here, and the two meet only in the model
    builder — see tests/test_storvik.py for the pattern.
    """

    def __init__(
        self,
        conjugate,
        n_particles: int,
        resampler=systematic,
        ess_threshold: float = 0.9,
        fused_resample: bool | None = None,
    ):
        self.conjugate = conjugate
        self.n_particles = int(n_particles)
        self.resampler = resampler
        self.ess_threshold = float(ess_threshold)
        self.fused_resample = fused_resample

    def _use_fused_resample(self) -> bool:
        """Trace-time gate mirroring ``ParticleFilter._use_fused_resample``:
        the resample fire (indices + a gather of the state AND every
        sufficient-statistic leaf) goes through the fused Pallas expansion
        kernel (ops/expand.py) on TPU at particle scale. Bit-identical
        ancestor law (same scalar ``u`` from the same key; the kernel is
        bit-exact-tested against the search-based systematic). The fire was
        the dominant Storvik cost once the 2x2 linalg was closed-formed —
        xprof put 2.08 s of the 3.87 s N=1e5/T=400 pass in the resample
        conditional, and the fused route took the whole pass to 0.554 s
        (the cond-guarded multi-gather had also blocked XLA fusion across
        the step body; PERF.md "Round-5 ledger")."""
        if self.fused_resample is not None:
            return bool(self.fused_resample)
        return (
            jax.default_backend() == "tpu"
            and self.n_particles >= 16384
            and self.resampler is systematic
        )

    def fit(self, key, y) -> StorvikResult:
        """Run the full pass as one compiled ``lax.scan``."""
        return _jitted_storvik(self, key, jnp.asarray(y))

    # -- internals (traced) -----------------------------------------------------
    def _run(self, key, y):
        conj = self.conjugate
        n = self.n_particles
        use_fused = self._use_fused_resample()
        k_init, k_theta0, k_scan = jax.random.split(key, 3)

        stats = conj.initial_stats(n)
        theta0 = conj.sample_params(k_theta0, stats)
        model0 = conj.build_model(theta0)
        x0 = model0.hidden.initial_sample(k_init)
        vals = jnp.asarray(x0.value)
        ev = model0.hidden.event_ndim
        if vals.ndim == ev:  # constant initial kernel: no particle axis yet
            vals = jnp.broadcast_to(vals, (n,) + vals.shape)
        lw = jnp.zeros((n,))

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
                if use_fused:
                    from ...ops.expand import systematic_expand

                    flat, treedef = jax.tree_util.tree_flatten((vals_n, stats_n))
                    out, _ = systematic_expand(k_res, w_n, tuple(flat))
                    vals_r, stats_r = jax.tree_util.tree_unflatten(treedef, list(out))
                    return vals_r, stats_r, jnp.zeros_like(w_n)
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
                lambda leaf: jnp.sum(
                    probs.reshape((n,) + (1,) * (leaf.ndim - 1)) * leaf, axis=0
                ),
                conj.posterior_mean(stats),
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
    return (f.conjugate,), (
        f.n_particles, f.resampler, f.ess_threshold, f.fused_resample,
    )


def _storvik_unflatten(aux, children):
    obj = object.__new__(StorvikFilter)
    obj.conjugate = children[0]
    obj.n_particles, obj.resampler, obj.ess_threshold, obj.fused_resample = aux
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


def _nig_obs_flatten(c):
    return (
        (c.obs_coeff, c.obs_scale, c.m0, c.v0, c._lam0, c._eta0),
        (c.a0, c.b0, c._quad0, c.c0, c.d0),
    )


def _nig_obs_unflatten(aux, children):
    obj = object.__new__(NIGARUnknownObsVariance)
    obj.obs_coeff, obj.obs_scale, obj.m0, obj.v0, obj._lam0, obj._eta0 = children
    obj.a0, obj.b0, obj._quad0, obj.c0, obj.d0 = aux
    return obj


def _pois_flatten(c):
    return (c.hidden,), (c.a0, c.b0)


def _pois_unflatten(aux, children):
    obj = object.__new__(PoissonGammaCounts)
    (obj.hidden,) = children
    obj.a0, obj.b0 = aux
    return obj


def _var_flatten(c):
    return (c.obs_coeff, c.obs_scale, c._lam0), (c.dim, c.a0, c.b0, c.initial_scale)


def _var_unflatten(aux, children):
    obj = object.__new__(NIGVectorAutoregression)
    obj.obs_coeff, obj.obs_scale, obj._lam0 = children
    obj.dim, obj.a0, obj.b0, obj.initial_scale = aux
    return obj


jax.tree_util.register_pytree_node(StorvikFilter, _storvik_flatten, _storvik_unflatten)
jax.tree_util.register_pytree_node(NIGAutoregression, _nig_flatten, _nig_unflatten)
jax.tree_util.register_pytree_node(
    NIGARUnknownObsVariance, _nig_obs_flatten, _nig_obs_unflatten
)
jax.tree_util.register_pytree_node(PoissonGammaCounts, _pois_flatten, _pois_unflatten)
jax.tree_util.register_pytree_node(
    NIGVectorAutoregression, _var_flatten, _var_unflatten
)
