"""SQMC — sequential quasi-Monte Carlo filtering (Gerber & Chopin 2015).

Replaces the particle filter's i.i.d. randomness with randomized
low-discrepancy point sets: at every step the cloud is ordered along a
Hilbert curve (``ops/hilbert.py``), the resampling ancestors are drawn by
inverse-CDF against the FIRST coordinate of an RQMC point set sorted the
same way, and the propagation noise comes from the remaining coordinates
through the increment distribution's inverse CDF. The result is the same
filtering law with ``o(N^{-1/2})`` RMSE (JRSS-B 77(3), Thm 7) — in practice
an order-of-magnitude variance reduction on the log-likelihood estimate at
moderate ``N`` (tests/test_sqmc.py measures it against the bootstrap SISR).

This is a beyond-reference capability: tingiskhan/pyfilter applies QMC only
to parameter-space initialization/proposals (inference/qmc.py,
context.py:377-408) — the filtering loop itself stays Monte Carlo. Here the
same Sobol engine drives the whole filter.

Scope: bootstrap proposal (the canonical SQMC setting) or
``proposal="linear_gaussian"`` — guided SQMC sampling the final sub-step
from the exact conditional posterior (the optimal
LinearGaussianObservations proposal) with the closed-form predictive as
the weight; on peaky observations this stacks another three orders of
magnitude of variance reduction on top of the QMC gain (1249x measured at
obs std 0.15, tests/test_sqmc.py). The hidden process must be an
:class:`~pyfilter_tpu.timeseries.process.AffineProcess` with an
elementwise (broadcast, not matrix) scale and an increment distribution
exposing ``icdf`` — Gaussian or any of the icdf-able distribution
families (Gaussian specifically for the guided proposal); the initial
distribution likewise. Models outside that contract raise at construction.

TPU notes: the per-step work is two sorts (Hilbert keys + point set), one
``searchsorted(method="sort")``, one gather, and elementwise icdf math — no
scalar loops, one ``lax.scan`` over time. Randomization is a per-step
Cranley-Patterson shift of one scrambled-Sobol base set (O(N·dim) memory,
no T-sized host precompute); fresh shifts each call via the jax key.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...distributions import Independent
from ...ops.hilbert import hilbert_argsort
from ...timeseries import AffineProcess, TimeseriesState
from ...utils import normalize
from .._lane import lane_concat, lane_exchange, lane_resample
from ..base import BaseFilter
from ..result import FilterHistory, FilterResult


class SQMCState(NamedTuple):
    values: jax.Array        # (N, *event)
    log_weights: jax.Array   # (N,)
    time_index: jax.Array
    log_likelihood: jax.Array

    # -- lane surgery (leaves lane-leading under lane-vmapped passes) ----------
    def exchange(self, other: "SQMCState", mask) -> "SQMCState":
        return lane_exchange(self, other, mask)

    def resample(self, indices, entire_history: bool = True) -> "SQMCState":
        return lane_resample(self, indices)

    @staticmethod
    def lane_concat(states) -> "SQMCState":
        return lane_concat(SQMCState, states)

    def get_mean(self):
        w = normalize(self.log_weights)
        v = self.values
        return jnp.sum((w[:, None] if v.ndim == 2 else w) * v, axis=0)

    def get_variance(self):
        w = normalize(self.log_weights)
        v = self.values
        we = w[:, None] if v.ndim == 2 else w
        m = jnp.sum(we * v, axis=0)
        return jnp.sum(we * jnp.square(v - m), axis=0)


def _flat_dim(dist) -> int:
    n = 1
    for s in tuple(dist.batch_shape) + tuple(dist.event_shape):
        n *= int(s)
    return n


#: scrambled-Sobol base sets keyed by (n, dim, seed) — module-level so SQMC
#: instances carry only hashable config (they are pytrees with the model as
#: the single child, like every BaseFilter: the PMMH fused chain scan passes
#: the filter through jit) and so `initialize_model` rebuilds inside a trace
#: without re-running the host-side Sobol engine.
_POINT_SETS: dict = {}


def _sobol_base(n: int, dim: int, seed: int):
    """Host-side scrambled Sobol, cached as NUMPY (never jnp: a jnp array
    materialized inside a jit trace is a tracer, and caching one leaks it
    out of the trace — the cached constant must be host data that each trace
    lifts afresh). Applies the EngineContainer degeneracy squeeze
    (inference/qmc.py:48-49)."""
    cache_key = (n, dim, seed)
    if cache_key not in _POINT_SETS:
        import warnings

        import numpy as np
        from scipy.stats import qmc

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            probs = qmc.Sobol(dim, scramble=True, seed=seed).random(n)
        eps = float(np.finfo(np.float32).eps)
        _POINT_SETS[cache_key] = np.asarray(
            0.5 + (1.0 - eps) * (probs - 0.5), np.float32
        )
    return _POINT_SETS[cache_key]


class SQMC(BaseFilter):
    """Sequential quasi-Monte Carlo filter (bootstrap or guided).

    ``bits`` controls the Hilbert grid resolution (default: largest fitting
    the 64-bit sort key, capped at 16); ``scramble_seed`` fixes the Sobol
    scrambling (the per-call jax ``key`` still randomizes via fresh
    Cranley-Patterson shifts, so repeated calls give independent RQMC
    replicates either way).

    Accepts a model OR a model builder and supports ``batch_shape`` lanes
    (one ``jax.vmap`` per pass, each lane an independent RQMC randomization)
    — so it slots into :class:`~...batch.mcmc.pmmh.PMMH` as the likelihood
    estimator: pseudo-marginal MH whose noise is the SQMC variance, orders
    of magnitude under the bootstrap filter's at equal cost (PERF.md
    "Round-5 ledger II"; tests/test_sqmc.py::test_pmmh_with_sqmc).
    """

    _config_fields = (
        "record_states",
        "record_intermediary",
        "nan_strategy",
        "batch_shape",
        "model_builder",
        "n_particles",
        "bits",
        "scramble_seed",
        "proposal",
    )

    def __init__(
        self,
        model,
        particles: int,
        bits: Optional[int] = None,
        scramble_seed: int = 0,
        record_states: bool = False,
        proposal: str = "bootstrap",
        batch_shape=(),
    ):
        if proposal not in ("bootstrap", "linear_gaussian"):
            raise ValueError("proposal must be 'bootstrap' or 'linear_gaussian'")
        super().__init__(
            model, record_states=record_states, batch_shape=batch_shape
        )
        self.n_particles = int(particles)
        self.bits = bits
        self.scramble_seed = int(scramble_seed)
        self.proposal = proposal
        if self.model is not None:
            self._validate(self.model)

    def _validate(self, model):
        hidden = model.hidden
        if not isinstance(hidden, AffineProcess):
            raise ValueError("SQMC needs an AffineProcess hidden process")
        inc = hidden.increment_distribution
        init = hidden.initial_distribution()
        if not (inc.has_icdf and init.has_icdf):
            raise ValueError(
                "SQMC needs icdf-able increment and initial distributions "
                "(inverse-Rosenblatt propagation)"
            )
        if self.proposal == "linear_gaussian":
            # guided SQMC (Gerber-Chopin §4): sample the final sub-step from
            # the exact conditional posterior (the LinearGaussianObservations
            # optimal proposal, proposals/linear.py) via its componentwise
            # icdf; the incremental weight is then the closed-form predictive
            # p(y_t | x_{t-1}) — requires Gaussian increments, an elementwise
            # observation map (scalar or per-component a), and Gaussian
            # observation noise (the LinearStateSpaceModel (a, b, s) layout)
            from ...distributions import Normal

            elementwise_normal = isinstance(inc, Normal) or (
                isinstance(inc, Independent) and isinstance(inc.base_dist, Normal)
            )
            if not elementwise_normal:
                raise ValueError(
                    "proposal='linear_gaussian' needs elementwise Normal increments"
                )
            if not hasattr(model, "parameters") or len(model.parameters) != 3:
                raise ValueError(
                    "proposal='linear_gaussian' needs the LinearStateSpaceModel "
                    "(a, b, s) observation layout"
                )
            if jnp.ndim(model.parameters[0]) >= 2:
                raise ValueError(
                    "proposal='linear_gaussian' supports scalar/per-component "
                    "observation maps (matrix A couples components — use "
                    "bootstrap, or the non-QMC APF with the optimal proposal)"
                )

    def initialize_model(self, context) -> "SQMC":
        new = super().initialize_model(context)
        new._validate(new.model)
        return new

    # -- model-derived shape metadata (static: int() on abstract shapes) -------
    @property
    def _ev(self) -> int:
        return int(self.model.hidden.event_ndim)

    @property
    def _noise_shape(self) -> tuple:
        inc = self.model.hidden.increment_distribution
        return tuple(inc.batch_shape) + tuple(inc.event_shape)

    @property
    def _init_shape(self) -> tuple:
        init = self.model.hidden.initial_distribution()
        return tuple(init.batch_shape) + tuple(init.event_shape)

    @property
    def _d_noise(self) -> int:
        return _flat_dim(self.model.hidden.increment_distribution)

    @property
    def _dim_step(self) -> int:
        return 1 + int(self.model.observe_every_step) * self._d_noise

    @property
    def _base(self) -> jnp.ndarray:
        return _sobol_base(self.n_particles, self._dim_step, self.scramble_seed)

    @property
    def _base_init(self) -> jnp.ndarray:
        d_init = _flat_dim(self.model.hidden.initial_distribution())
        return _sobol_base(self.n_particles, d_init, self.scramble_seed + 1)

    @property
    def _inc_var(self):
        inc = self.model.hidden.increment_distribution
        inc_base = inc.base_dist if isinstance(inc, Independent) else inc
        return jnp.asarray(inc_base.variance)

    # -- pieces ---------------------------------------------------------------
    def _obs_log_weight(self, x: TimeseriesState, y_t) -> jax.Array:
        """Observation log-weights with exact partial-NaN marginalization for
        factorized densities and all-NaN skip otherwise (the package's
        nan_strategy="skip" semantics, filters/_masked.py)."""
        density = self.model.build_density(x)
        y_t = jnp.asarray(y_t, jnp.float32)
        nan = jnp.isnan(y_t)
        y_safe = jnp.where(nan, 0.0, y_t)
        if isinstance(density, Independent) and density.reinterpreted_batch_ndims == 1:
            lp = density.base_dist.log_prob(y_safe)
            return jnp.sum(jnp.where(nan, 0.0, lp), axis=-1)
        lp = density.log_prob(y_safe)
        return jnp.where(jnp.all(nan), 0.0, lp)

    def _guided_step(self, x: TimeseriesState, y_t, us: jax.Array):
        """Final sub-step from the exact conditional posterior
        ``p(x_t | x_{t-1}, y_t)`` (componentwise precision form —
        proposals/utils.py:42's scalar branch), sampled by icdf; the
        incremental weight is the closed-form predictive
        ``N(y; b + a·loc, a² h_var + o_var)``. NaN observation components
        fall back to prior propagation with zero weight (exact partial
        marginalization)."""
        from jax.scipy.special import ndtri

        n = self.n_particles
        hidden = self.model.hidden
        loc, scale = hidden.mean_scale(x)
        h_var = jnp.square(scale) * self._inc_var           # (N, *event)
        a, b, s_obs = self.model.parameters
        a = jnp.asarray(a)
        o_var = jnp.square(jnp.asarray(s_obs))

        y_t = jnp.asarray(y_t, jnp.float32)
        nan = jnp.isnan(y_t)
        yd = jnp.where(nan, 0.0, y_t - b)
        eff_o_prec = jnp.where(nan, 0.0, 1.0 / o_var)       # missing -> prior

        post_var = 1.0 / (1.0 / h_var + jnp.square(a) * eff_o_prec)
        post_mean = post_var * (loc / h_var + a * eff_o_prec * yd)

        z = ndtri(us.reshape((n,) + self._noise_shape))
        x_new = post_mean + jnp.sqrt(post_var) * z
        x = x.propagate_from(values=x_new, time_increment=1.0)

        pred_var = o_var + jnp.square(a) * h_var
        lp = (
            -0.5 * jnp.square(y_t - (b + a * loc)) / pred_var
            - 0.5 * jnp.log(2.0 * jnp.pi * pred_var)
        )
        lp = jnp.where(nan, 0.0, lp)
        if self._ev:
            lp = jnp.sum(lp, axis=-1)
        return x, lp

    def _shift(self, key, u) -> jax.Array:
        s = jax.random.uniform(key, (u.shape[-1],), u.dtype)
        out = jnp.mod(u + s, 1.0)
        # keep strictly inside (0, 1): mod can land exactly on 0.0 in f32 and
        # icdf(0) = -inf would poison the propagation (the engine's
        # degeneracy squeeze, re-applied post-shift — qmc.py:48-49)
        eps = jnp.finfo(out.dtype).eps
        return 0.5 + (1.0 - eps) * (out - 0.5)

    def initialize(self, key) -> SQMCState:
        u = self._shift(key, self._base_init).reshape(
            (self.n_particles,) + self._init_shape
        )
        x0 = self.model.hidden.initial_distribution().icdf(u)
        return SQMCState(
            jnp.asarray(x0, jnp.float32),
            jnp.zeros(self.n_particles, jnp.float32),
            jnp.asarray(0.0),
            jnp.asarray(0.0),
        )

    def filter(self, key, y_t, state: SQMCState, n_transitions: int = None):
        """One SQMC move: Hilbert sort -> inverse-CDF resample on the RQMC
        first coordinate -> icdf propagation -> reweight. Returns
        ``(new_state, ancestor_indices)``."""
        if n_transitions is None:
            n_transitions = int(self.model.observe_every_step)
        n = self.n_particles
        hidden = self.model.hidden

        u = self._shift(key, self._base)               # (N, 1 + oes*d')
        u = u[jnp.argsort(u[:, 0])]                    # sorted by coord 0

        flat = state.values.reshape(n, -1)
        sigma = hilbert_argsort(flat, self.bits)       # Hilbert cloud order
        w_sorted = normalize(state.log_weights)[sigma]
        cum = jnp.cumsum(w_sorted)
        cum = cum.at[-1].set(1.0)                      # absorb float drift
        a = jnp.searchsorted(cum, u[:, 0], side="left", method="sort")
        ancestors = sigma[jnp.clip(a, 0, n - 1)]

        x = TimeseriesState(
            state.time_index,
            jnp.take(state.values, ancestors, axis=0),
            self._ev,
        )
        guided = self.proposal == "linear_gaussian"
        prior_steps = n_transitions - 1 if guided else n_transitions
        for s in range(prior_steps):
            loc, scale = hidden.mean_scale(x)
            us = u[:, 1 + s * self._d_noise : 1 + (s + 1) * self._d_noise]
            w = hidden.increment_distribution.icdf(
                us.reshape((n,) + self._noise_shape)
            )
            x = x.propagate_from(values=loc + scale * w, time_increment=1.0)

        if guided:
            us = u[:, 1 + prior_steps * self._d_noise :]
            x, lw = self._guided_step(x, y_t, us)
        else:
            lw = self._obs_log_weight(x, y_t)
        inc = jax.scipy.special.logsumexp(lw, axis=0) - math.log(n)
        new = SQMCState(
            jnp.asarray(x.value, jnp.float32),
            lw,
            jnp.asarray(x.time_index),
            state.log_likelihood + inc,
        )
        return new, ancestors

    def batch_filter(self, key, y, initial_state=None, use_jit=True, unroll=1) -> FilterResult:
        """Whole-sequence SQMC pass as one ``lax.scan``.

        With ``record_states=True`` the result carries a standard
        :class:`FilterHistory` (initial cloud first, the package convention),
        so the FFBS/FFBSi smoothers and the genealogy variance estimators
        apply unchanged. With ``batch_shape=(K,)`` the pass vmaps K
        independent lanes (independent RQMC randomizations; lane-batched
        model parameter leaves ride the vmap) — the PMMH/marginal form."""
        if initial_state is not None:
            raise ValueError("SQMC does not accept an initial_state")
        if self.batch_shape:
            from .._lane import lane_axes, swap_result_lanes

            if len(self.batch_shape) > 1:
                raise ValueError("SQMC lane batching supports one lane axis")
            k_lanes = int(self.batch_shape[0])
            axes = lane_axes(self.model, k_lanes)
            keys = jax.random.split(key, k_lanes)
            res = jax.vmap(
                lambda mdl, kk: self.replace(model=mdl, batch_shape=()).batch_filter(kk, y),
                in_axes=(axes, 0),
            )(self.model, keys)
            res = swap_result_lanes(res)
            states = res.states
            if states is not None:
                # vmap leaves histories lane-leading; package convention is
                # time-major, particles, lanes
                states = FilterHistory(
                    states.time_indexes[0],
                    jnp.moveaxis(states.values, 0, 2),
                    jnp.moveaxis(states.log_weights, 0, 2),
                    jnp.moveaxis(states.prev_indices, 0, 2),
                )
                res = res._replace(states=states)
            return res
        y = jnp.asarray(y, jnp.float32)
        k_init, k0, k_scan = jax.random.split(key, 3)
        state0 = self.initialize(k_init)
        state1, anc1 = self.filter(k0, y[0], state0, n_transitions=1)

        def step(carry, inp):
            st, k = carry
            k, k_use = jax.random.split(k)
            new, anc = self.filter(k_use, inp, st)
            out = (
                new.log_likelihood - st.log_likelihood,
                new.get_mean(),
                new.get_variance(),
                (new.time_index, new.values, new.log_weights, anc),
            )
            return (new, k), out

        (last, _), rest = jax.lax.scan(step, (state1, k_scan), y[1:])
        first = (
            state1.log_likelihood,
            state1.get_mean(),
            state1.get_variance(),
            (state1.time_index, state1.values, state1.log_weights, anc1),
        )
        step_lls, means, variances, hist = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), first, rest
        )

        states = None
        if self.record_states:
            ident = jnp.arange(self.n_particles, dtype=hist[3].dtype)
            states = FilterHistory(
                jnp.concatenate([state0.time_index[None], hist[0]], axis=0),
                jnp.concatenate([state0.values[None], hist[1]], axis=0),
                jnp.concatenate([state0.log_weights[None], hist[2]], axis=0),
                jnp.concatenate([ident[None], hist[3]], axis=0),
            )
        return FilterResult(
            log_likelihood=last.log_likelihood,
            step_log_likelihoods=step_lls,
            filter_means=means,
            filter_variances=variances,
            latest_state=last,
            states=states,
        )
