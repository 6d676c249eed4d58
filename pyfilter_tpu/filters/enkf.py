"""Ensemble Kalman filter — Monte-Carlo Gaussian filtering at scale.

New capability beyond the reference (which is particle-only; SURVEY.md §2
has no Gaussian-filter rows — the zoo here extends it): the stochastic
(perturbed-observation) EnKF of Evensen propagates an ensemble of M states
through the model's own stochastic transition (``hidden.propagate`` — exact,
no linearization, non-additive noise welcome) and replaces the correction
step's importance weighting with a linear-Gaussian update built from ensemble
sample covariances. Degeneracy-free in high dimensions where particle filters
collapse, at the price of a Gaussian approximation in the update.

TPU mapping: the analysis step is two ``(d, M) @ (M, d_y)`` matmuls plus a
``d_y x d_y`` solve — MXU work that scales to large ensembles; the forecast is
the same vectorized ``propagate`` the particle filters use. Everything is one
``lax.scan`` over time and differentiable w.r.t. model parameters.

Completes the Gaussian family: :class:`KalmanFilter` (exact, linear),
:class:`ExtendedKalmanFilter` (autodiff Jacobians),
:class:`UnscentedKalmanFilter` (sigma points), ``EnsembleKalmanFilter``
(Monte-Carlo).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..timeseries import TimeseriesState
from ._lane import lane_concat, lane_exchange, lane_resample, lane_vmap_batch_filter
from ._masked import density_covariance, masked_gaussian_update
from .result import FilterResult


class EnKFState(NamedTuple):
    ensemble: jax.Array  # (M, d) internal 2-D layout, scalar states lifted
    log_likelihood: jax.Array
    time_index: jax.Array

    def get_mean(self):
        return self.ensemble.mean(axis=0)

    def get_variance(self):
        return self.ensemble.var(axis=0, ddof=1)

    # -- lane surgery (leaves lane-leading under lane-vmapped passes) ----------
    def exchange(self, other: "EnKFState", mask) -> "EnKFState":
        return lane_exchange(self, other, mask)

    def resample(self, indices, entire_history: bool = True) -> "EnKFState":
        return lane_resample(self, indices)

    @staticmethod
    def lane_concat(states) -> "EnKFState":
        return lane_concat(EnKFState, states)


class EnsembleKalmanFilter:
    """Stochastic EnKF over a :class:`StateSpaceModel`.

    Requirements: the observation density must expose ``mean`` plus a noise
    covariance (the full ``covariance_matrix`` for MVN densities,
    ``diag(variance)`` otherwise — evaluated at the ensemble mean, as in
    :class:`UnscentedKalmanFilter`); the hidden transition only needs
    ``propagate`` — any nonlinearity or state-dependent diffusion is carried
    exactly by the forecast ensemble.

    ``inflation`` >= 1 multiplies forecast anomalies (multiplicative covariance
    inflation, the standard fix for sampling-noise underdispersion at small M).

    ``localization`` (a :class:`~pyfilter_tpu.filters.etkf.Localization`):
    Gaspari-Cohn Schur tapering of the sample cross-/observation-space
    covariances — at M ≪ d the unlocalized filter diverges on spurious
    long-range sample correlations (see filters/etkf.py for the
    deterministic square-root variant).
    """

    def __init__(
        self,
        model,
        ensemble_size: int = 100,
        inflation: float = 1.0,
        localization=None,
        batch_shape=(),
    ):
        self.model = model
        self.ensemble_size = int(ensemble_size)
        self.inflation = float(inflation)
        self.localization = localization
        self.batch_shape = tuple(batch_shape)
        hidden = model.hidden
        self._ev = int(hidden.event_ndim)
        init = hidden.initial_distribution()
        self._d_x = int(init.event_shape[0]) if self._ev == 1 else 1
        self._d_y = int(model.event_shape[0]) if model.event_shape else 1

    # -- model boundary (ensemble axis = particle axis) -----------------------
    def _state(self, ens, t) -> TimeseriesState:
        return TimeseriesState(t, ens if self._ev == 1 else ens[..., 0], self._ev)

    def _lift(self, values) -> jax.Array:
        v = jnp.asarray(values, jnp.float32)
        return v if self._ev == 1 else v[..., None]

    def _obs_density(self, ens, t):
        return self.model.build_density(self._state(ens, t))

    def _obs_mean(self, ens, t) -> jax.Array:
        m = jnp.asarray(self._obs_density(ens, t).mean)
        return m[:, None] if m.ndim == 1 else m  # (M, d_y)

    def _obs_cov_at_mean(self, ens, t) -> jax.Array:
        d = self._obs_density(ens.mean(axis=0, keepdims=True), t)
        return density_covariance(d, self._d_y)

    # -- filtering --------------------------------------------------------------
    def initialize(self, key) -> EnKFState:
        x0 = self.model.hidden.initial_sample(key, (self.ensemble_size,))
        return EnKFState(self._lift(x0.value), jnp.asarray(0.0), jnp.asarray(0.0))

    def _forecast(self, key, ens, t, n_transitions: int):
        state = self._state(ens, t)
        state = self.model.hidden.propagate_substeps(key, state, n_transitions)
        ens = self._lift(state.value)
        if self.inflation != 1.0:
            m = ens.mean(axis=0)
            ens = m + self.inflation * (ens - m)
        return ens, state.time_index

    def _analysis(self, key, ens, y_t, t):
        m_count = self.ensemble_size
        g = self._obs_mean(ens, t)  # (M, d_y) noise-free obs means
        g_bar = g.mean(axis=0)
        b = g - g_bar  # obs anomalies
        a = ens - ens.mean(axis=0)  # state anomalies
        r = self._obs_cov_at_mean(ens, t)  # (d_y, d_y) full covariance
        c_yy = b.T @ b / (m_count - 1) + r  # innovation covariance
        c_xy = a.T @ b / (m_count - 1)  # (d, d_y)
        if self.localization is not None:
            # Schur taper of the SAMPLE parts only: rho∘(B'B/(M-1)) + R
            rho_yy = self.localization.rho_yy
            c_yy = c_yy * rho_yy + r * (1.0 - rho_yy)
            c_xy = c_xy * self.localization.rho_xy

        # partial-NaN components are exactly marginalized: the masked gain has
        # zero columns for missing slots, so the member update ignores them
        # (all-NaN skip is the degenerate case — zero gain, ll_t == 0)
        k_gain, _, ll_t, _ = masked_gaussian_update(y_t, g_bar, c_xy, c_yy)

        # perturbed observations: each member sees y + eps_i, eps_i ~ N(0, R)
        r_chol = jnp.linalg.cholesky(r)
        eps = jax.random.normal(key, g.shape, g.dtype) @ r_chol.T
        y_safe = jnp.where(jnp.isnan(y_t), 0.0, y_t)
        ens_new = ens + (y_safe + eps - g) @ k_gain.T
        return ens_new, ll_t

    def filter(self, key, y_t, state: EnKFState, n_transitions: int = None) -> EnKFState:
        """One forecast+analysis move with all-NaN observation skip (same
        timing contract as ``KalmanFilter.filter``)."""
        y_t = jnp.atleast_1d(jnp.asarray(y_t, jnp.float32))
        if n_transitions is None:
            n_transitions = int(self.model.observe_every_step)
        k_fore, k_ana = jax.random.split(key)
        ens, t = self._forecast(k_fore, state.ensemble, state.time_index, n_transitions)
        ens, ll_t = self._analysis(k_ana, ens, y_t, t)
        return EnKFState(ens, state.log_likelihood + ll_t, t)

    def batch_filter(self, key, y) -> FilterResult:
        """Ensemble filtering over the whole sequence as one ``lax.scan``
        (time axis leading); the log-likelihood estimate is the running sum of
        Gaussian innovation densities ``N(y_t; E[g(X)], C_yy + R)``.

        ``batch_shape=(K,)`` vectorizes K independent ensembles over
        lane-batched model-parameter leaves (one ``jax.vmap``, one key per
        lane — see ``filters/_lane.py``)."""
        if self.batch_shape:
            return lane_vmap_batch_filter(
                lambda mdl: type(self)(
                    mdl, self.ensemble_size, self.inflation, self.localization
                ),
                self.model, self.batch_shape, y, key=key,
            )
        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 1:
            y = y[:, None]

        k_init, k0, k_scan = jax.random.split(key, 3)
        state1 = self.filter(k0, y[0], self.initialize(k_init), n_transitions=1)
        first = (state1.log_likelihood, state1.get_mean(), state1.get_variance())

        def step(carry, y_t):
            state, k = carry
            k, k_use = jax.random.split(k)
            new = self.filter(k_use, y_t, state)
            step_ll = new.log_likelihood - state.log_likelihood
            return (new, k), (step_ll, new.get_mean(), new.get_variance())

        (last, _), rest = jax.lax.scan(step, (state1, k_scan), y[1:])
        step_lls, means, variances = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), first, rest
        )
        return FilterResult(
            log_likelihood=last.log_likelihood,
            step_log_likelihoods=step_lls,
            filter_means=means,
            filter_variances=variances,
            latest_state=last,
            states=None,
        )

    # -- smoothing ---------------------------------------------------------------
    def smooth(self, key, y):
        """Ensemble RTS smoother (EnRTS / Raanes 2016): a backward pass that
        moves every member by the ensemble-sampled RTS gain,

        ``x_t^s = x_t^a + G_t (x_{t+1}^s - x_{t+1}^f)``,
        ``G_t = Cov(x_t^a, x_{t+1}^f) Var(x_{t+1}^f)^{-1}``,

        where the cross-covariance pairs each analysis member with ITS OWN
        forecast propagation (the pairing survives sub-stepping). Returns the
        smoothed ensemble ``(T, M, d)`` — its mean/variance estimate the
        smoothing marginals, and the member paths are (approximate) joint
        draws, the Gaussian analogue of FFBS trajectories."""
        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 1:
            y = y[:, None]
        oes = int(self.model.observe_every_step)
        m_count = self.ensemble_size

        def forward_move(key, ens, t, y_t, n):
            k_fore, k_ana = jax.random.split(key)
            fore, t = self._forecast(k_fore, ens, t, n)
            ana, _ = self._analysis(k_ana, fore, y_t, t)
            return (fore, ana), t

        k_init, k0, k_scan = jax.random.split(key, 3)
        ens0 = self.initialize(k_init).ensemble
        (fore1, ana1), t1 = forward_move(k0, ens0, jnp.asarray(0.0), y[0], 1)

        def fwd(carry, inp):
            ens, t = carry
            k, y_t = inp
            (fore, ana), t_new = forward_move(k, ens, t, y_t, oes)
            return (ana, t_new), (fore, ana)

        keys = jax.random.split(k_scan, y.shape[0] - 1)
        _, (fore_rest, ana_rest) = jax.lax.scan(fwd, (ana1, t1), (keys, y[1:]))
        fores = jnp.concatenate([fore1[None], fore_rest], axis=0)  # (T, M, d)
        anas = jnp.concatenate([ana1[None], ana_rest], axis=0)

        return enrts_backward(fores, anas, m_count)


def enrts_backward(fores, anas, m_count, rho_xx=None):
    """Member-paired ensemble RTS backward pass (Raanes 2016), shared by the
    stochastic EnKF and the deterministic ETKF/LETKF smoothers:

    ``x_t^s = x_t^a + G_t (x_{t+1}^s - x_{t+1}^f)``,
    ``G_t = Cov(x_t^a, x_{t+1}^f) Var(x_{t+1}^f)^{-1}``,

    where the cross-covariance pairs each analysis member with ITS OWN
    forecast propagation (the pairing survives sub-stepping and the ETKF's
    deterministic transform alike).

    The global branch solves in whichever space is SMALLER: at M <= d the
    push-through identity ``A_a A_f' (A_f A_f' + εI_d)^{-1} = A_a (A_f' A_f +
    εI_M)^{-1} A_f'`` gives an (M, M) ensemble-space solve — at M < d the
    state-space forecast covariance is rank-deficient (rank M-1) and its
    regularized (d, d) solve is numerically explosive (observed: NaN at
    d=256, M=40) — while at d < M the classic (d, d) state-space solve is
    full-rank and avoids the O(M³) system (a 4000-member, d=1 smoother
    measured 164 s in ensemble space vs seconds in state space).

    ``rho_xx`` (Gaspari-Cohn state-state taper) switches to the localized
    branch: both the cross-covariance AND the forecast covariance are
    Schur-tapered (the taper restores full rank — the same reason the
    localized analysis works at M ≪ d), then solved in state space.
    ``fores``/``anas``: ``(T, M, d)``. Returns the smoothed ensemble
    ``(T, M, d)``."""
    if fores.shape[0] == 1:
        return anas
    m_eff = m_count - 1.0

    def backward(smoothed_next, inp):
        ana_t, fore_next = inp
        a = ana_t - ana_t.mean(axis=0)  # (M, d) analysis anomalies
        af = fore_next - fore_next.mean(axis=0)  # (M, d) forecast anomalies
        innov = smoothed_next - fore_next  # (M, d)
        if rho_xx is None and af.shape[0] <= af.shape[1]:  # M <= d
            # ensemble-space gain: innov @ G' = innov @ A_f' K^{-1} A_a
            k_mat = af @ af.T + m_eff * 1e-6 * jnp.eye(af.shape[0])
            tmp = innov @ af.T  # (M, M)
            smoothed = ana_t + jnp.linalg.solve(k_mat, tmp.T).T @ a
        elif rho_xx is None:  # d < M: full-rank state-space solve
            c_xf = a.T @ af / m_eff
            p_f = af.T @ af / m_eff + 1e-6 * jnp.eye(af.shape[1])
            gain = jnp.linalg.solve(p_f.T, c_xf.T).T  # C P^{-1}
            smoothed = ana_t + innov @ gain.T
        else:
            c_xf = rho_xx * (a.T @ af) / m_eff
            p_f = rho_xx * (af.T @ af) / m_eff + 1e-6 * jnp.eye(a.shape[1])
            gain = jnp.linalg.solve(p_f.T, c_xf.T).T  # C P^{-1}
            smoothed = ana_t + innov @ gain.T
        return smoothed, smoothed

    _, sm_rest = jax.lax.scan(
        backward, anas[-1], (anas[:-1], fores[1:]), reverse=True
    )
    return jnp.concatenate([sm_rest, anas[-1][None]], axis=0)
