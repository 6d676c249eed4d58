"""Ensemble transform Kalman filter (ETKF/LETKF) with Gaspari-Cohn
covariance localization — the high-dimensional ensemble tooling.

Two gaps of the stochastic EnKF (filters/enkf.py) close here:

- **Deterministic square-root update** (ETKF: Bishop, Etherton & Majumdar
  2001; the symmetric-root form of Hunt, Kostelich & Szunyogh 2007): the
  analysis ensemble is the forecast mean plus a deterministic linear
  transform of the anomalies — no perturbed-observation sampling noise, so
  the analysis covariance is EXACTLY the Kalman update of the sample
  covariance (the stochastic filter only matches it in expectation).
- **Gaspari-Cohn localization** (Gaspari & Cohn 1999, eq. 4.10): at
  M ≪ d — the regime ensemble filters exist for — spurious long-range
  sample correlations make the unlocalized filter diverge. The 5th-order
  compactly-supported taper zeroes them by distance. Localization is
  DOMAIN-style (the LETKF): every state component solves its own (M, M)
  analysis against distance-weighted observation precisions — a batched
  ``eigh`` over state components, embarrassingly parallel on TPU.

TPU mapping: the global ETKF is two ``(M, d)``-by-``(M, d_y)`` matmuls, one
``(M, M)`` eigendecomposition, and one ``(M, M) @ (M, d)`` transform per
step; the LETKF vmaps the (M, M) solve over state components (batched eigh —
MXU-friendly at M ≤ a few hundred). Everything is one ``lax.scan`` over time
and differentiable w.r.t. model parameters.

No reference counterpart (the reference is particle-only); completes the
ensemble family begun by :class:`EnsembleKalmanFilter`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..timeseries import TimeseriesState
from ._masked import density_covariance
from .enkf import EnKFState
from .result import FilterResult


def gaspari_cohn(r: jax.Array) -> jax.Array:
    """Gaspari & Cohn (1999, eq. 4.10) 5th-order taper of the normalized
    distance ``r = dist / c``: 1 at 0, compactly supported on [0, 2]."""
    r = jnp.abs(jnp.asarray(r))
    r2, r3 = r * r, r * r * r
    near = -0.25 * r3 * r2 + 0.5 * r3 * r + 0.625 * r3 - (5.0 / 3.0) * r2 + 1.0
    far = (
        (1.0 / 12.0) * r3 * r2
        - 0.5 * r3 * r
        + 0.625 * r3
        + (5.0 / 3.0) * r2
        - 5.0 * r
        + 4.0
        - (2.0 / 3.0) / jnp.maximum(r, 1e-12)
    )
    return jnp.where(r <= 1.0, near, jnp.where(r <= 2.0, far, 0.0))


def _euclidean(a, b):
    return jnp.sqrt(jnp.sum(jnp.square(a - b), axis=-1))


class Localization(NamedTuple):
    """Distance-based Gaspari-Cohn tapers between state and observation
    geometries.

    ``rho_xy`` ``(d, d_y)`` tapers state-observation covariances (also the
    LETKF's per-state-component observation weights); ``rho_yy`` ``(d_y,
    d_y)`` tapers the observation-space covariance; ``rho_xx`` ``(d, d)``
    tapers state-state covariances (used by the ensemble SMOOTHER's backward
    gain — at M ≪ d the untapered gain would reintroduce the spurious
    long-range correlations the localized analysis removed). Build from
    coordinates with :meth:`from_coords` (pluggable metric — e.g. a periodic
    ring distance) or supply precomputed distance matrices to
    :meth:`from_distances`.
    """

    rho_xy: jax.Array
    rho_yy: jax.Array
    rho_xx: Optional[jax.Array] = None

    @classmethod
    def from_coords(
        cls,
        state_coords,
        obs_coords=None,
        radius: float = 1.0,
        metric: Optional[Callable] = None,
    ) -> "Localization":
        """``state_coords``: ``(d, c)`` (or ``(d,)``) coordinates per state
        component; ``obs_coords`` defaults to the state coordinates (identity
        -like observation geometry). ``radius`` is the GC half-support ``c``
        (the taper reaches zero at distance ``2 * radius``)."""
        sc = jnp.atleast_2d(jnp.asarray(state_coords, jnp.float32).T).T
        if sc.ndim == 1:
            sc = sc[:, None]
        oc = sc if obs_coords is None else jnp.asarray(obs_coords, jnp.float32)
        if oc.ndim == 1:
            oc = oc[:, None]
        metric = metric or _euclidean
        d_xy = metric(sc[:, None, :], oc[None, :, :])
        d_yy = metric(oc[:, None, :], oc[None, :, :])
        d_xx = metric(sc[:, None, :], sc[None, :, :])
        return cls.from_distances(d_xy, d_yy, radius, dist_xx=d_xx)

    @classmethod
    def from_distances(
        cls, dist_xy, dist_yy, radius: float = 1.0, dist_xx=None
    ) -> "Localization":
        return cls(
            gaspari_cohn(jnp.asarray(dist_xy) / radius),
            gaspari_cohn(jnp.asarray(dist_yy) / radius),
            None if dist_xx is None else gaspari_cohn(jnp.asarray(dist_xx) / radius),
        )


class EnsembleTransformKalmanFilter:
    """Deterministic square-root ensemble filter over a
    :class:`StateSpaceModel` (same model contract as
    :class:`EnsembleKalmanFilter`: stochastic ``propagate`` forecasts, an
    observation density exposing ``mean`` + a noise covariance).

    ``localization=None`` gives the global ETKF; a :class:`Localization`
    switches to the LETKF domain-localized update (diagonal observation
    noise required — the local solves scale per-observation precisions).
    ``inflation`` multiplies forecast anomalies as in the stochastic filter.
    """

    def __init__(
        self,
        model,
        ensemble_size: int = 100,
        inflation: float = 1.0,
        localization: Optional[Localization] = None,
        batch_shape=(),
        sqrt_method: Optional[str] = None,
        ns_iters: int = 14,
    ):
        if sqrt_method is None:
            # auto: the LETKF's d-way batch of small (M, M) transforms is
            # where QDWH-eigh drowns on TPU — the Newton-Schulz matmul
            # iteration measured 123x faster at d=1024/M=50 with 3e-5
            # relative likelihood agreement (PERF.md "Round-5 ledger");
            # the global path keeps the exact eigendecomposition.
            sqrt_method = "newton" if localization is not None else "eigh"
        if sqrt_method not in ("eigh", "newton"):
            raise ValueError("sqrt_method must be 'eigh' or 'newton'")
        self.model = model
        self.ensemble_size = int(ensemble_size)
        self.inflation = float(inflation)
        self.localization = localization
        self.batch_shape = tuple(batch_shape)
        self.sqrt_method = sqrt_method
        self.ns_iters = int(ns_iters)
        hidden = model.hidden
        self._ev = int(hidden.event_ndim)
        init = hidden.initial_distribution()
        self._d_x = int(init.event_shape[0]) if self._ev == 1 else 1
        self._d_y = int(model.event_shape[0]) if model.event_shape else 1

    # -- model boundary (shared with EnsembleKalmanFilter) ---------------------
    def _state(self, ens, t) -> TimeseriesState:
        return TimeseriesState(t, ens if self._ev == 1 else ens[..., 0], self._ev)

    def _lift(self, values) -> jax.Array:
        v = jnp.asarray(values, jnp.float32)
        return v if self._ev == 1 else v[..., None]

    def _obs_mean(self, ens, t) -> jax.Array:
        m = jnp.asarray(self.model.build_density(self._state(ens, t)).mean)
        return m[:, None] if m.ndim == 1 else m  # (M, d_y)

    def _obs_cov_at_mean(self, ens, t) -> jax.Array:
        d = self.model.build_density(self._state(ens.mean(axis=0, keepdims=True), t))
        return density_covariance(d, self._d_y)

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

    # -- analysis ----------------------------------------------------------------
    def _transform(self, yr, innov_r, m_count):
        """Core ETKF solve in whitened observation space.

        ``yr``: ``(M, p)`` whitened obs anomalies; ``innov_r``: ``(p,)``
        whitened innovation. Returns ``(w_bar, w_mat)``: the mean weight
        vector and the symmetric square-root transform, both ``(M[, M])``.

        ``sqrt_method="newton"`` replaces the eigendecomposition with the
        coupled Newton-Schulz inverse-square-root iteration — pure (M, M)
        matmuls, the MXU-native formulation (TPU `eigh` lowers to the
        iterative QDWH algorithm and dominates the measured LETKF step,
        PERF.md "Round-5 ledger"). ``A = (M-1) I + Yr Yr'`` is SPD with
        eigenvalues >= M-1, and scaling by the Gershgorin row-sum bound puts
        the spectrum in (0, 1], where the iteration converges globally
        (quadratically once close); ``ns_iters`` trades accuracy for speed.
        """
        m1 = m_count - 1.0
        a_mat = m1 * jnp.eye(yr.shape[0], dtype=yr.dtype) + yr @ yr.T
        if self.sqrt_method == "eigh":
            evals, evecs = jnp.linalg.eigh(a_mat)
            evals = jnp.maximum(evals, 1e-8)
            pa = (evecs / evals) @ evecs.T  # A^{-1}
            w_bar = pa @ (yr @ innov_r)
            w_mat = (evecs / jnp.sqrt(evals / m1)) @ evecs.T  # (m1 * A^{-1})^{1/2}
            return w_bar, w_mat
        # Newton-Schulz: Z -> (A/c)^{-1/2}, so A^{-1/2} = Z / sqrt(c)
        eye = jnp.eye(a_mat.shape[0], dtype=a_mat.dtype)
        c = jnp.max(jnp.sum(jnp.abs(a_mat), axis=1))  # Gershgorin: c >= lam_max
        b = a_mat / c
        z = eye

        def body(_, carry):
            b, z = carry
            t = 0.5 * (3.0 * eye - z @ b)
            return b @ t, t @ z

        _, z = jax.lax.fori_loop(0, self.ns_iters, body, (b, z))
        inv_sqrt = z / jnp.sqrt(c)  # A^{-1/2} (symmetric up to iteration error)
        pa = inv_sqrt @ inv_sqrt.T  # A^{-1}
        w_bar = pa @ (yr @ innov_r)
        w_mat = jnp.sqrt(m1) * inv_sqrt
        return w_bar, w_mat

    def _analysis(self, ens, y_t, t):
        m_count = float(self.ensemble_size)
        g = self._obs_mean(ens, t)  # (M, d_y)
        g_bar = g.mean(axis=0)
        b = g - g_bar  # (M, d_y) obs anomalies
        x_bar = ens.mean(axis=0)
        a = ens - x_bar  # (M, d) state anomalies
        r = self._obs_cov_at_mean(ens, t)  # (d_y, d_y)

        # missing observation components are excised exactly: zero their
        # whitened anomaly/innovation columns (equivalent to deleting them)
        missing = jnp.isnan(y_t)
        obs_mask = (~missing).astype(ens.dtype)
        innov = jnp.where(missing, 0.0, y_t - g_bar)

        # step log-likelihood from the (tapered) obs-space Gaussian — same
        # estimator as the stochastic filter
        from ._masked import masked_gaussian_update

        c_yy = b.T @ b / (m_count - 1.0) + r
        c_xy = a.T @ b / (m_count - 1.0)
        if self.localization is not None:
            c_yy = c_yy * self.localization.rho_yy + r * (1.0 - self.localization.rho_yy)
            c_xy = c_xy * self.localization.rho_xy
        _, _, ll_t, _ = masked_gaussian_update(y_t, g_bar, c_xy, c_yy)

        if self.localization is None:
            # global ETKF in R^{-1/2}-whitened obs space
            r_chol = jnp.linalg.cholesky(r)
            yr = jax.scipy.linalg.solve_triangular(
                r_chol, (b * obs_mask).T, lower=True
            ).T  # (M, d_y)
            innov_r = jax.scipy.linalg.solve_triangular(r_chol, innov, lower=True)
            w_bar, w_mat = self._transform(yr, innov_r, m_count)
            ens_new = x_bar + (w_bar[None, :] + w_mat) @ a
            return ens_new, ll_t

        # LETKF: one whitened (M, M) solve per state component, observation
        # precisions scaled by the GC weights rho_xy[k] (diagonal R only)
        r_diag = jnp.diagonal(r)
        b_eff = b * obs_mask  # zero missing columns

        def local_solve(rho_k):
            w = rho_k * obs_mask / r_diag  # per-obs precision weights
            yr = b_eff * jnp.sqrt(w)  # (M, d_y) whitened by local precision
            innov_r = innov * jnp.sqrt(w)
            return self._transform(yr, innov_r, m_count)

        w_bar_k, w_mat_k = jax.vmap(local_solve)(self.localization.rho_xy)  # (d, M[, M])
        # x_a[i, k] = x̄_k + Σ_m (w̄_k[m] + W_k[i, m]) A[m, k]
        ens_new = x_bar + jnp.einsum(
            "kim,mk->ik", w_bar_k[:, None, :] + w_mat_k, a
        )
        return ens_new, ll_t

    # -- filtering ----------------------------------------------------------------
    def filter(self, key, y_t, state: EnKFState, n_transitions: int = None) -> EnKFState:
        """One forecast + deterministic analysis move (``key`` drives the
        forecast only — the update consumes no randomness)."""
        y_t = jnp.atleast_1d(jnp.asarray(y_t, jnp.float32))
        if n_transitions is None:
            n_transitions = int(self.model.observe_every_step)
        ens, t = self._forecast(key, state.ensemble, state.time_index, n_transitions)
        ens, ll_t = self._analysis(ens, y_t, t)
        return EnKFState(ens, state.log_likelihood + ll_t, t)

    def batch_filter(self, key, y) -> FilterResult:
        """Square-root ensemble filtering over the whole sequence as one
        ``lax.scan`` (time axis leading). ``batch_shape=(K,)`` vectorizes K
        independent ensembles over lane-batched model leaves (one ``jax.vmap``,
        one key per lane)."""
        if self.batch_shape:
            from ._lane import lane_vmap_batch_filter

            return lane_vmap_batch_filter(
                lambda mdl: type(self)(
                    mdl, self.ensemble_size, self.inflation, self.localization,
                    sqrt_method=self.sqrt_method, ns_iters=self.ns_iters,
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

    # -- smoothing ----------------------------------------------------------------
    def smooth(self, key, y):
        """Ensemble transform Kalman smoother: the forward pass records each
        step's (forecast, analysis) ensemble pair, the backward pass is the
        member-paired ensemble RTS shared with the stochastic filter
        (:func:`~pyfilter_tpu.filters.enkf.enrts_backward`) — the determinism
        of the ETKF analysis changes nothing about the backward identity,
        which only pairs each analysis member with its own forecast. With
        localization, the backward gain's state-state cross-covariance is
        Gaspari-Cohn tapered by ``localization.rho_xx`` (the smoother-side
        analogue of the LETKF's domain localization).
        Returns the smoothed ensemble ``(T, M, d)``."""
        from .enkf import enrts_backward

        y = jnp.asarray(y, jnp.float32)
        if y.ndim == 1:
            y = y[:, None]
        oes = int(self.model.observe_every_step)

        def forward_move(key, ens, t, y_t, n):
            fore, t = self._forecast(key, ens, t, n)
            ana, _ = self._analysis(fore, y_t, t)
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
        fores = jnp.concatenate([fore1[None], fore_rest], axis=0)
        anas = jnp.concatenate([ana1[None], ana_rest], axis=0)
        rho_xx = self.localization.rho_xx if self.localization is not None else None
        return enrts_backward(fores, anas, float(self.ensemble_size), rho_xx=rho_xx)
