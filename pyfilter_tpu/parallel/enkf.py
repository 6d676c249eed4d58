"""Distributed ensemble Kalman filtering — the cheapest scaling story in the
framework.

The EnKF's ONLY cross-member coupling is through sample moments: the
ensemble mean and the (d, d_y)/(d_y, d_y) anomaly products. Sharding the
ensemble axis over a mesh therefore costs O(d·d_y) of ``psum`` per step —
independent of the ensemble size M — with no resampling exchange at all
(contrast the particle filters, whose resample needs a halo/all-gather;
parallel/spmd.py). Forecasts are embarrassingly parallel ``propagate`` calls
on the local shard; the gain solve is a replicated d_y×d_y Cholesky.

Single-device semantics: :class:`pyfilter_tpu.filters.EnsembleKalmanFilter`
(stochastic perturbed-observation EnKF, filters/enkf.py). Communication is
HLO-asserted in tests, not assumed (tests/test_parallel_enkf.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..filters._masked import density_covariance, masked_gaussian_update
from ..filters.enkf import EnKFState
from ..filters.result import FilterResult
from ..timeseries import TimeseriesState


def spmd_enkf_loop(
    model,
    ensemble_size: int,
    key,
    y,
    axis_name: str,
    inflation: float = 1.0,
    localization=None,
):
    """Per-device EnKF body (call inside ``shard_map``): each device carries
    ``M/P`` members; means and anomaly products are ``psum``-reduced, the
    analysis gain is computed replicated, and members update locally."""
    hidden = model.hidden
    ev = int(hidden.event_ndim)
    init = hidden.initial_distribution()
    d_x = int(init.event_shape[0]) if ev == 1 else 1
    d_y = int(model.event_shape[0]) if model.event_shape else 1
    oes = int(model.observe_every_step)
    m_global = int(ensemble_size)

    def state_of(ens, t):
        return TimeseriesState(t, ens if ev == 1 else ens[..., 0], ev)

    def lift(values):
        v = jnp.asarray(values, jnp.float32)
        return v if ev == 1 else v[..., None]

    def gmean(x):
        # global ensemble mean of a (M/P, ...) local block
        return jax.lax.psum(x.sum(axis=0), axis_name) / m_global

    def forecast(k, ens, t, n):
        st = hidden.propagate_substeps(k, state_of(ens, t), n)
        ens = lift(st.value)
        if inflation != 1.0:
            m = gmean(ens)
            ens = m + inflation * (ens - m)
        return ens, st.time_index

    def analysis(k, ens, y_t, t):
        g = jnp.asarray(model.build_density(state_of(ens, t)).mean)
        g = g[:, None] if g.ndim == 1 else g  # (M/P, d_y)
        g_bar = gmean(g)
        b = g - g_bar
        mean_x = gmean(ens)
        a = ens - mean_x

        # observation noise at the (replicated) global mean state — full MVN
        # covariance when the density exposes one, diag(variance) otherwise
        d_mean = model.build_density(state_of(mean_x[None], t))
        r = density_covariance(d_mean, d_y)

        c_yy = jax.lax.psum(b.T @ b, axis_name) / (m_global - 1) + r
        c_xy = jax.lax.psum(a.T @ b, axis_name) / (m_global - 1)
        if localization is not None:
            # Gaspari-Cohn Schur taper of the sample parts, applied AFTER the
            # psum on replicated (d, d_y)/(d_y, d_y) products — elementwise,
            # so the psum-only communication story is unchanged
            c_yy = c_yy * localization.rho_yy + r * (1.0 - localization.rho_yy)
            c_xy = c_xy * localization.rho_xy

        # partial-NaN components are exactly marginalized (zero gain columns;
        # all-NaN skip is the degenerate case — zero gain, ll_t == 0)
        k_gain, _, ll_t, _ = masked_gaussian_update(y_t, g_bar, c_xy, c_yy)

        eps = jax.random.normal(k, g.shape, g.dtype) @ jnp.linalg.cholesky(r).T
        y_safe = jnp.where(jnp.isnan(y_t), 0.0, y_t)
        ens_new = ens + (y_safe + eps - g) @ k_gain.T
        return ens_new, ll_t

    def moments(ens):
        m = gmean(ens)
        v = jax.lax.psum(jnp.square(ens - m).sum(axis=0), axis_name) / (m_global - 1)
        return m, v

    def move(k, ens, t, y_t, n):
        k_fore, k_ana = jax.random.split(k)
        ens, t = forecast(k_fore, ens, t, n)
        ens, ll_t = analysis(k_ana, ens, y_t, t)
        return ens, t, ll_t

    # per-device member streams: fold the axis index into the key
    key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
    k_init, k0, k_scan = jax.random.split(key, 3)
    p = jax.lax.axis_size(axis_name)
    ens = lift(hidden.initial_sample(k_init, (m_global // p,)).value)

    ens, t, ll0 = move(k0, ens, jnp.asarray(0.0), y[0], 1)
    m0, v0 = moments(ens)

    def step(carry, inp):
        ens, t = carry
        k, y_t = inp
        ens, t, ll_t = move(k, ens, t, y_t, oes)
        m, v = moments(ens)
        return (ens, t), (ll_t, m, v)

    keys = jax.random.split(k_scan, y.shape[0] - 1)
    (ens, _), (lls, means, variances) = jax.lax.scan(step, (ens, t), (keys, y[1:]))

    step_lls = jnp.concatenate([ll0[None], lls])
    means = jnp.concatenate([m0[None], means])
    variances = jnp.concatenate([v0[None], variances])
    return ens, step_lls, means, variances


def spmd_enkf(
    model,
    ensemble_size: int,
    key,
    y,
    mesh: Mesh,
    axis_name: str = "particles",
    inflation: float = 1.0,
    localization=None,
) -> FilterResult:
    """Full EnKF pass with the ensemble axis sharded over ``mesh``.

    ``ensemble_size`` is the GLOBAL member count (must divide the mesh axis).
    Communication per step: two psums of O(d·d_y) anomaly products + O(d)
    means — no all-gather, no resampling exchange. Returns the same
    :class:`FilterResult` surface as the single-device
    ``EnsembleKalmanFilter.batch_filter``."""
    p = mesh.shape[axis_name]
    if ensemble_size % p:
        raise ValueError(f"ensemble_size {ensemble_size} must divide mesh axis size {p}")

    f = _jitted_spmd_enkf(mesh, axis_name, int(ensemble_size), float(inflation))
    y = jnp.asarray(y, jnp.float32)
    if y.ndim == 1:
        y = y[:, None]
    ens, step_lls, means, variances = f(model, key, y, localization)
    return FilterResult(
        log_likelihood=step_lls.sum(),
        step_log_likelihoods=step_lls,
        filter_means=means,
        filter_variances=variances,
        latest_state=EnKFState(ens, step_lls.sum(), jnp.asarray(float(y.shape[0]))),
        states=None,
    )


@functools.lru_cache(maxsize=None)
def _jitted_spmd_enkf(mesh, axis_name, ensemble_size, inflation):
    """One compiled executable per (mesh, config); the model is a replicated
    pytree ARGUMENT (parameter updates never recompile — repo invariant)."""

    def run(model, key, y, localization):
        return spmd_enkf_loop(
            model,
            ensemble_size,
            key,
            y,
            axis_name=axis_name,
            inflation=inflation,
            localization=localization,
        )

    return jax.jit(
        shard_map(
            run,
            mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=(P(axis_name), P(), P(), P()),
        )
    )
