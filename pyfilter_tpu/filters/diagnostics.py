"""Predictive model criticism for filters — PIT and CRPS.

New capability beyond the reference (whose only residual tool is the
``Standardizer`` collector, pyfilter/inference/sequential/collectors.py):
one-step-ahead probability integral transforms (Dawid 1984; Diebold,
Gunther & Tay 1998 — under a well-specified model the PIT values are iid
Uniform(0,1)) and the continuous ranked probability score (Gneiting &
Raftery 2007, sample-based estimator) evaluated from a recorded filtering
pass. Both are computed from the PARTICLE PREDICTIVE — the t-1 cloud pushed
through the transition — so they score genuine out-of-sample one-step
forecasts, vmapped over time in one compiled call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..timeseries import TimeseriesState
from ..utils import normalize
from .result import FilterHistory, FilterResult


def _history(states, n_obs: int) -> FilterHistory:
    hist = states.states if isinstance(states, FilterResult) else states
    if hist is None:
        raise ValueError("predictive diagnostics need record_states=True")
    if hist.values.shape[0] != n_obs + 1:
        raise ValueError(
            f"history has {hist.values.shape[0]} recorded states for {n_obs} "
            "observations — pass a record_states=True (NOT record_intermediary) "
            "history whose entries align one-to-one with the observations"
        )
    return hist


def _per_step(model, fn, key, hist: FilterHistory, y):
    """vmap ``fn`` over the observation index, propagating each t-1 cloud to
    its observation time: ONE transition for the first observation (the
    filters' ``first_step`` timing) and ``observe_every_step`` afterwards."""
    oes = int(model.observe_every_step)
    n_obs = y.shape[0]
    keys = jax.random.split(key, n_obs)

    run = jax.jit(jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, None)), static_argnums=(5,))
    if oes == 1:
        return run(keys, hist.values[:n_obs], hist.log_weights[:n_obs],
                   hist.time_indexes[:n_obs], y, 1)
    first = jax.jit(fn, static_argnums=(5,))(
        keys[0], hist.values[0], hist.log_weights[0], hist.time_indexes[0], y[0], 1
    )
    rest = run(keys[1:], hist.values[1:n_obs], hist.log_weights[1:n_obs],
               hist.time_indexes[1:n_obs], y[1:], oes)
    return jnp.concatenate([first[None], rest], axis=0)


def predictive_pit(key, model, states, y) -> jax.Array:
    """One-step-ahead PIT values ``u_t = Σ_k w̄_{t-1,k} F(y_t | x_t^k)``
    where ``x_t^k`` propagates the recorded t-1 cloud through the model's
    transition (``observe_every_step`` sub-steps included).

    ``states``: a ``FilterResult`` from ``batch_filter(..., record_states=True)``
    (or its ``FilterHistory``). Returns ``(T,)`` PIT values for scalar
    observations (or ``(T, d_y)`` per-margin values when the observation
    density's ``cdf`` is elementwise). Under the data-generating model the
    values are iid Uniform(0,1) — histogram them (U-shape: predictive too
    narrow; hump: too wide; slope: biased)."""
    y = jnp.asarray(y)
    hist = _history(states, y.shape[0])
    ev = int(model.hidden.event_ndim)

    def one(k, v_prev, lw_prev, t_prev, y_t, n_sub):
        st = TimeseriesState(t_prev, v_prev, ev)
        st = model.hidden.propagate_substeps(k, st, n_sub)
        u = model.build_density(st).cdf(y_t)  # (N, ...) per-particle CDFs
        w = normalize(lw_prev)
        return jnp.tensordot(w, u, axes=(0, 0))

    return _per_step(model, one, key, hist, y)


def crps(key, model, states, y) -> jax.Array:
    """Per-step continuous ranked probability scores of the one-step-ahead
    particle predictive: the weighted sample estimator

    ``CRPS_t = Σ_k w_k |s_k - y_t| - ½ Σ_{jk} w_j w_k |s_j - s_k|``

    with one simulated observation ``s_k ~ p(y_t | x_t^k)`` per particle
    (O(N²) pairwise term — MXU-shaped; keep N moderate or thin the cloud
    first). Scalar observations; returns ``(T,)`` (lower is better, proper)."""
    y = jnp.asarray(y)
    hist = _history(states, y.shape[0])
    ev = int(model.hidden.event_ndim)

    def one(k, v_prev, lw_prev, t_prev, y_t, n_sub):
        k_prop, k_obs = jax.random.split(k)
        st = TimeseriesState(t_prev, v_prev, ev)
        st = model.hidden.propagate_substeps(k_prop, st, n_sub)
        s = jnp.squeeze(jnp.asarray(model.build_density(st).sample(k_obs)))  # (N,)
        w = normalize(lw_prev)
        e_xy = jnp.sum(w * jnp.abs(s - y_t))
        e_xx = jnp.einsum("j,k,jk->", w, w, jnp.abs(s[:, None] - s[None, :]))
        return e_xy - 0.5 * e_xx

    return _per_step(model, one, key, hist, y)
