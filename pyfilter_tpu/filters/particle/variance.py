"""Single-run genealogy-based variance estimators for particle filters.

Estimate the Monte-Carlo variance of particle-filter outputs — the marginal
log-likelihood estimate and the filter means — from ONE filtering pass, using
the recorded ancestry (:class:`~pyfilter_tpu.filters.result.FilterHistory`
``prev_indices``) instead of expensive replicate runs.

Algorithms:

- Chan & Lai (2013, Ann. Stat. 41(6)) / Lee & Whiteley (2018, Biometrika
  105(3)): for each particle at time ``t``, trace its "Eve" — the time-0
  ancestor. The asymptotic variance of ``eta_t^N(phi) = sum_i W_t^i
  phi(x_t^i)`` is consistently estimated by

      sigma2_t(phi) = N * sum_j ( sum_{i: E_t^i = j} W_t^i
                                  (phi(x_t^i) - eta_t^N(phi)) )^2

  and the relative variance of the likelihood estimate ``L_t^N`` by

      v_t = N * sum_j ( sum_{i: E_t^i = j} W_t^i )^2  -  1,

  so that ``Var(eta_t^N(phi)) ~ sigma2_t / N`` and ``Var(log L_t^N) ~
  v_t / N`` (delta method; the practical quantity for tuning PMMH's particle
  count to the Doucet–Pitt–Deligiannidis ``Var(log L) ~ 1`` sweet spot).

- Olsson & Douc (2019, Bernoulli 25(2)) fixed-lag variant: replace the
  time-0 Eve with the ancestor ``lag`` generations back. The full-Eve
  estimator degenerates once the genealogy coalesces (all particles share
  one Eve — inevitable as ``t`` grows at fixed ``N``); the lag-truncated
  estimator stays stable at the price of a truncation bias, mirroring
  fixed-lag smoothing.

The estimators are exact theory under multinomial resampling at every step;
under the library defaults (adaptive ESS-gated systematic resampling) they
are the standard practical approximation — the realized genealogy is what is
traced either way (tests/test_variance.py checks both regimes against
replicate ground truth).

This is a beyond-reference capability: tingiskhan/pyfilter records ancestor
indices (reference filters/particle/state.py:87 ``_prev_inds``) but offers
no variance estimation; the capability axis matches the ``var_est``
collectors of nchopin/particles. TPU notes: everything is ``lax.scan`` +
``segment_sum`` (one scatter-add of N rows per step — no O(N^2) pairwise
term), jit-safe, lane-batched over ``(N, *batch)`` clouds.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from ...utils import batched_gather, normalize
from ..result import FilterHistory, FilterResult


class VarianceEstimate(NamedTuple):
    """Per-step genealogy variance estimates.

    ``sigma2`` is the asymptotic-variance estimate (the CLT constant);
    ``variance = sigma2 / N`` is the implied variance of the estimator
    itself at the run's particle count. ``n_unique_ancestors`` counts the
    distinct Eve (or lag-ancestor) indices per step — a degeneracy
    diagnostic: once it hits 1 the (full-Eve) estimator has collapsed and a
    ``lag`` (or more particles) is needed.
    """

    sigma2: jax.Array
    variance: jax.Array
    n_unique_ancestors: jax.Array


def _history_of(states: Union[FilterResult, FilterHistory]) -> FilterHistory:
    history = states.states if isinstance(states, FilterResult) else states
    if history is None:
        raise ValueError(
            "variance estimation requires record_states=True on the filter"
        )
    return history


def eve_indices(prev_indices: jax.Array) -> jax.Array:
    """Time-0 ("Eve") ancestor index of every particle after every step.

    ``prev_indices`` is the stacked ancestry ``(T, N, *batch)`` — at step
    ``t``, particle ``i``'s parent in the step-``t-1`` cloud. Returns the
    same-shaped array of indices into the INITIAL cloud, computed by one
    forward ``lax.scan`` composing the maps (O(T·N) gathers total).
    """
    prev = jnp.asarray(prev_indices)
    n = prev.shape[1]
    ident = jnp.broadcast_to(
        jnp.arange(n, dtype=prev.dtype).reshape((n,) + (1,) * (prev.ndim - 2)),
        prev.shape[1:],
    )

    def step(carry, a_t):
        # carry maps "index in cloud t-1" -> "index at time 0"
        e_t = batched_gather(carry, a_t, 0)
        return e_t, e_t

    _, eves = jax.lax.scan(step, ident, prev)
    return eves


def lag_ancestor_indices(prev_indices: jax.Array, lag: int) -> jax.Array:
    """Ancestor index ``lag`` generations back for every particle/step.

    At step ``t`` the returned index points into the cloud at step
    ``max(t - lag, initial)`` — the windowed composition of the last ``lag``
    ancestry maps (identity padding before step 0). O(T·lag·N) gathers.
    """
    if lag < 1:
        raise ValueError("lag must be >= 1")
    prev = jnp.asarray(prev_indices)
    t_total = prev.shape[0]
    lag = min(int(lag), t_total)

    def per_step(t):
        idx = prev[t]
        def body(s, idx):
            # step back one more generation while t - s >= 0
            a = jax.lax.dynamic_index_in_dim(prev, t - s, axis=0, keepdims=False)
            stepped = batched_gather(a, idx, 0)
            return jnp.where(t - s >= 0, stepped, idx)
        return jax.lax.fori_loop(1, lag, body, idx)

    return jax.vmap(per_step)(jnp.arange(t_total))


def _segment_square_sum(contrib: jax.Array, ancestors: jax.Array):
    """``sum_j (sum_{i: E_i = j} c_i)^2`` plus the unique-ancestor count.

    ``contrib``/``ancestors``: ``(N, *batch[, *event])`` / ``(N, *batch)``.
    Lanes (and trailing event components of ``contrib``) are handled by
    flattening into the segment id — one scatter-add total.
    """
    n = contrib.shape[0]
    lanes = ancestors.shape[1:]
    l_total = 1
    for d in lanes:
        l_total *= int(d)
    ev_shape = contrib.shape[1 + len(lanes):]

    anc = ancestors.reshape(n, l_total)
    lane_ids = jnp.arange(l_total, dtype=anc.dtype)
    ids = (anc * l_total + lane_ids).reshape(-1)  # (N*L,)

    c = contrib.reshape((n * l_total,) + ev_shape)
    sums = jax.ops.segment_sum(c, ids, num_segments=n * l_total)
    sq = jnp.sum(
        jnp.square(sums.reshape((n, l_total) + ev_shape)), axis=0
    ).reshape(lanes + ev_shape)

    occupied = jax.ops.segment_sum(
        jnp.ones((n * l_total,), jnp.int32), ids, num_segments=n * l_total
    )
    n_unique = jnp.sum(
        (occupied > 0).reshape(n, l_total), axis=0, dtype=jnp.int32
    ).reshape(lanes)
    return sq, n_unique


def _ancestors_for(history: FilterHistory, lag: Optional[int]) -> jax.Array:
    if lag is None:
        return eve_indices(history.prev_indices)
    return lag_ancestor_indices(history.prev_indices, lag)


def log_likelihood_variance(
    states: Union[FilterResult, FilterHistory], lag: Optional[int] = None
) -> VarianceEstimate:
    """Variance of the log-likelihood estimate, from one run's genealogy.

    Returns per-step estimates aligned with the recorded history — shape
    ``(T+1, *batch)``, index 0 the initial cloud (estimate 0), index ``t``
    the ``t``-th observation step: ``sigma2[t]`` estimates
    ``N·Var(L_t^N)/L_t^2`` and ``variance[t] = sigma2[t]/N ~
    Var(log L_t^N)`` — the cumulative (not per-step-increment) quantity.
    ``lag=None`` is the full Chan–Lai/Lee–Whiteley Eve estimator; an integer
    ``lag`` gives the Olsson–Douc truncated estimator — stable under
    genealogy coalescence but it only captures variance accumulated within
    the lag window (expect it well below the full estimator when
    ``lag << T``).
    """
    history = _history_of(states)
    n = history.prev_indices.shape[1]
    w = normalize(history.log_weights, axis=1)  # (T, N, *batch)
    ancestors = _ancestors_for(history, lag)

    def step(_, inp):
        w_t, e_t = inp
        sq, n_unique = _segment_square_sum(w_t, e_t)
        return None, (n * sq - 1.0, n_unique)

    _, (sigma2, n_unique) = jax.lax.scan(step, None, (w, ancestors))
    return VarianceEstimate(sigma2, sigma2 / n, n_unique)


def filter_mean_variance(
    states: Union[FilterResult, FilterHistory],
    lag: Optional[int] = None,
    event_ndim: int = None,
) -> VarianceEstimate:
    """Variance of the per-step filter means, from one run's genealogy.

    ``sigma2`` has shape ``(T+1, *batch, *event)`` (per state component,
    aligned with the recorded history — index 0 is the initial cloud, so
    ``variance[t+1]`` matches ``FilterResult.filter_means[t]``):
    the Chan–Lai estimate of the asymptotic variance of
    ``eta_t^N(x) = sum_i W_t^i x_t^i``; ``variance = sigma2/N`` estimates
    ``Var(filter_mean[t])``. ``event_ndim`` (0 or 1) is inferred from the
    recorded arrays when omitted.
    """
    history = _history_of(states)
    n = history.prev_indices.shape[1]
    w = normalize(history.log_weights, axis=1)  # (T, N, *batch)
    values = history.values  # (T, N, *batch, *event)
    if event_ndim is None:
        event_ndim = values.ndim - w.ndim
    if event_ndim not in (0, 1):
        raise ValueError("event_ndim must be 0 or 1")
    ancestors = _ancestors_for(history, lag)

    w_ev = w[..., None] if event_ndim else w

    def step(_, inp):
        we_t, x_t, e_t = inp
        mean_t = jnp.sum(we_t * x_t, axis=0)
        contrib = we_t * (x_t - mean_t)
        sq, n_unique = _segment_square_sum(contrib, e_t)
        return None, (n * sq, n_unique)

    _, (sigma2, n_unique) = jax.lax.scan(step, None, (w_ev, values, ancestors))
    return VarianceEstimate(sigma2, sigma2 / n, n_unique)
