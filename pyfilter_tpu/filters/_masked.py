"""Shared masked Gaussian measurement update for the Gaussian filter family.

Exact per-component missing-data handling: a NaN observation component is
marginalized out of the update (the reference never implemented partial-NaN
handling — its filters skip only all-NaN observations,
reference filters/base.py:212-216 with the partial-NaN TODO at 212).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def density_covariance(density, d: int) -> jax.Array:
    """Full ``(d, d)`` noise covariance of a Gaussian(-moment) density.

    Uses the density's exact ``covariance_matrix`` when it exposes one
    (:class:`MultivariateNormal` — correlated noise is preserved); otherwise
    builds the diagonal from ``variance``. Callers evaluate at a single point
    (the running mean); any leading length-1 batch axes are collapsed.

    Before round 4 the Gaussian family did ``jnp.diag(density.variance)``
    unconditionally, silently replacing a full MVN transition/observation
    covariance by its marginals.
    """
    cov = getattr(density, "covariance_matrix", None)
    if cov is not None:
        cov = jnp.asarray(cov)
        return cov.reshape((-1,) + cov.shape[-2:])[0]
    v = jnp.asarray(density.variance)
    return jnp.diag(v.reshape(-1)[:d])


def initial_gaussian_moments(init, d: int) -> tuple[jax.Array, jax.Array]:
    """``(m0, P0)`` of an initial distribution, full covariance preserved.

    Mean is broadcast to ``(d,)`` (scalar initial kernels over vector states);
    the covariance is the exact ``covariance_matrix`` when exposed (MVN),
    ``diag(variance)`` otherwise.
    """
    m0 = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(init.mean, jnp.float32)), (d,))
    cov = getattr(init, "covariance_matrix", None)
    if cov is not None:
        p0 = jnp.asarray(cov, jnp.float32).reshape((-1, d, d))[0]
    else:
        v0 = jnp.broadcast_to(
            jnp.atleast_1d(jnp.asarray(init.variance, jnp.float32)), (d,)
        )
        p0 = jnp.diag(v0)
    return m0, p0


def masked_gaussian_update(y_t, y_hat, c_xy, s_mat):
    """Kalman-type measurement update with per-component NaN marginalization.

    Missing components are excised by masking: the cross-covariance columns
    and innovation-covariance rows/columns of NaN slots are zeroed, with a
    unit diagonal in their place — algebraically identical to deleting those
    rows from the observation operator (the exact sub-filter over the
    observed components), while keeping static shapes for jit.

    Returns ``(gain, innov, ll_t, s_eff)`` where ``ll_t`` is the exact
    marginal log-density of the OBSERVED components (their count replaces
    ``d_y`` in the normalizer and the masked slots contribute 0 to the
    log-determinant). Update the moments as ``m + gain @ innov`` and
    ``p - gain @ s_eff @ gain.T``. With every component missing the gain and
    innovation are zero and ``ll_t == 0`` — the all-NaN skip falls out with
    no extra gating.
    """
    missing = jnp.isnan(y_t)
    obs = (~missing).astype(s_mat.dtype)
    innov = jnp.where(missing, 0.0, y_t - y_hat)
    s_eff = s_mat * obs[:, None] * obs[None, :] + jnp.diag(1.0 - obs)
    c_eff = c_xy * obs[None, :]

    chol = jnp.linalg.cholesky(s_eff)
    gain = c_eff @ jax.scipy.linalg.cho_solve((chol, True), jnp.eye(y_t.shape[-1]))
    solved = jax.scipy.linalg.cho_solve((chol, True), innov)
    log_det = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    ll_t = -0.5 * (innov @ solved + log_det + obs.sum() * math.log(2.0 * math.pi))
    return gain, innov, ll_t, s_eff
