"""Rao-Blackwellized PF tests: exact Kalman agreement when the nonlinear part
is degenerate, 2-D Kalman oracle when it is linear (with a measured
Rao-Blackwell variance gain over a joint bootstrap filter), and NaN skip."""

import jax
import jax.numpy as jnp
import numpy as np

import pyfilter_tpu as pf
from pyfilter_tpu import distributions as dist, timeseries as ts
from pyfilter_tpu.filters import LinearSubstructure
from pyfilter_tpu.timeseries import models

AL, BL, SL = 0.2, 0.7, 0.4   # linear block AR(1)
AN, BN, SN = 0.0, 0.9, 0.3   # nonlinear (here: also AR(1)) block
OBS_STD = 0.25


def linear_substructure(obs_offset_fn):
    return LinearSubstructure(
        trans_matrix=lambda n: jnp.array([[BL]]),
        trans_offset=lambda n: jnp.array([AL]),
        trans_cov=lambda n: jnp.array([[SL**2]]),
        obs_matrix=lambda n: jnp.array([[1.0]]),
        obs_offset=obs_offset_fn,
        obs_cov=lambda n: jnp.array([[OBS_STD**2]]),
        init_mean=jnp.array([AL]),
        init_cov=jnp.array([[SL**2]]),
    )


def test_degenerate_nonlinear_equals_kalman():
    """With a point-mass nonlinear block the RBPF IS the Kalman filter —
    loglik and linear-marginal moments must match exactly (no MC error)."""
    frozen = ts.AffineProcess(
        lambda x, s: (x.value, s),
        (0.0,),
        dist.Delta(0.0),
        lambda s: dist.Delta(0.0),
    )
    rbpf = pf.RaoBlackwellizedPF(
        frozen, linear_substructure(lambda n: jnp.array([0.0])), 16
    )

    ssm = ts.LinearStateSpaceModel(models.AR(AL, BL, SL), (1.0, OBS_STD))
    _, y = ssm.sample_states(jax.random.PRNGKey(0), 50).get_paths()
    exact = pf.KalmanFilter(ssm).batch_filter(y)
    res = rbpf.batch_filter(jax.random.PRNGKey(1), y)

    np.testing.assert_allclose(
        float(res.log_likelihood), float(exact.log_likelihood), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(res.filter_means)[:, 1], np.asarray(exact.filter_means)[:, 0],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res.filter_variances)[:, 1], np.asarray(exact.filter_variances)[:, 0],
        rtol=1e-4, atol=1e-6,
    )


def _joint_2d_ssm():
    """y = n + l + v with independent AR(1) blocks — exactly solvable by the
    2-D Kalman filter, and expressible as a joint bootstrap SSM."""
    a_mat = jnp.array([[BN, 0.0], [0.0, BL]])
    b_vec = jnp.array([AN, AL])
    s_vec = jnp.array([SN, SL])
    joint = ts.LinearModel(
        (a_mat, b_vec, s_vec),
        dist.Normal(jnp.zeros(2), jnp.ones(2)).to_event(1),
        lambda a, b, s: dist.Normal(b_vec, s_vec).to_event(1),
    )
    h = jnp.array([[1.0, 1.0]])
    return ts.StateSpaceModel(
        joint,
        lambda x: dist.Normal(x.value[..., 0] + x.value[..., 1], OBS_STD),
    ), joint, h


def _rbpf_for_joint():
    nonlinear = models.AR(AN, BN, SN)
    lin = linear_substructure(lambda n: jnp.atleast_1d(n.value))
    return pf.RaoBlackwellizedPF(nonlinear, lin, 200)


def exact_2d_loglik(y):
    a_mat = np.array([[BN, 0.0], [0.0, BL]])
    b_vec = np.array([AN, AL])
    q = np.diag([SN**2, SL**2])
    h = np.array([[1.0, 1.0]])
    r = np.array([[OBS_STD**2]])
    m = b_vec.copy()
    p = q.copy()
    ll = 0.0
    for y_t in np.asarray(y):
        m = a_mat @ m + b_vec
        p = a_mat @ p @ a_mat.T + q
        s = h @ p @ h.T + r
        innov = np.atleast_1d(y_t) - h @ m
        ll += float(
            -0.5 * (innov @ np.linalg.solve(s, innov) + np.log(np.linalg.det(s)) + np.log(2 * np.pi))
        )
        k = p @ h.T @ np.linalg.inv(s)
        m = m + k @ innov
        p = p - k @ h @ p
    return ll


def test_rbpf_matches_2d_kalman_oracle():
    ssm, _, _ = _joint_2d_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(2), 60).get_paths()
    exact = exact_2d_loglik(y)

    rbpf = _rbpf_for_joint()
    lls = [
        float(rbpf.batch_filter(jax.random.PRNGKey(10 + i), y).log_likelihood)
        for i in range(8)
    ]
    lls = np.asarray(lls)
    assert abs(lls.mean() - exact) < 4 * lls.std(ddof=1) / np.sqrt(len(lls)) + 0.3, (
        lls.mean(),
        exact,
    )


def test_rao_blackwell_variance_gain():
    """At equal N the RBPF's loglik estimator must be tighter than the joint
    bootstrap filter's — the whole point of marginalizing the linear block."""
    ssm, _, _ = _joint_2d_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(3), 60).get_paths()

    rbpf = _rbpf_for_joint()
    joint_filt = pf.SISR(ssm, 200)

    rb, joint = [], []
    for i in range(12):
        rb.append(float(rbpf.batch_filter(jax.random.PRNGKey(100 + i), y).log_likelihood))
        joint.append(
            float(joint_filt.batch_filter(jax.random.PRNGKey(100 + i), y).log_likelihood)
        )
    rb_std, joint_std = np.std(rb, ddof=1), np.std(joint, ddof=1)
    assert rb_std < joint_std, (rb_std, joint_std)


def test_rbpf_nan_skip():
    ssm, _, _ = _joint_2d_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(4), 40).get_paths()
    y = np.asarray(y).copy()
    y[10:14] = np.nan
    res = _rbpf_for_joint().batch_filter(jax.random.PRNGKey(5), jnp.asarray(y))
    assert np.isfinite(float(res.log_likelihood))
    assert np.asarray(res.step_log_likelihoods)[10:14].sum() == 0.0
    assert np.isfinite(np.asarray(res.filter_means)).all()


def test_rbpf_fused_resample_bit_matches_gather_path():
    """``fused_resample=True`` (interpret-mode expansion kernel off-TPU)
    must reproduce the counts-inversion + gather path BIT-EXACTLY — same
    scalar ``u``, bit-equal ancestors for values, conditional means AND
    covariances, so the whole pass is bit-identical."""
    ssm, _, _ = _joint_2d_ssm()
    _, y = ssm.sample_states(jax.random.PRNGKey(9), 50).get_paths()
    nonlinear = models.AR(AN, BN, SN)
    lin = linear_substructure(lambda n: jnp.atleast_1d(n.value))
    # ess_threshold > 1 forces the resample branch every step
    base = pf.RaoBlackwellizedPF(
        nonlinear, lin, 256, ess_threshold=1.1, fused_resample=False
    ).batch_filter(jax.random.PRNGKey(10), y)
    fused = pf.RaoBlackwellizedPF(
        nonlinear, lin, 256, ess_threshold=1.1, fused_resample=True
    ).batch_filter(jax.random.PRNGKey(10), y)
    np.testing.assert_array_equal(
        np.asarray(base.log_likelihood), np.asarray(fused.log_likelihood)
    )
    np.testing.assert_array_equal(
        np.asarray(base.filter_means), np.asarray(fused.filter_means)
    )
