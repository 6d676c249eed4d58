"""Distributed EnKF tests on the virtual 8-device CPU mesh: convergence to
the exact Kalman filter, and HLO-asserted communication (psum-only — the
EnKF's cross-member coupling is sample moments, so there must be NO
all-gather anywhere)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
from pyfilter_tpu import parallel, timeseries as ts
from pyfilter_tpu.timeseries import models


def _model():
    return ts.LinearStateSpaceModel(models.AR(0.2, 0.7, 0.4), (1.0, 0.25))


def test_spmd_enkf_converges_to_kalman():
    mesh = parallel.make_mesh()
    assert mesh.shape == {"particles": 8}
    ssm = _model()
    _, y = ssm.sample_states(jax.random.PRNGKey(0), 60).get_paths()

    res = parallel.spmd_enkf(ssm, 4000, jax.random.PRNGKey(1), y, mesh)
    exact = pf.KalmanFilter(ssm).batch_filter(y)

    assert abs(float(res.log_likelihood) - float(exact.log_likelihood)) < 1.0
    np.testing.assert_allclose(
        np.asarray(res.filter_means), np.asarray(exact.filter_means), atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(res.filter_variances),
        np.asarray(exact.filter_variances),
        rtol=0.15,
    )
    # the final ensemble stays sharded over the mesh axis
    shard_shapes = {s.data.shape for s in res.latest_state.ensemble.addressable_shards}
    assert shard_shapes == {(500, 1)}


def test_spmd_enkf_hlo_is_psum_only():
    """Compiled steady state: all-reduces for the moment reductions, ZERO
    all-gathers / permutes — the O(d·d_y)-communication claim, asserted on
    the HLO rather than assumed."""
    from pyfilter_tpu.parallel.enkf import _jitted_spmd_enkf

    mesh = parallel.make_mesh()
    ssm = _model()
    _, y = ssm.sample_states(jax.random.PRNGKey(2), 20).get_paths()
    f = _jitted_spmd_enkf(mesh, "particles", 1024, 1.0)
    txt = f.lower(
        ssm, jax.random.PRNGKey(3), jnp.asarray(y)[:, None], None
    ).compile().as_text()
    assert "all-reduce" in txt
    assert "all-gather" not in txt
    assert "all-to-all" not in txt
    assert "collective-permute" not in txt


def test_spmd_enkf_model_update_is_cache_hit():
    """New parameters ride the same executable (model is a pytree argument)."""
    from pyfilter_tpu.parallel.enkf import _jitted_spmd_enkf

    mesh = parallel.make_mesh()
    ssm = _model()
    _, y = ssm.sample_states(jax.random.PRNGKey(4), 30).get_paths()
    f1 = _jitted_spmd_enkf(mesh, "particles", 512, 1.0)
    f2 = _jitted_spmd_enkf(mesh, "particles", 512, 1.0)
    assert f1 is f2
    r1 = parallel.spmd_enkf(ssm, 512, jax.random.PRNGKey(5), y, mesh)
    ssm2 = ts.LinearStateSpaceModel(models.AR(0.1, 0.5, 0.3), (1.0, 0.25))
    r2 = parallel.spmd_enkf(ssm2, 512, jax.random.PRNGKey(5), y, mesh)
    assert np.isfinite(float(r1.log_likelihood)) and np.isfinite(float(r2.log_likelihood))
    assert float(r1.log_likelihood) != float(r2.log_likelihood)


def test_spmd_enkf_rejects_indivisible_ensemble():
    mesh = parallel.make_mesh()
    with pytest.raises(ValueError, match="divide"):
        parallel.spmd_enkf(
            _model(), 1001, jax.random.PRNGKey(6), jnp.zeros(5), mesh
        )
