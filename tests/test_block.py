"""Block particle filter (Rebeschini-van Handel localized resampling).

Correctness instrument: with a DIAGONAL transition (independent scalar
chains) and per-component observations, the block filter at block_size=1 is
exactly a bank of independent bootstrap filters — the d-dim Kalman oracle
factorizes, so loglik and filter means must match the per-dim exact values.
The capability test is the high-dimensional one: at d=32 the global
bootstrap filter's weights collapse while the block filter keeps per-block
ESS bounded and halves the state RMSE.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyfilter_tpu import timeseries as ts, distributions as dist
from pyfilter_tpu.filters import BlockParticleFilter
from pyfilter_tpu.filters.particle import SISR
from pyfilter_tpu.timeseries import models

from kalman import KalmanFilter as NumpyKalman

ALPHA, BETA, SIGMA, OBS_STD = 0.15, 0.8, 0.35, 0.3


def ring_ssm(d, mix=0.2, decay=0.9, q_std=SIGMA, obs_std=OBS_STD):
    """Locally-coupled linear ring (the test_etkf.py localization workload);
    mix=0 makes the dims exactly independent."""

    def mean_scale(x, decay_, mix_, q_):
        v = x.value
        neigh = 0.5 * (jnp.roll(v, 1, axis=-1) + jnp.roll(v, -1, axis=-1))
        return decay_ * ((1.0 - mix_) * v + mix_ * neigh), q_

    hidden = ts.AffineProcess(
        mean_scale,
        (jnp.asarray(decay), jnp.asarray(mix), jnp.asarray(q_std)),
        dist.Normal(jnp.zeros(d), jnp.ones(d)).to_event(1),
        lambda *_: dist.Normal(jnp.zeros(d), jnp.ones(d)).to_event(1),
    )
    return ts.LinearStateSpaceModel(hidden, (1.0, obs_std), event_shape=(d,))


def simulate(ssm, t, seed):
    x, y = ssm.sample_states(jax.random.PRNGKey(seed), t).get_paths()
    return np.asarray(x), jnp.asarray(y)


def test_block_size_one_matches_factorized_kalman():
    """Independent chains: block PF == bank of exact per-dim filters."""
    d, t_len, n = 6, 40, 3000
    ssm = ring_ssm(d, mix=0.0)
    x, y = simulate(ssm, t_len, seed=3)

    filt = BlockParticleFilter(ssm, n, block_size=1)
    res = filt.batch_filter(jax.random.PRNGKey(1), y)

    # factorized oracle: scalar Kalman per dim on decoupled dynamics
    ll_sum, means = 0.0, []
    for k in range(d):
        kf = NumpyKalman(
            [[0.9]], [[1.0]], [[SIGMA**2]], [[OBS_STD**2]],
            initial_state_mean=[0.0], initial_state_covariance=[[1.0]],
        )
        fm, _, ll_k = kf.filter(np.asarray(y)[:, k])
        ll_sum += ll_k
        means.append(fm[:, 0])
    means = np.stack(means, axis=-1)

    got_ll = float(res.log_likelihood)
    assert abs(got_ll - ll_sum) / abs(ll_sum) < 0.01, (got_ll, ll_sum)
    rel = np.abs(np.asarray(res.filter_means) - means) / (np.abs(means) + 1e-2)
    assert np.median(rel) < 0.1
    # every block fully observed every step -> ESS recorded in (0, 1]
    ess = np.asarray(res.aux)
    assert ess.shape == (t_len, d)
    assert (ess > 0).all() and (ess <= 1.0 + 1e-6).all()


def test_block_filter_beats_global_bootstrap_in_high_dim():
    """d=32 coupled ring, N=256: the global bootstrap collapses (max-weight
    takeover), the block filter stays healthy and is strictly more accurate."""
    d, t_len, n = 32, 30, 256
    ssm = ring_ssm(d, mix=0.2)
    x, y = simulate(ssm, t_len, seed=11)

    bpf = BlockParticleFilter(ssm, n, block_size=2)
    res_b = bpf.batch_filter(jax.random.PRNGKey(2), y)

    sisr = SISR(ssm, n, fused_resample=False)
    res_s = sisr.batch_filter(jax.random.PRNGKey(2), y)

    rmse_b = float(jnp.sqrt(jnp.mean((res_b.filter_means - x) ** 2)))
    rmse_s = float(jnp.sqrt(jnp.mean((res_s.filter_means - x) ** 2)))
    # the blocked filter tracks; the global one inherits prior-scale error
    assert rmse_b < 0.75 * rmse_s, (rmse_b, rmse_s)
    assert rmse_b < 2.0 * OBS_STD
    # localized resampling keeps per-block ESS bounded away from degeneracy
    assert float(jnp.mean(res_b.aux)) > 0.3


def test_partial_and_full_nan_observations():
    d, t_len = 4, 12
    ssm = ring_ssm(d, mix=0.0)
    _, y = simulate(ssm, t_len, seed=5)
    y = np.array(y)
    y[3, :2] = np.nan      # half the components missing
    y[7, :] = np.nan       # fully missing step
    y = jnp.asarray(y)

    filt = BlockParticleFilter(ssm, 500, block_size=2)
    res = filt.batch_filter(jax.random.PRNGKey(0), y)
    assert np.isfinite(float(res.log_likelihood))
    # fully-missing step contributes exactly zero log-likelihood
    np.testing.assert_allclose(float(res.step_log_likelihoods[7]), 0.0, atol=1e-6)
    # unobserved blocks report ESS 1 (no resample) at the all-NaN step
    np.testing.assert_allclose(np.asarray(res.aux)[7], 1.0, atol=1e-5)


def test_explicit_blocks_match_contiguous_and_permuted_runs():
    d = 4
    ssm = ring_ssm(d, mix=0.0)
    _, y = simulate(ssm, 10, seed=8)

    a = BlockParticleFilter(ssm, 200, block_size=2)
    b = BlockParticleFilter(ssm, 200, blocks=((0, 1), (2, 3)))
    res_a = a.batch_filter(jax.random.PRNGKey(4), y)
    res_b = b.batch_filter(jax.random.PRNGKey(4), y)
    np.testing.assert_allclose(
        np.asarray(res_a.filter_means), np.asarray(res_b.filter_means), rtol=1e-5
    )

    c = BlockParticleFilter(ssm, 200, blocks=((0, 2), (1, 3)))
    res_c = c.batch_filter(jax.random.PRNGKey(4), y)
    assert np.isfinite(float(res_c.log_likelihood))
    assert res_c.filter_means.shape == res_a.filter_means.shape


def test_validation_errors():
    ssm = ring_ssm(4, mix=0.0)
    with pytest.raises(ValueError, match="block_size"):
        BlockParticleFilter(ssm, 10, block_size=3)
    with pytest.raises(ValueError, match="exactly one"):
        BlockParticleFilter(ssm, 10)
    with pytest.raises(ValueError, match="partition"):
        BlockParticleFilter(ssm, 10, blocks=((0, 1), (1, 2)))
    scalar = ts.LinearStateSpaceModel(models.AR(0.1, 0.5, 0.3), (1.0, 0.2))
    with pytest.raises(ValueError, match="vector state"):
        BlockParticleFilter(scalar, 10, block_size=1)


def test_sharded_step_is_block_local():
    """Shard the d axis over the 8-device mesh (block boundaries aligned to
    shard boundaries): the compiled step must carry NO all-gather or
    all-to-all — the per-block resample+gather partitions locally; the only
    collectives are the model's own roll() halo (collective-permute) and
    scalar all-reduces for the log-likelihood/normalization terms."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    d, n = 16, 256
    ssm = ring_ssm(d, mix=0.2)
    filt = BlockParticleFilter(ssm, n, block_size=2)

    mesh = Mesh(np.array(jax.devices()), ("d",))
    state = filt.initialize(jax.random.PRNGKey(0))
    state = state._replace(
        values=jax.device_put(state.values, NamedSharding(mesh, P(None, "d")))
    )
    y_t = jax.device_put(
        jnp.full((d,), 0.3, jnp.float32), NamedSharding(mesh, P("d"))
    )

    step = jax.jit(lambda k, y, s: filt.filter(k, y, s))
    txt = step.lower(jax.random.PRNGKey(1), y_t, state).compile().as_text()
    assert txt.count("all-gather") == 0, "state-sized gather leaked into the step"
    assert txt.count("all-to-all") == 0

    out = step(jax.random.PRNGKey(1), y_t, state)
    # output stays sharded and matches the unsharded step
    assert "d" in str(out.values.sharding.spec)
    ref = jax.jit(lambda k, y, s: filt.filter(k, y, s))(
        jax.random.PRNGKey(1), jnp.full((d,), 0.3, jnp.float32),
        filt.initialize(jax.random.PRNGKey(0)),
    )
    np.testing.assert_allclose(
        float(out.log_likelihood), float(ref.log_likelihood), rtol=1e-4
    )


def test_lane_batching_runs():
    d = 4
    ssm = ring_ssm(d, mix=0.0)
    _, y = simulate(ssm, 8, seed=2)
    filt = BlockParticleFilter(ssm, 128, block_size=2, batch_shape=(3,))
    res = filt.batch_filter(jax.random.PRNGKey(0), y)
    assert res.log_likelihood.shape == (3,)
    assert res.filter_means.shape == (8, 3, d)
    assert np.isfinite(np.asarray(res.log_likelihood)).all()
