"""The reference's benchmark workloads end-to-end (BASELINE.md de-facto suite)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyfilter_tpu as pf
from pyfilter_tpu import examples, inference as inf
from pyfilter_tpu.filters.particle import proposals


def test_sine_diffusion_filtering(key):
    """README workload: filter RMSE at the observation-noise floor."""
    model = examples.sine_diffusion_model()
    x, y = model.sample_states(key, 250).get_paths()
    filt = pf.APF(model, 250, proposal=proposals.LinearGaussianObservations())
    res = filt.batch_filter(key, y)
    rmse = float(jnp.sqrt(jnp.mean((res.filter_means - x) ** 2)))
    assert rmse < 3.0 * 0.1  # obs noise 0.1


def test_lorenz63_tracking(key):
    """Lorenz-63 with partial 2-D observation: tracking RMSE far below the
    attractor scale (lorenz.ipynb workload)."""
    model = examples.lorenz63_model()
    path = model.sample_states(jax.random.PRNGKey(1), 1000)
    x_true, ys = path.get_paths()
    mask = ~jnp.isnan(ys).any(axis=1)
    y, x_at_obs = ys[mask], x_true[mask]

    filt = pf.APF(model, 400, proposal=proposals.LinearGaussianObservations())
    res = filt.batch_filter(jax.random.PRNGKey(2), y)

    rmse = float(jnp.sqrt(jnp.mean((res.filter_means - x_at_obs) ** 2)))
    signal = float(jnp.sqrt(jnp.mean(jnp.var(x_at_obs, axis=0))))
    assert rmse < 0.25 * signal, (rmse, signal)


def test_stochastic_volatility_filtering(key):
    model = examples.stochastic_volatility_model()
    path = model.sample_states(key, 50 * model.observe_every_step)
    x_true, ys = path.get_paths()
    y = ys[~jnp.isnan(ys)]
    filt = pf.SISR(model, 1000)
    res = filt.batch_filter(jax.random.PRNGKey(3), y)
    assert np.isfinite(float(res.log_likelihood))
    assert (np.asarray(res.filter_means) > 0).all()  # volatilities stay positive


def test_nutria_filtering(key):
    model = examples.nutria_model()
    _, y = model.sample_states(key, 80).get_paths()
    filt = pf.APF(model, 250, proposal=proposals.LinearGaussianObservations())
    res = filt.batch_filter(jax.random.PRNGKey(4), y)
    assert np.isfinite(float(res.log_likelihood))


@pytest.mark.slow
def test_stochastic_volatility_smc2(key):
    """BASELINE workload 2: SMC2 joint inference on the stoch-vol model with
    the notebook's priors and a quasi context (stochastic-volatility.ipynb)."""
    true_model = examples.stochastic_volatility_model(
        kappa=0.1, gamma=1.0, sigma=0.05, mu=0.0, nu=0.0, tau=1.0
    )
    path = true_model.sample_states(jax.random.PRNGKey(11), 150 * true_model.observe_every_step)
    ys = path.y
    y = ys[~jnp.isnan(ys)]

    with inf.make_context(use_quasi=True, key=jax.random.PRNGKey(1)) as ctx:
        filt = pf.APF(examples.stochastic_volatility_builder, 200)
        alg = inf.SMC2(filt, 256, num_steps=2, context=ctx, key=jax.random.PRNGKey(2))
        state = alg.fit(y, logging=inf.logging.DefaultLogger())

    w = np.asarray(state.normalized_weights())
    post = w @ np.asarray(ctx.stack_parameters(True))
    names = list(ctx.parameters)
    est = dict(zip(names, post))
    assert np.isfinite(post).all()
    # gamma (vol level) and tau identifiable with 150 obs; loose sanity bounds
    assert 0.3 < est["gamma"] < 3.0, est
    assert 0.5 < est["tau"] < 2.0, est


@pytest.mark.slow
def test_nutria_smc2(key):
    """BASELINE workload 4: nutria population model under SMC2 (nutria.ipynb)."""
    true_model = examples.nutria_model(a=0.3, b=-0.2, c=0.0, sigma_e=0.2, sigma_n=0.15)
    _, y = true_model.sample_states(jax.random.PRNGKey(21), 120).get_paths()

    with inf.make_context(key=jax.random.PRNGKey(1)) as ctx:
        filt = pf.APF(
            lambda c: examples.nutria_builder(c, num_obs=120),
            200,
            proposal=proposals.LinearGaussianObservations(),
        )
        alg = inf.SMC2(filt, 256, context=ctx, key=jax.random.PRNGKey(2))
        state = alg.fit(y, logging=inf.logging.DefaultLogger())

    w = np.asarray(state.normalized_weights())
    post = w @ np.asarray(ctx.stack_parameters(True))
    assert np.isfinite(post).all()
