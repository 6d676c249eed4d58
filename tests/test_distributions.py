"""Distribution layer tests — log-probs vs scipy.stats, sampling moments, shapes,
bijector round-trips, transformed densities, and pytree/jit/vmap safety."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

import pyfilter_tpu.distributions as dist
from pyfilter_tpu.distributions import bijectors, constraints


CASES = [
    (lambda: dist.Normal(0.5, 2.0), lambda: st.norm(0.5, 2.0)),
    (lambda: dist.LogNormal(0.2, 0.7), lambda: st.lognorm(s=0.7, scale=np.exp(0.2))),
    (lambda: dist.Uniform(-1.0, 3.0), lambda: st.uniform(-1.0, 4.0)),
    (lambda: dist.Exponential(1.7), lambda: st.expon(scale=1 / 1.7)),
    (lambda: dist.Gamma(2.5, 1.3), lambda: st.gamma(2.5, scale=1 / 1.3)),
    (lambda: dist.Beta(2.0, 3.0), lambda: st.beta(2.0, 3.0)),
    (lambda: dist.StudentT(4.0, 0.3, 1.5), lambda: st.t(4.0, loc=0.3, scale=1.5)),
    (lambda: dist.Laplace(0.4, 1.3), lambda: st.laplace(0.4, 1.3)),
    (lambda: dist.Weibull(2.0, 1.5), lambda: st.weibull_min(1.5, scale=2.0)),
    (lambda: dist.HalfNormal(1.4), lambda: st.halfnorm(scale=1.4)),
    (lambda: dist.Gumbel(0.3, 1.2), lambda: st.gumbel_r(0.3, 1.2)),
    (lambda: dist.Logistic(-0.5, 0.9), lambda: st.logistic(-0.5, 0.9)),
    (lambda: dist.Chi2(3.5), lambda: st.chi2(3.5)),
    (
        lambda: dist.TruncatedNormal(0.5, 2.0, -1.0, 3.0),
        lambda: st.truncnorm(-0.75, 1.25, loc=0.5, scale=2.0),
    ),
]


@pytest.mark.parametrize("make_d,make_ref", CASES, ids=lambda c: "case")
def test_log_prob_matches_scipy(make_d, make_ref):
    d, ref = make_d(), make_ref()
    x = np.asarray(ref.rvs(size=50, random_state=1), dtype=np.float32)
    lp = np.asarray(d.log_prob(jnp.asarray(x)))
    np.testing.assert_allclose(lp, ref.logpdf(x), rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("make_d,make_ref", CASES, ids=lambda c: "case")
def test_sampling_moments(key, make_d, make_ref):
    d, ref = make_d(), make_ref()
    x = np.asarray(d.sample(key, (200_000,)), dtype=np.float64)
    np.testing.assert_allclose(x.mean(), ref.mean(), atol=4 * ref.std() / np.sqrt(len(x)) + 1e-3)
    np.testing.assert_allclose(np.asarray(d.mean), ref.mean(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d.variance), ref.var(), rtol=1e-5)


@pytest.mark.parametrize(
    "make_d",
    [
        lambda: dist.Normal(0.5, 2.0),
        lambda: dist.Uniform(-1.0, 3.0),
        lambda: dist.Exponential(1.7),
        lambda: dist.Laplace(0.4, 1.3),
        lambda: dist.Cauchy(-0.2, 0.8),
        lambda: dist.Weibull(2.0, 1.5),
        lambda: dist.HalfNormal(1.4),
        lambda: dist.HalfCauchy(0.7),
        lambda: dist.Gumbel(0.3, 1.2),
        lambda: dist.Logistic(-0.5, 0.9),
        lambda: dist.TruncatedNormal(0.5, 2.0, -1.0, 3.0),
    ],
)
def test_icdf_inverts_cdf(make_d):
    d = make_d()
    q = jnp.asarray([0.01, 0.25, 0.5, 0.75, 0.99])
    x = d.icdf(q)
    np.testing.assert_allclose(np.asarray(d.cdf(x)), np.asarray(q), rtol=1e-4, atol=1e-5)


def test_cauchy_log_prob_and_median(key):
    d, ref = dist.Cauchy(-0.2, 0.8), st.cauchy(-0.2, 0.8)
    x = np.asarray(ref.rvs(size=50, random_state=1), dtype=np.float32)
    np.testing.assert_allclose(np.asarray(d.log_prob(jnp.asarray(x))), ref.logpdf(x), rtol=2e-4, atol=1e-5)
    # undefined moments report NaN (torch convention); the sample median is the location
    assert np.isnan(np.asarray(d.mean)) and np.isnan(np.asarray(d.variance))
    s = np.asarray(d.sample(key, (200_000,)), dtype=np.float64)
    np.testing.assert_allclose(np.median(s), -0.2, atol=0.01)


def test_halfcauchy_log_prob_and_median(key):
    d, ref = dist.HalfCauchy(0.7), st.halfcauchy(scale=0.7)
    x = np.asarray(ref.rvs(size=50, random_state=1), dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(x))), ref.logpdf(x), rtol=2e-4, atol=1e-5
    )
    assert np.isnan(np.asarray(d.mean)) and np.isnan(np.asarray(d.variance))
    s = np.asarray(d.sample(key, (200_000,)), dtype=np.float64)
    np.testing.assert_allclose(np.median(s), ref.median(), rtol=0.02)


def test_truncated_normal_one_sided(key):
    """Infinite bounds must behave: N(1, 0.5²) truncated to [0, inf)."""
    d = dist.TruncatedNormal(1.0, 0.5, low=0.0)
    ref = st.truncnorm(-2.0, np.inf, loc=1.0, scale=0.5)
    x = np.asarray(ref.rvs(size=50, random_state=2), dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(x))), ref.logpdf(x), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(d.mean), ref.mean(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d.variance), ref.var(), rtol=1e-4)
    s = np.asarray(d.sample(key, (200_000,)), dtype=np.float64)
    assert (s >= 0).all()
    np.testing.assert_allclose(s.mean(), ref.mean(), atol=4 * ref.std() / np.sqrt(len(s)))
    # out-of-support density is -inf
    assert np.asarray(d.log_prob(jnp.asarray(-0.1))) == -np.inf


def test_batch_shapes(key):
    d = dist.Normal(jnp.zeros((3, 4)), jnp.ones(4))
    assert d.batch_shape == (3, 4)
    assert d.sample(key, (7,)).shape == (7, 3, 4)
    assert d.log_prob(jnp.zeros((3, 4))).shape == (3, 4)


def test_expand():
    d = dist.Normal(0.0, 1.0).expand((5, 2))
    assert d.batch_shape == (5, 2)
    d2 = dist.MultivariateNormal(jnp.zeros(3), scale_tril=jnp.eye(3)).expand((4,))
    assert d2.batch_shape == (4,) and d2.event_shape == (3,)


def test_to_event(key):
    d = dist.Normal(jnp.zeros(4), jnp.ones(4)).to_event(1)
    assert d.batch_shape == () and d.event_shape == (4,)
    assert d.log_prob(jnp.zeros(4)).shape == ()
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.zeros(4))), 4 * st.norm.logpdf(0.0), rtol=1e-5
    )


def test_mvn_log_prob_matches_scipy(key):
    cov = np.array([[2.0, 0.6], [0.6, 1.0]])
    loc = np.array([1.0, -0.5])
    d = dist.MultivariateNormal(jnp.asarray(loc), covariance_matrix=jnp.asarray(cov))
    x = st.multivariate_normal(loc, cov).rvs(size=20, random_state=2).astype(np.float32)
    lp = np.asarray(d.log_prob(jnp.asarray(x)))
    np.testing.assert_allclose(lp, st.multivariate_normal(loc, cov).logpdf(x), rtol=1e-4)
    samples = np.asarray(d.sample(key, (100_000,)), np.float64)
    np.testing.assert_allclose(samples.mean(0), loc, atol=0.02)
    np.testing.assert_allclose(np.cov(samples.T), cov, atol=0.03)


def test_mvn_precision_parameterization():
    cov = np.array([[2.0, 0.6], [0.6, 1.0]])
    prec = np.linalg.inv(cov)
    d = dist.MultivariateNormal(jnp.zeros(2), precision_matrix=jnp.asarray(prec))
    np.testing.assert_allclose(np.asarray(d.covariance_matrix), cov, rtol=1e-4, atol=1e-5)


def test_robust_cholesky_fallback():
    good = jnp.asarray(np.array([[2.0, 0.5], [0.5, 1.0]]))
    np.testing.assert_allclose(
        np.asarray(dist.robust_cholesky(good)), np.linalg.cholesky(np.asarray(good)), rtol=1e-4, atol=1e-5
    )
    bad = jnp.asarray(np.array([[1.0, 2.0], [2.0, 1.0]]))  # indefinite
    chol = np.asarray(dist.robust_cholesky(bad))
    assert np.isfinite(chol).all()
    np.testing.assert_allclose(np.diag(chol), [1.0, 1.0], rtol=1e-3)


def test_categorical(key):
    probs = jnp.asarray([0.2, 0.3, 0.5])
    d = dist.Categorical(probs=probs)
    x = np.asarray(d.sample(key, (100_000,)))
    counts = np.bincount(x, minlength=3) / len(x)
    np.testing.assert_allclose(counts, np.asarray(probs), atol=0.01)
    np.testing.assert_allclose(np.asarray(d.log_prob(jnp.asarray([0, 1, 2]))), np.log(np.asarray(probs)), rtol=1e-5)


@pytest.mark.parametrize(
    "bij,low,high",
    [
        (bijectors.Exp(), -2.0, 2.0),
        (bijectors.Softplus(), -2.0, 3.0),
        (bijectors.Sigmoid(), -3.0, 3.0),
        (bijectors.Tanh(), -2.0, 2.0),
        (bijectors.Affine(1.5, -2.0), -2.0, 2.0),
        (bijectors.SinhArcsinh(0.5, 1.3), -2.0, 2.0),
        (bijectors.Chain([bijectors.Affine(0.0, 2.0), bijectors.Sigmoid()]), -2.0, 2.0),
    ],
)
def test_bijector_roundtrip_and_jacobian(bij, low, high):
    x = jnp.linspace(low, high, 23)
    y = bij.forward(x)
    np.testing.assert_allclose(np.asarray(bij.inverse(y)), np.asarray(x), rtol=1e-4, atol=1e-5)
    # numerical jacobian check
    ladj = np.asarray(bij.log_abs_det_jacobian(x, y))
    num = np.asarray(jax.vmap(jax.grad(lambda v: bij.forward(v)))(x))
    np.testing.assert_allclose(ladj, np.log(np.abs(num)), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize(
    "bij,low,high",
    [
        (bijectors.Exp(), 0.1, 4.0),
        (bijectors.Affine(1.5, -2.0), -2.0, 2.0),
        (bijectors.SinhArcsinh(0.5, 1.3), -4.0, 4.0),
        (
            bijectors.Chain(
                [bijectors.SinhArcsinh(0.2, 0.9), bijectors.Affine(0.3, 1.7)]
            ),
            -4.0,
            4.0,
        ),
        (bijectors.Chain([bijectors.Affine(0.0, 2.0), bijectors.Sigmoid()]), 0.05, 0.95),
    ],
)
def test_inverse_and_ladj_matches_unfused(bij, low, high):
    """The fused inverse+jacobian (the log_prob hot path) must agree with
    the separate inverse / log_abs_det_jacobian calls (the SinhArcsinh
    override reuses asinh(y) as the jacobian's inner argument — identical in
    exact arithmetic, tighter in floats, hence allclose not array_equal)."""
    y = jnp.linspace(low, high, 31)
    x_ref = bij.inverse(y)
    ladj_ref = bij.log_abs_det_jacobian(x_ref, y)
    x, ladj = bij.inverse_and_ladj(y)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ladj),
        np.asarray(jnp.broadcast_to(ladj_ref, y.shape)),
        rtol=2e-5,
        atol=1e-6,
    )


def test_biject_to():
    assert isinstance(dist.biject_to(constraints.real), bijectors.Identity)
    assert isinstance(dist.biject_to(constraints.positive), bijectors.Exp)
    b = dist.biject_to(constraints.Interval(-1.0, 2.0))
    x = jnp.linspace(-5, 5, 11)
    y = np.asarray(b.forward(x))
    assert (y > -1.0).all() and (y < 2.0).all()


def test_transformed_distribution_log_prob(key):
    # LogNormal as exp-transformed Normal must match the analytic LogNormal
    base = dist.Normal(0.3, 0.8)
    d = dist.TransformedDistribution(base, bijectors.Exp())
    x = jnp.asarray([0.5, 1.0, 2.5])
    np.testing.assert_allclose(
        np.asarray(d.log_prob(x)), np.asarray(dist.LogNormal(0.3, 0.8).log_prob(x)), rtol=1e-5
    )
    s = np.asarray(d.sample(key, (100_000,)), np.float64)
    np.testing.assert_allclose(s.mean(), np.exp(0.3 + 0.5 * 0.64), rtol=0.03)


def test_distributions_are_pytrees(key):
    d = dist.Normal(jnp.zeros(3), jnp.ones(3))
    leaves = jax.tree_util.tree_leaves(d)
    assert len(leaves) == 2

    @jax.jit
    def sample_it(d, key):
        return d.sample(key)

    assert sample_it(d, key).shape == (3,)

    # vmap over a batch of distributions
    locs = jnp.arange(4.0)
    out = jax.vmap(lambda loc: dist.Normal(loc, 1.0).log_prob(0.0))(locs)
    np.testing.assert_allclose(np.asarray(out), st.norm(np.arange(4.0), 1.0).logpdf(0.0), rtol=1e-5)


def test_equivalent_to():
    assert dist.Normal(0.0, 1.0).equivalent_to(dist.Normal(0.0, 1.0))
    assert not dist.Normal(0.0, 1.0).equivalent_to(dist.Normal(0.0, 2.0))
    assert not dist.Normal(0.0, 1.0).equivalent_to(dist.Exponential(1.0))


# -- discrete count distributions (pyro observation densities, SURVEY §2.9) ----

DISCRETE_CASES = [
    (lambda: dist.Poisson(3.7), lambda: st.poisson(3.7)),
    (lambda: dist.Bernoulli(probs=0.3), lambda: st.bernoulli(0.3)),
    (lambda: dist.Binomial(12.0, probs=0.4), lambda: st.binom(12, 0.4)),
    # torch convention: probs = success prob, counts failures -> scipy nbinom(r, 1-p)
    (lambda: dist.NegativeBinomial(5.0, probs=0.35), lambda: st.nbinom(5, 0.65)),
]


@pytest.mark.parametrize("make_d,make_ref", DISCRETE_CASES, ids=lambda c: "case")
def test_discrete_log_prob_matches_scipy(make_d, make_ref):
    d, ref = make_d(), make_ref()
    k = np.asarray(ref.rvs(size=60, random_state=3), dtype=np.float32)
    lp = np.asarray(d.log_prob(jnp.asarray(k)))
    np.testing.assert_allclose(lp, ref.logpmf(k), rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("make_d,make_ref", DISCRETE_CASES, ids=lambda c: "case")
def test_discrete_sampling_moments(key, make_d, make_ref):
    d, ref = make_d(), make_ref()
    x = np.asarray(d.sample(key, (200_000,)), dtype=np.float64)
    assert x.dtype == np.float64 or x.dtype == np.float32  # float samples (torch convention)
    np.testing.assert_allclose(x.mean(), ref.mean(), atol=4 * ref.std() / np.sqrt(len(x)) + 1e-3)
    np.testing.assert_allclose(x.var(), ref.var(), rtol=0.05)
    np.testing.assert_allclose(np.asarray(d.mean), ref.mean(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d.variance), ref.var(), rtol=1e-5)


def test_poisson_cdf_matches_scipy():
    d = dist.Poisson(2.9)
    k = jnp.arange(10.0)
    np.testing.assert_allclose(np.asarray(d.cdf(k)), st.poisson(2.9).cdf(np.arange(10)), rtol=1e-5)


def test_bernoulli_extreme_logits_stable():
    d = dist.Bernoulli(logits=jnp.asarray([-80.0, 80.0]))
    lp = np.asarray(d.log_prob(jnp.asarray([0.0, 1.0])))
    assert np.all(np.isfinite(lp)) and np.all(lp <= 0.0)
    np.testing.assert_allclose(lp, 0.0, atol=1e-6)


def test_discrete_batch_shapes_and_jit(key):
    d = dist.Poisson(jnp.full((3, 4), 2.0))
    assert d.batch_shape == (3, 4)
    assert d.sample(key, (7,)).shape == (7, 3, 4)

    @jax.jit
    def lp(d, k):
        return d.log_prob(k)

    assert lp(d, jnp.ones((3, 4))).shape == (3, 4)

    nb = dist.NegativeBinomial(jnp.full(5, 4.0), logits=jnp.zeros(5))
    assert nb.sample(key, (2,)).shape == (2, 5)
