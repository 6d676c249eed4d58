"""Numerical parity against the PyTorch reference's formulas (BASELINE.md,
numerics gate: "filter means, ESS, and log-likelihood match the PyTorch
reference within 1e-5").

Each test drives this package and an independent torch transcription of the
reference's math (cited reference file:line) on IDENTICAL inputs — randomness
never enters: uniforms and process noise are generated host-side with numpy
and injected into both implementations. Both sides run float32 so the
comparison is like-for-like.

The transcriptions are written from the documented semantics (SURVEY.md §2),
not lifted: torch idioms differ (out-of-place, explicit masks).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pyfilter_tpu import resampling, utils
from pyfilter_tpu.inference.sequential.kernels import jittering

TOL = 1e-5


def _t(x):
    return torch.as_tensor(np.array(x, copy=True), dtype=torch.float32)


# --------------------------------------------------------------------------
# torch transcriptions of the reference numerics
# --------------------------------------------------------------------------


def torch_normalize(lw: torch.Tensor) -> torch.Tensor:
    """Reference utils.py:49-64: scrub NaN/+inf to -inf, max-subtracted
    softmax over dim 0, all-zero columns backfilled with uniform 1/N."""
    lw = torch.nan_to_num(lw, nan=-float("inf"), posinf=-float("inf"))
    probs = torch.softmax(lw - lw.max(dim=0)[0], dim=0)
    dead = probs.sum(dim=0) == 0.0
    return torch.where(dead, torch.tensor(1.0 / lw.shape[0]), probs)


def torch_ess(lw: torch.Tensor, normalized=False) -> torch.Tensor:
    """Reference utils.py:8-20."""
    w = lw if normalized else torch_normalize(lw)
    return 1.0 / w.pow(2.0).sum(dim=0)


def torch_log_likelihood(iw: torch.Tensor, w: torch.Tensor = None) -> torch.Tensor:
    """Reference filters/particle/utils.py:7-22."""
    m = iw.max(dim=0)[0]
    if w is None:
        w = torch.tensor(1.0 / iw.shape[0])
    return m + (w * (iw - m).exp()).sum(dim=0).log()


def torch_moments(values: torch.Tensor, w: torch.Tensor, covariance=False):
    """Reference filters/particle/utils.py:26-65 (event dim last)."""
    w = w.unsqueeze(-1)
    mean = (w * values).sum(dim=0)
    centered = values - mean
    if not covariance:
        return mean, (w * centered.pow(2.0)).sum(dim=0)
    cov = torch.einsum("n...,n...ij->...ij", w.squeeze(-1),
                       centered.unsqueeze(-1) @ centered.unsqueeze(-2))
    return mean, cov


def torch_systematic(lw: torch.Tensor, u) -> torch.Tensor:
    """Reference resampling.py:24-52 incl. the _wrapper transpose: weights
    come in particle-first ``(N, *B)``, each lane gets one uniform, the
    cumulative weight's last entry is pinned to 1.0."""
    w = torch_normalize(lw)
    one_d = w.dim() == 1
    wb = w.unsqueeze(-1) if one_d else w
    wb = wb.movedim(0, 1)  # (B, N)
    n = wb.shape[1]
    u = torch.as_tensor(u, dtype=wb.dtype).reshape(-1, 1)
    probs = (torch.arange(n, dtype=wb.dtype).unsqueeze(0) + u) / n
    cumsum = wb.cumsum(-1)
    cumsum[..., -1] = 1.0
    res = torch.searchsorted(cumsum, probs).movedim(0, 1)
    return res.squeeze(-1) if one_d else res


def torch_robust_var(x: torch.Tensor, w: torch.Tensor) -> torch.Tensor:
    """Reference jittering.py:49-83: weighted-quantile IQR / 1.349 floor."""
    srt, idx = x.sort(0)
    cw = w[idx].cumsum(0)
    lo = (cw - 0.25).abs().argmin(0)
    hi = (cw - 0.75).abs().argmin(0)
    cols = torch.arange(x.shape[-1])
    iqr2 = ((srt[hi, cols] - srt[lo, cols]) / 1.349).pow(2)
    mean = (w.unsqueeze(-1) * x).sum(0)
    var = (w.unsqueeze(-1) * (x - mean).pow(2)).sum(0)
    return torch.minimum(iqr2, var)


def torch_optimal_density(y, loc, h_var_inv, o_var_inv, a):
    """Reference proposals/utils.py:219-267, scalar hidden & observation:
    precision-form Gaussian product (returns mean, variance)."""
    prec = h_var_inv + a * o_var_inv * a
    var = 1.0 / prec
    return var * (h_var_inv * loc + a * o_var_inv * y), var


# --------------------------------------------------------------------------
# the parity tests
# --------------------------------------------------------------------------

RNG = np.random.default_rng(42)


def _adversarial_lw(shape):
    lw = RNG.normal(0.0, 3.0, shape).astype(np.float32)
    flat = lw.reshape(lw.shape[0], -1)
    flat[3, 0] = np.nan
    flat[5, 0] = np.inf
    if flat.shape[1] > 1:
        flat[:, 1] = -np.inf  # a fully-dead lane -> uniform backfill
    return lw


@pytest.mark.parametrize("shape", [(64,), (64, 7), (64, 3, 2)])
def test_normalize_parity(shape):
    lw = _adversarial_lw(shape)
    ours = np.asarray(utils.normalize(jnp.asarray(lw)))
    ref = torch_normalize(_t(lw)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("shape", [(64,), (64, 7)])
def test_ess_parity(shape):
    lw = _adversarial_lw(shape)
    ours = np.asarray(utils.get_ess(jnp.asarray(lw)))
    ref = torch_ess(_t(lw)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=TOL)


@pytest.mark.parametrize("with_weights", [False, True])
def test_log_likelihood_parity(with_weights):
    iw = RNG.normal(-1.0, 2.0, (128, 5)).astype(np.float32)
    w = None
    if with_weights:
        w = RNG.uniform(0.1, 1.0, (128, 5)).astype(np.float32)
        w /= w.sum(0)
    ours = np.asarray(
        utils.log_likelihood(jnp.asarray(iw), None if w is None else jnp.asarray(w))
    )
    ref = torch_log_likelihood(_t(iw), None if w is None else _t(w)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=TOL, atol=TOL)


@pytest.mark.parametrize("covariance", [False, True])
def test_moments_parity(covariance):
    x = RNG.normal(0.0, 1.0, (256, 4, 3)).astype(np.float32)  # (N, B, d)
    lw = RNG.normal(0.0, 1.0, (256, 4)).astype(np.float32)
    probs = np.asarray(utils.normalize(jnp.asarray(lw)))
    ours_m, ours_v = utils.get_mean_and_variance(
        jnp.asarray(x), jnp.asarray(probs), event_ndim=1, covariance=covariance
    )
    ref_m, ref_v = torch_moments(_t(x), _t(probs), covariance=covariance)
    np.testing.assert_allclose(np.asarray(ours_m), ref_m.numpy(), atol=TOL)
    np.testing.assert_allclose(np.asarray(ours_v), ref_v.numpy(), atol=TOL)


@pytest.mark.parametrize("shape", [(128,), (128, 6)])
def test_systematic_parity(shape):
    lw = RNG.normal(0.0, 2.0, shape).astype(np.float32)
    u = RNG.uniform(0.0, 1.0, shape[1:]).astype(np.float32)
    ours = np.asarray(resampling.systematic(None, jnp.asarray(lw), u=jnp.asarray(u)))
    ref = torch_systematic(_t(lw), u).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_robust_var_and_bandwidth_parity():
    x = RNG.normal(0.0, 2.0, (512, 3)).astype(np.float32)
    lw = RNG.normal(0.0, 1.0, (512,)).astype(np.float32)
    probs = np.asarray(utils.normalize(jnp.asarray(lw)))
    ours = np.asarray(jittering.robust_var(jnp.asarray(x), jnp.asarray(probs)))
    ref = torch_robust_var(_t(x), _t(probs)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=TOL)

    # bandwidth 1.59 * ESS^(-1/3) (reference jittering.py:117-134)
    ess = float(utils.get_ess(jnp.asarray(probs), normalized=True))
    ours_bw = float(jittering._bandwidth_factor(jnp.asarray(probs)))
    np.testing.assert_allclose(ours_bw, 1.59 * ess ** (-1.0 / 3.0), rtol=TOL)


def test_optimal_density_parity():
    n = 256
    loc = RNG.normal(0.0, 1.0, n).astype(np.float32)
    h_var_inv = RNG.uniform(0.5, 4.0, n).astype(np.float32)
    from pyfilter_tpu.filters.particle.proposals.utils import find_optimal_density

    dist = find_optimal_density(
        jnp.asarray(0.7), jnp.asarray(loc), jnp.asarray(h_var_inv),
        jnp.asarray(25.0), jnp.asarray(1.3), 0, 0,
    )
    ref_mean, ref_var = torch_optimal_density(
        torch.tensor(0.7), _t(loc), _t(h_var_inv), torch.tensor(25.0), torch.tensor(1.3)
    )
    np.testing.assert_allclose(np.asarray(dist.loc), ref_mean.numpy(), atol=TOL)
    np.testing.assert_allclose(
        np.asarray(dist.scale), ref_var.sqrt().numpy(), atol=TOL
    )


def test_distribution_logprob_parity():
    from pyfilter_tpu import distributions as dist

    x = RNG.uniform(0.1, 3.0, 64).astype(np.float32)
    pairs = [
        (dist.Normal(0.3, 1.7), torch.distributions.Normal(0.3, 1.7)),
        (dist.LogNormal(-0.5, 0.8), torch.distributions.LogNormal(-0.5, 0.8)),
        (dist.Exponential(2.5), torch.distributions.Exponential(2.5)),
    ]
    for ours, theirs in pairs:
        np.testing.assert_allclose(
            np.asarray(ours.log_prob(jnp.asarray(x))),
            theirs.log_prob(_t(x)).numpy(),
            rtol=TOL, atol=TOL,
        )

    mu = RNG.normal(0.0, 1.0, 3).astype(np.float32)
    a_ = RNG.normal(0.0, 1.0, (3, 3)).astype(np.float32)
    cov = (a_ @ a_.T + 3.0 * np.eye(3)).astype(np.float32)
    xv = RNG.normal(0.0, 1.0, (16, 3)).astype(np.float32)
    ours = dist.MultivariateNormal(jnp.asarray(mu), covariance_matrix=jnp.asarray(cov))
    theirs = torch.distributions.MultivariateNormal(_t(mu), covariance_matrix=_t(cov))
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(jnp.asarray(xv))),
        theirs.log_prob(_t(xv)).numpy(),
        rtol=1e-4, atol=1e-4,
    )


def test_bootstrap_filter_parity_end_to_end():
    """A full bootstrap SISR run, hand-stepped on both sides with SHARED
    numpy noise and resampling uniforms: per-step filter means, ESS, and the
    cumulative log-likelihood must agree within 1e-5 (BASELINE.md numerics
    gate; reference loop filters/base.py:140-158 + sisr.py)."""
    from pyfilter_tpu import timeseries as ts
    from pyfilter_tpu.timeseries import models

    N, T = 512, 30
    ALPHA, SIGMA, A, B_SC = 0.9, 0.5, 1.2, 0.3
    THRESH = 0.9 * N

    y_obs = RNG.normal(0.0, 1.0, T).astype(np.float32)
    x0 = RNG.normal(0.0, SIGMA, N).astype(np.float32)
    eps = RNG.normal(0.0, 1.0, (T, N)).astype(np.float32)
    us = RNG.uniform(0.0, 1.0, T).astype(np.float32)

    # ---- this package: public model API + utils, noise injected ----------
    ar = models.AR(0.0, ALPHA, SIGMA)
    ssm = ts.LinearStateSpaceModel(ar, (A, B_SC))
    state = ar.initial_sample(jax.random.PRNGKey(0), (N,)).copy(values=jnp.asarray(x0))
    lw = jnp.zeros(N)
    ll_j = 0.0
    means_j, ess_j = [], []
    for t in range(T):
        probs = utils.normalize(lw)
        ess = utils.get_ess(probs, normalized=True)
        ess_j.append(float(ess))
        if float(ess) < THRESH:
            idx = resampling.systematic(None, probs, normalized=True, u=jnp.asarray(us[t]))
            state = state.copy(values=state.value[idx])
            lw = jnp.zeros(N)
            probs = jnp.full((N,), 1.0 / N)
        loc, scale = ar.mean_scale(state)
        new_vals = loc + scale * jnp.asarray(eps[t])
        state = state.propagate_from(values=new_vals, time_increment=1)
        inc = ssm.build_density(state).log_prob(jnp.asarray(y_obs[t]))
        ll_j += float(utils.log_likelihood(inc, probs))
        lw = lw + inc
        post = utils.normalize(lw)
        m, _ = utils.get_mean_and_variance(state.value, post)
        means_j.append(float(m))

    # ---- torch transcription of the same recursion ------------------------
    xt = _t(x0)
    lwt = torch.zeros(N)
    ll_t = 0.0
    means_t, ess_t = [], []
    for t in range(T):
        probs = torch_normalize(lwt)
        ess = torch_ess(probs, normalized=True)
        ess_t.append(float(ess))
        if float(ess) < THRESH:
            idx = torch_systematic(lwt, us[t])
            xt = xt[idx]
            lwt = torch.zeros(N)
            probs = torch.full((N,), 1.0 / N)
        xt = ALPHA * xt + SIGMA * _t(eps[t])
        inc = torch.distributions.Normal(A * xt, B_SC).log_prob(torch.tensor(y_obs[t]))
        ll_t += float(torch_log_likelihood(inc, probs))
        lwt = lwt + inc
        post = torch_normalize(lwt)
        means_t.append(float((post * xt).sum()))

    np.testing.assert_allclose(means_j, means_t, rtol=TOL, atol=TOL)
    np.testing.assert_allclose(ess_j, ess_t, rtol=TOL, atol=TOL * N)
    np.testing.assert_allclose(ll_j, ll_t, rtol=TOL, atol=5 * TOL)
