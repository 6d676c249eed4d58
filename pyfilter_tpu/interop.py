"""External-PPL interop: the particle-filter likelihood factor for numpyro.

The reference plugs its VI feature into the pyro ecosystem by emitting the
FFBS-smoothed log-likelihood as a ``pyro.factor`` inside a user model
(reference filters/particle/base.py:176-229, ``do_sample_pyro``). The JAX
equivalent of that ecosystem is numpyro; :func:`numpyro_filter_factor` is the
same bridge: call it inside a numpyro model after sampling the SSM parameters
and it adds the filter's differentiable smoothed log-likelihood
(:meth:`~pyfilter_tpu.filters.particle.base.ParticleFilter.smoothed_log_likelihood`)
to the model's joint density via ``numpyro.factor``. Gradients flow through
the density evaluations only — the filtering/smoothing indices are behind
``stop_gradient``, matching the reference's ``no_grad`` boundary.

Usage (numpyro SVI, the reference's nutria-pyro flow)::

    import numpyro, numpyro.distributions as npdist
    from numpyro.infer import SVI, Trace_ELBO, autoguide
    import pyfilter_tpu as pf
    from pyfilter_tpu import interop, timeseries as ts
    from pyfilter_tpu.timeseries import models

    def model(y):
        sigma = numpyro.sample("sigma", npdist.LogNormal(0.0, 1.0))
        ssm = ts.LinearStateSpaceModel(models.RandomWalk(sigma), (1.0, 0.1))
        filt = pf.APF(ssm, 100)
        interop.numpyro_filter_factor("pf_loglik", filt, y)

    guide = autoguide.AutoNormal(model)
    svi = SVI(model, guide, numpyro.optim.Adam(1e-2), Trace_ELBO(num_particles=4))
    svi_result = svi.run(jax.random.PRNGKey(0), 500, y)

numpyro is an optional dependency: the import happens inside the function, so
the rest of the package never requires it (the bundled
:func:`pyfilter_tpu.inference.fit_svi` covers the same capability without any
external PPL).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def numpyro_filter_factor(
    name: str, filter_, y, key=None, model=None, mesh=None, **spmd_kwargs
) -> jax.Array:
    """Add the filter's smoothed log-likelihood as a ``numpyro.factor``.

    Call inside a numpyro model, after the SSM the filter holds was built
    from ``numpyro.sample`` sites (so the factor is differentiable w.r.t.
    them). ``key`` defaults to numpyro's per-trace ``prng_key()`` — the
    smoothing randomness is then resolved by numpyro's seed handler, which
    is what makes the factor reproducible under ``numpyro.handlers.seed``.
    Returns the factor value (per lane when the filter is lane-batched,
    mirroring the reference's vectorized ``pyro.factor``).

    ``mesh`` (optional): compute the factor at particle-sharded scale via
    :func:`pyfilter_tpu.parallel.spmd_smoothed_log_likelihood` (extra
    keyword arguments — ``n_trajectories``, ``halo``, … — pass through).
    """
    import numpyro

    if key is None:
        key = numpyro.prng_key()
        if key is None:
            raise RuntimeError(
                "no PRNG key available: run the model under numpyro.handlers.seed "
                "(SVI/MCMC do this automatically) or pass key= explicitly"
            )

    if mesh is not None:
        from .parallel import spmd_smoothed_log_likelihood

        ll = spmd_smoothed_log_likelihood(
            model if model is not None else filter_.model,
            filter_.n_particles,
            key,
            jnp.asarray(y),
            mesh,
            **spmd_kwargs,
        )
    else:
        ll = filter_.smoothed_log_likelihood(key, jnp.asarray(y), model=model)
    numpyro.factor(name, ll)
    return ll
