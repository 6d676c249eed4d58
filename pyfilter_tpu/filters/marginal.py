"""Gaussian marginal-likelihood adapter — exact-likelihood batch inference.

Wraps the traced Gaussian filters (:class:`ExtendedKalmanFilter` /
:class:`UnscentedKalmanFilter`) in the model-builder/lane-batch protocol the
batch inference algorithms consume, so :class:`~pyfilter_tpu.inference.TemperedSMC`
(and any consumer of ``initialize_model`` + lane-batched ``batch_filter``)
can run on EXACT Gaussian likelihoods instead of particle estimates: on a
linear-Gaussian model the EKF likelihood is exact, so the sampler is an exact
SMC sampler — no pseudo-marginal noise, far higher MH acceptance at equal
cost, and a noise-free log-evidence.

Lane batching is ``jax.vmap`` over the model pytree: parameter leaves built
from a lane-batched context carry the K axis; constant leaves are broadcast.
Inside the vmap each filter sees single-lane shapes, so all static shape
probing works unchanged. (``KalmanFilter`` extracts its matrices through
numpy and cannot be vmapped — use ``kind="ekf"``, which reduces to it exactly
on linear models, tests/test_ekf.py.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node

from .ekf import ExtendedKalmanFilter
from .ukf import UnscentedKalmanFilter

_KINDS = {"ekf": ExtendedKalmanFilter, "ukf": UnscentedKalmanFilter}


class GaussianMarginalFilter:
    """Model-builder filter whose ``batch_filter`` evaluates the Gaussian
    marginal likelihood per parameter lane.

    Protocol surface (the subset the batch algorithms use): ``set_batch_shape``,
    ``initialize_model``, ``batch_filter(key, y)`` (the key is accepted for
    API uniformity; the filters are deterministic), ``record_states`` /
    ``record_intermediary`` (always False — there is no particle history).
    """

    record_states = False
    record_intermediary = False

    def __init__(self, model_builder, kind: str = "ekf", batch_shape=()):
        if kind not in _KINDS:
            raise ValueError(f"kind must be one of {sorted(_KINDS)}")
        self.model_builder = model_builder
        self.kind = kind
        self.batch_shape = tuple(batch_shape)
        self.model = None

    def replace(self, **kwargs) -> "GaussianMarginalFilter":
        obj = GaussianMarginalFilter(
            kwargs.pop("model_builder", self.model_builder),
            kind=kwargs.pop("kind", self.kind),
            batch_shape=kwargs.pop("batch_shape", self.batch_shape),
        )
        obj.model = kwargs.pop("model", self.model)
        if kwargs:
            raise TypeError(f"unknown fields: {sorted(kwargs)}")
        return obj

    def set_batch_shape(self, batch_shape) -> "GaussianMarginalFilter":
        batch_shape = tuple(batch_shape)
        if len(batch_shape) > 1:
            raise ValueError("GaussianMarginalFilter supports one lane axis")
        return self.replace(batch_shape=batch_shape)

    def initialize_model(self, context) -> "GaussianMarginalFilter":
        with context.no_prior_verification():
            model = self.model_builder(context)
        return self.replace(model=model)

    def _lane_axes(self, model):
        k = self.batch_shape[0]

        def axis(leaf):
            leaf = jnp.asarray(leaf)
            return 0 if (leaf.ndim >= 1 and leaf.shape[0] == k) else None

        return jax.tree_util.tree_map(axis, model)

    def batch_filter(self, key, y, use_jit: bool = False):
        """Full filtering pass; returns a :class:`FilterResult` whose leaves
        carry the lane axis (``log_likelihood`` has shape ``batch_shape``)."""
        make = _KINDS[self.kind]
        if not self.batch_shape:
            return make(self.model).batch_filter(y)

        def one(model):
            return make(model).batch_filter(y)

        res = jax.vmap(one, in_axes=(self._lane_axes(self.model),))(self.model)
        # vmap puts the lane axis first; FilterResult's per-step leaves are
        # time-major with lanes second (the particle-filter convention that
        # exchange/resample rely on) — swap them. latest_state stays
        # lane-leading (its lane surgery indexes axis 0).
        swap = lambda a: jnp.moveaxis(a, 0, 1)
        return res._replace(
            step_log_likelihoods=swap(res.step_log_likelihoods),
            filter_means=swap(res.filter_means),
            filter_variances=swap(res.filter_variances),
        )


def _flatten(f):
    return (f.model,), (f.model_builder, f.kind, f.batch_shape)


def _unflatten(aux, children):
    obj = GaussianMarginalFilter(aux[0], kind=aux[1], batch_shape=aux[2])
    obj.model = children[0]
    return obj


register_pytree_node(GaussianMarginalFilter, _flatten, _unflatten)
