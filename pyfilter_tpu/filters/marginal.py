"""Gaussian marginal-likelihood adapter — exact-likelihood batch inference.

Wraps the traced Gaussian-family filters in the model-builder/lane-batch
protocol the batch inference algorithms consume, so
:class:`~pyfilter_tpu.inference.TemperedSMC` and :class:`~pyfilter_tpu.inference.PMMH`
(and any consumer of ``initialize_model`` + lane-batched ``batch_filter``)
can run on EXACT Gaussian likelihoods instead of particle estimates: on a
linear-Gaussian model the EKF likelihood is exact, so the sampler is an exact
SMC sampler — no pseudo-marginal noise, far higher MH acceptance at equal
cost, and a noise-free log-evidence.

``kind`` selects the filter: ``"ekf"``, ``"ukf"``, ``"ckf"`` (single
Gaussian), ``"gsf"`` (Gaussian-sum bank — multimodal marginal likelihoods),
or ``"imm"`` (regime switching: the builder returns a
:class:`~pyfilter_tpu.filters.imm.MarkovSwitchingModel` whose transition
matrix may itself be a learned context parameter). ``filter_kwargs`` pass to
the filter constructor (e.g. ``n_components`` for gsf, ``base`` for imm).

Lane batching is ``jax.vmap`` over the model pytree (filters/_lane.py):
parameter leaves built from a lane-batched context carry the K axis; constant
leaves are broadcast. Inside the vmap each filter sees single-lane shapes, so
all static shape probing works unchanged. (``KalmanFilter`` extracts its
matrices through numpy and cannot be vmapped — use ``kind="ekf"``, which
reduces to it exactly on linear models, tests/test_ekf.py.)
"""

from __future__ import annotations

import jax
from jax.tree_util import register_pytree_node

from ._lane import lane_vmap_batch_filter
from .gsf import GAUSSIAN_BASES, GaussianSumFilter
from .imm import InteractingMultipleModel, MarkovSwitchingModel

_KINDS = ("ekf", "ukf", "ckf", "gsf", "imm")


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

    def __init__(self, model_builder, kind: str = "ekf", batch_shape=(), **filter_kwargs):
        if kind not in _KINDS:
            raise ValueError(f"kind must be one of {sorted(_KINDS)}")
        self.model_builder = model_builder
        self.kind = kind
        self.batch_shape = tuple(batch_shape)
        # aux data must hash for jit caching: store as a sorted item tuple
        self.filter_kwargs = tuple(sorted(filter_kwargs.items()))
        self.model = None

    def replace(self, **kwargs) -> "GaussianMarginalFilter":
        obj = GaussianMarginalFilter(
            kwargs.pop("model_builder", self.model_builder),
            kind=kwargs.pop("kind", self.kind),
            batch_shape=kwargs.pop("batch_shape", self.batch_shape),
        )
        obj.filter_kwargs = kwargs.pop("filter_kwargs", self.filter_kwargs)
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
        if self.kind == "imm" and not isinstance(model, MarkovSwitchingModel):
            raise TypeError(
                "kind='imm' builders must return a MarkovSwitchingModel "
                f"(got {type(model).__name__})"
            )
        return self.replace(model=model)

    def _make(self, model):
        kw = dict(self.filter_kwargs)
        if self.kind in GAUSSIAN_BASES:
            return GAUSSIAN_BASES[self.kind](model, **kw)
        if self.kind == "gsf":
            return GaussianSumFilter(model, **kw)
        return InteractingMultipleModel(model, **kw)

    def batch_filter(self, key, y, use_jit: bool = False):
        """Full filtering pass; returns a :class:`FilterResult` whose leaves
        carry the lane axis (``log_likelihood`` has shape ``batch_shape``)."""
        return lane_vmap_batch_filter(self._make, self.model, self.batch_shape, y)


def _flatten(f):
    return (f.model,), (f.model_builder, f.kind, f.batch_shape, f.filter_kwargs)


def _unflatten(aux, children):
    obj = GaussianMarginalFilter(aux[0], kind=aux[1], batch_shape=aux[2])
    obj.filter_kwargs = aux[3]
    obj.model = children[0]
    return obj


register_pytree_node(GaussianMarginalFilter, _flatten, _unflatten)
