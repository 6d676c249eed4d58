"""Inference context: the named parameter/prior store.

Re-design of the reference's ``pyfilter/inference/context.py``. The thread-local
context-manager stack (PyMC3-style, context.py:42-48) is kept as API sugar, and
model builders still call ``context.named_parameter(name, prior)`` — but the
store itself is host-level orchestration state holding ``jnp`` arrays: every
mutation (``unstack_parameters``, ``resample``, ``exchange``) rewrites the value
store functionally, and models are *rebuilt* from the store into fresh pytrees
whose leaves flow through ``jit`` as traced arguments (so parameter updates
never trigger recompilation).

PRNG is an explicit key held by the context (``set_key``) — replaces the
reference's reliance on the torch global RNG at registration time.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from contextlib import contextmanager
from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..distributions import Distribution
from . import prior as prior_ops
from .parameter import PriorBoundParameter
from .qmc import EngineContainer


class NotSamePriorError(Exception):
    pass


class ParameterDoesNotExist(Exception):
    pass


class BatchShapeNotSet(Exception):
    pass


class BatchShapeAlreadySet(Exception):
    pass


class InferenceContext:
    _PARAMETER_KEY = "parameters"
    _PRIOR_KEY = "prior"

    _contexts = threading.local()

    def __init__(self, key=None):
        self._prior_dict: Dict[str, Distribution] = OrderedDict()
        self._value_dict: Dict[str, jax.Array] = OrderedDict()
        self._shape_dict: Dict[str, tuple] = OrderedDict()
        self._unconstrained_shape_dict: Dict[str, tuple] = OrderedDict()

        self.batch_shape: tuple | None = None
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self._verify_prior = True

    # -- context-manager stack (reference context.py:42-96) -------------------
    @property
    def stack(self):
        cls = InferenceContext
        if not hasattr(cls._contexts, "stack"):
            cls._contexts.stack = []
        return cls._contexts.stack

    def __enter__(self):
        self.stack.append(self)
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.stack.remove(self)
        return False

    @classmethod
    def get_context(cls) -> "InferenceContext":
        if not hasattr(cls._contexts, "stack"):
            cls._contexts.stack = []
        if cls._contexts.stack:
            return cls._contexts.stack[-1]
        raise Exception(
            f"no {cls.__name__} is active — enter one with `with make_context() as ctx:`"
        )

    # -- configuration ---------------------------------------------------------
    def set_key(self, key) -> "InferenceContext":
        self._key = key
        return self

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def set_batch_shape(self, batch_shape):
        batch_shape = tuple(batch_shape)
        if self.batch_shape is None:
            self.batch_shape = batch_shape
            return
        if self.batch_shape != batch_shape:
            raise BatchShapeAlreadySet(
                f"Batch shape has already been set, and is not the same: "
                f"{self.batch_shape} != {batch_shape}"
            )

    # -- registration (reference context.py:136-170) ---------------------------
    def named_parameter(self, name: str, prior: Distribution) -> jax.Array:
        """Register ``prior`` under ``name`` and return the current value
        (sampling from the prior with the context key on first registration).
        Re-registration with a non-equivalent prior raises, unless inside
        :meth:`no_prior_verification`."""
        if self.batch_shape is None:
            raise BatchShapeNotSet(
                "property `batch_shape` not set! Have you called `set_batch_shape`?"
            )

        if name in self._prior_dict:
            if not self._verify_prior or self._prior_dict[name].equivalent_to(prior):
                return self._value_dict[name]
            raise NotSamePriorError(
                f"parameter '{name}' is already registered under a different prior"
            )

        if tuple(prior.batch_shape) != ():
            raise ValueError("You cannot pass a batched distribution as a prior!")

        value = prior.sample(self._next_key(), self.batch_shape)

        self._prior_dict[name] = prior
        self._value_dict[name] = value
        self._shape_dict[name] = tuple(prior.event_shape)
        self._unconstrained_shape_dict[name] = prior_ops.unconstrained_event_shape(prior)
        return value

    # -- access -----------------------------------------------------------------
    @property
    def parameters(self) -> Dict[str, jax.Array]:
        return self._value_dict

    def get_parameter(self, name: str) -> jax.Array:
        if name in self._value_dict:
            return self._value_dict[name]
        raise ParameterDoesNotExist(f"No such parameter '{name}'!")

    def get_prior(self, name: str) -> Distribution:
        return self._prior_dict.get(name, None)

    def bound_parameter(self, name: str) -> PriorBoundParameter:
        self.get_parameter(name)
        return PriorBoundParameter(self, name)

    def get_parameters(self, constrained: bool = True) -> Iterable[Tuple[str, jax.Array]]:
        for k, v in self._value_dict.items():
            yield k, (v if constrained else prior_ops.get_unconstrained(self._prior_dict[k], v))

    def get_shape(self, name: str, constrained: bool = True) -> tuple:
        return (self._shape_dict if constrained else self._unconstrained_shape_dict)[name]

    def update_parameter(self, name: str, value, constrained: bool = True):
        prior = self._prior_dict[name]
        value = jnp.asarray(value)
        if not constrained:
            value = prior_ops.get_constrained(prior, value)
        self._value_dict[name] = value

    # -- stack / unstack (reference context.py:193-236) -------------------------
    @property
    def _batch_numel(self) -> int:
        n = 1
        for s in self.batch_shape:
            n *= int(s)
        return n

    def stack_parameters(self, constrained: bool = True) -> jax.Array:
        """All parameters flattened to ``(batch_numel, total_event_numel)``."""
        shape_dict = self._shape_dict if constrained else self._unconstrained_shape_dict
        parts = []
        for n, v in self.get_parameters(constrained=constrained):
            numel = int(np.prod(shape_dict[n], dtype=np.int64)) if shape_dict[n] else 1
            parts.append(jnp.reshape(v, (-1, numel)))
        return jnp.concatenate(parts, axis=-1)

    def unstack_parameters(self, x: jax.Array, constrained: bool = True) -> "InferenceContext":
        """Functional inverse of :meth:`stack_parameters` — returns a NEW context
        with the unstacked values written in."""
        shape_dict = self._shape_dict if constrained else self._unconstrained_shape_dict
        tot_len = sum(
            (int(np.prod(s, dtype=np.int64)) if s else 1) for s in shape_dict.values()
        )
        if tot_len != x.shape[-1]:
            raise ValueError(
                f"stacked vector has {x.shape[-1]} elements but the context's "
                f"registered parameters unstack to {tot_len}"
            )

        new = self._clone_registry()
        index = 0
        for name in self._prior_dict:
            shape = shape_dict[name]
            numel = int(np.prod(shape, dtype=np.int64)) if shape else 1
            chunk = x[..., index : index + numel].reshape(self.batch_shape + shape)
            prior = self._prior_dict[name]
            new._value_dict[name] = (
                chunk if constrained else prior_ops.get_constrained(prior, chunk)
            )
            index += numel
        return new

    # -- evaluation --------------------------------------------------------------
    def initialize_parameters(self):
        """No-op: sampling happened at registration (reference context.py:245-249)."""

    def eval_priors(self, constrained: bool = True) -> jax.Array:
        total = 0.0
        for name, prior in self._prior_dict.items():
            total = total + prior_ops.eval_prior(
                prior, self._value_dict[name], constrained=constrained
            )
        return total

    # -- lane surgery (pure versions of reference context.py:255-282) -------------
    def _clone_registry(self) -> "InferenceContext":
        new = self.make_new()
        new.batch_shape = self.batch_shape
        new._prior_dict = OrderedDict(self._prior_dict)
        new._value_dict = OrderedDict(self._value_dict)
        new._shape_dict = OrderedDict(self._shape_dict)
        new._unconstrained_shape_dict = OrderedDict(self._unconstrained_shape_dict)
        new._key = self._key
        return new

    def resample(self, indices) -> "InferenceContext":
        """Gather parameter lanes by ``indices``.

        Lane surgery (``resample``/``exchange``) supports a SINGLE lane axis
        (dim 0), matching the reference's one-dim ``batch_shape`` limit
        (reference filters/base.py:116-117); ``named_parameter`` accepts
        arbitrary batch shapes for sampling, but the sequential algorithms
        that call this always set a 1-D lane shape (SURVEY.md §8)."""
        if len(self.batch_shape or ()) != 1:
            raise ValueError(
                f"lane resampling needs a 1-D batch shape; context has {self.batch_shape}"
            )
        new = self._clone_registry()
        for name, v in self._value_dict.items():
            new._value_dict[name] = jnp.take(v, indices, axis=0)
        return new

    def exchange(self, other: "InferenceContext", mask) -> "InferenceContext":
        """Lanes where ``mask`` take ``other``'s values (single lane axis on
        dim 0 — see :meth:`resample` for the limit)."""
        new = self._clone_registry()
        for name, v in self._value_dict.items():
            other_v = other.get_parameter(name)
            ev = len(self._shape_dict[name])
            m = jnp.reshape(mask, jnp.shape(mask) + (1,) * ev)
            new._value_dict[name] = jnp.where(m, other_v, v)
        return new

    # -- transforms (reference context.py:323-358) --------------------------------
    def apply_fun(self, f) -> "InferenceContext":
        """New context built by applying ``f`` to every parameter value."""
        new_values = OrderedDict((k, f(v)) for k, v in self._value_dict.items())

        batch_shapes = set()
        for k, v in new_values.items():
            ev = len(self._shape_dict[k])
            shape = jnp.shape(v)
            batch_shapes.add(shape[: len(shape) - ev] if ev else shape)
        if len(batch_shapes) != 1:
            raise ValueError(
                f"the parameter transform produced mismatched batch shapes: {sorted(batch_shapes)}"
            )

        new = self.make_new()
        new.set_batch_shape(batch_shapes.pop())
        new._key = self._key
        with new.no_prior_verification():
            for k, prior in self._prior_dict.items():
                new._prior_dict[k] = prior
                new._value_dict[k] = jnp.asarray(new_values[k])
                new._shape_dict[k] = self._shape_dict[k]
                new._unconstrained_shape_dict[k] = self._unconstrained_shape_dict[k]
        return new

    def copy(self) -> "InferenceContext":
        return self.apply_fun(lambda v: v)

    def make_new(self) -> "InferenceContext":
        return InferenceContext(key=self._key)

    def absorb(self, other: "InferenceContext") -> "InferenceContext":
        """Adopt ``other``'s values in place (same registry). The functional
        ops (`resample`/`exchange`/`unstack_parameters`) return new contexts;
        algorithms absorb those into the user-held context so that — as in the
        reference's mutate-in-place design — the handle passed to
        ``make_context()`` always reflects the current posterior."""
        if set(other._prior_dict) != set(self._prior_dict):
            raise ValueError("cannot absorb a context with different parameters")
        self._value_dict = OrderedDict(other._value_dict)
        self._key = other._key
        return self

    @contextmanager
    def no_prior_verification(self):
        """Skip prior-equivalence verification during model rebuilds
        (reference context.py:360-373)."""
        try:
            self._verify_prior = False
            yield self
        finally:
            self._verify_prior = True

    # -- checkpointing (reference context.py:291-321) -----------------------------
    def state_dict(self) -> dict:
        res = OrderedDict()
        res[self._PARAMETER_KEY] = {
            k: np.asarray(v) for k, v in self._value_dict.items()
        }
        res[self._PRIOR_KEY] = {
            k: [np.asarray(leaf) for leaf in jax.tree_util.tree_leaves(v)]
            for k, v in self._prior_dict.items()
        }
        return res

    def load_state_dict(self, state_dict: dict):
        if set(self._value_dict) != set(state_dict[self._PARAMETER_KEY]):
            raise ValueError("parameter sets differ between context and state dict")

        for k, prior in self._prior_dict.items():
            mine = [np.asarray(leaf) for leaf in jax.tree_util.tree_leaves(prior)]
            theirs = state_dict[self._PRIOR_KEY][k]
            if len(mine) != len(theirs) or not all(
                np.allclose(a, b) for a, b in zip(mine, theirs)
            ):
                raise ValueError(
                    f"checkpoint prior for '{k}' disagrees with this context's prior"
                )
            self._value_dict[k] = jnp.asarray(state_dict[self._PARAMETER_KEY][k])


class QuasiInferenceContext(InferenceContext):
    """Sobol-initialized context (reference context.py:377-408): parameters are
    (re-)initialized by inverse-CDF sampling of scrambled-Sobol uniforms on the
    unconstrained space."""

    def __init__(self, key=None, randomize: bool = True, seed: int | None = None):
        super().__init__(key=key)
        self.quasi_engine: EngineContainer | None = None
        self._randomize = randomize
        self._seed = seed

    def initialize_parameters(self):
        dim = self.stack_parameters(constrained=False).shape[-1]
        self.quasi_engine = EngineContainer(dim, self._randomize, seed=self._seed)
        probs = self.quasi_engine.sample(self.batch_shape)

        index = 0
        for name, prior in self._prior_dict.items():
            shape = self._unconstrained_shape_dict[name]
            numel = int(np.prod(shape, dtype=np.int64)) if shape else 1
            p = probs[..., index : index + numel].reshape(self.batch_shape + shape)
            unconstrained = prior_ops.inverse_sample(prior, p, constrained=False)
            self._value_dict[name] = prior_ops.get_constrained(prior, unconstrained)
            index += numel

    def make_new(self) -> "InferenceContext":
        return QuasiInferenceContext(key=self._key, randomize=self._randomize, seed=self._seed)


def make_context(use_quasi: bool = False, randomize: bool = True, key=None) -> InferenceContext:
    """Create an inference context (reference context.py:411-423)."""
    if use_quasi:
        return QuasiInferenceContext(key=key, randomize=randomize)
    return InferenceContext(key=key)


# -- pytree registration -------------------------------------------------------
# The plain context is a pytree (values + priors + key are leaves; the
# registry layout is static aux), so whole inference transitions — PMMH's
# resample/rebuild/re-filter/exchange — can run as ONE jitted device call
# instead of ~100 eager dispatches (each paying ~5 ms of tunnel latency on
# the bench host; see kernels/mh.py). Functional methods only inside jit:
# ``absorb`` and the context-manager stack remain host-side.
# ``QuasiInferenceContext`` is registered too, minus its Sobol engine (host
# state — see ``_quasi_flatten``); fused callers pre-draw the uniforms and
# reattach the engine to whatever context a jitted call returns.


def _context_flatten(ctx: InferenceContext):
    names = tuple(ctx._prior_dict)
    children = (
        tuple(ctx._value_dict[n] for n in names),
        tuple(ctx._prior_dict[n] for n in names),
        ctx._key,
    )
    aux = (
        names,
        tuple(ctx._shape_dict[n] for n in names),
        tuple(ctx._unconstrained_shape_dict[n] for n in names),
        ctx.batch_shape,
    )
    return children, aux


def _context_unflatten(aux, children, cls=InferenceContext):
    values, priors, key = children
    names, shapes, u_shapes, batch_shape = aux
    ctx = cls.__new__(cls)
    ctx._prior_dict = OrderedDict(zip(names, priors))
    ctx._value_dict = OrderedDict(zip(names, values))
    ctx._shape_dict = OrderedDict(zip(names, shapes))
    ctx._unconstrained_shape_dict = OrderedDict(zip(names, u_shapes))
    ctx.batch_shape = batch_shape
    ctx._key = key
    ctx._verify_prior = True
    return ctx


jax.tree_util.register_pytree_node(InferenceContext, _context_flatten, _context_unflatten)


def _quasi_flatten(ctx: QuasiInferenceContext):
    children, aux = _context_flatten(ctx)
    # the Sobol engine is HOST state and stays out of the pytree: fused
    # transitions pre-draw its uniforms host-side and pass them in as arrays
    # (kernels/mh.py); inside a trace the reconstructed context carries
    # ``quasi_engine=None``, which downgrades proposal refits to plain MVNs
    # — correct, since only their log_prob is consumed in-trace.
    return children, aux + (ctx._randomize, ctx._seed)


def _quasi_unflatten(aux, children):
    ctx = _context_unflatten(aux[:-2], children, cls=QuasiInferenceContext)
    ctx.quasi_engine = None
    ctx._randomize, ctx._seed = aux[-2], aux[-1]
    return ctx


jax.tree_util.register_pytree_node(QuasiInferenceContext, _quasi_flatten, _quasi_unflatten)
