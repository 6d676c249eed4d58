"""Stochastic process layer — the stochproc-equivalent model API (SURVEY.md §2.9).

Re-designed JAX-first: processes are immutable pytrees (parameters and increment
distributions are leaves; model functions and static config are aux data), all
sampling takes explicit PRNG keys, and trajectory simulation is a ``lax.scan``.

User-facing API mirrors the reference's model-definition style
(/root/reference/README.md:35-82): mean/scale functions of ``(state, *params)``,
initial-kernel functions of the parameters, SDE discretization via
``AffineEulerMaruyama`` with ``dt``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from ..distributions import Distribution, Independent, Normal
from .affine import affine_transform
from .state import StateSpacePath, TimeseriesState


class StructuralStochasticProcess:
    """Abstract Markov process: initial distribution + one-step transition densities.

    Interface consumed by the filter layer (reference filters/base.py:4,
    particle/base.py:87-103, particle/state.py:38-42):
    ``initial_distribution`` / ``initial_sample``, ``build_density(state)`` (the
    transition density given the current state), ``propagate``, ``sample_states``.
    """

    event_ndim: int = 0

    # -- shapes ------------------------------------------------------------
    @property
    def n_dim(self) -> int:
        return self.event_ndim

    @property
    def event_shape(self) -> tuple:
        d = jax.eval_shape(lambda: self.initial_distribution())
        return tuple(d.event_shape)

    # -- core --------------------------------------------------------------
    def initial_distribution(self) -> Distribution:
        raise NotImplementedError

    def initial_sample(self, key, shape: Sequence[int] = ()) -> TimeseriesState:
        """Sample the initial state with the given sample (particle) shape.

        When parameters carry lane batch dims (vectorized parallel filters),
        the initial distribution's batch shape already covers the trailing dims
        of ``shape`` — only the remaining leading dims are drawn as the sample
        shape (matching stochproc's expand semantics for ``(N, K)`` particles
        over ``(K,)``-batched parameters)."""
        d = self.initial_distribution()
        shape = tuple(shape)
        bs = tuple(d.batch_shape)
        if bs and shape[len(shape) - len(bs):] == bs:
            sample_shape = shape[: len(shape) - len(bs)]
        else:
            sample_shape = shape
        value = d.sample(key, sample_shape)
        return TimeseriesState(jnp.asarray(0.0), value, self.event_ndim)

    def build_density(self, x: TimeseriesState) -> Distribution:
        """Transition density p(x_{t+1} | x_t)."""
        raise NotImplementedError

    def propagate(self, key, x: TimeseriesState) -> TimeseriesState:
        """Sample x_{t+1} ~ p(. | x_t); time advances by one step."""
        value = self.build_density(x).sample(key)
        return x.propagate_from(values=value, time_increment=1.0)

    def propagate_substeps(self, key, x: TimeseriesState, n: int) -> TimeseriesState:
        """``n`` propagation steps (the ``observe_every_step`` sub-step loop,
        reference filters/base.py:204-210). Law-equal to ``n`` calls of
        :meth:`propagate`; affine subclasses batch the noise draws."""
        if n <= 0:
            return x
        for k in jax.random.split(key, n):
            x = self.propagate(k, x)
        return x

    def sample_states(self, key, num_steps: int, x_0: TimeseriesState | None = None) -> StateSpacePath:
        """Simulate a trajectory of ``num_steps`` transitions via ``lax.scan``."""
        if x_0 is None:
            key, sub = jax.random.split(key)
            x_0 = self.initial_sample(sub)

        def step(carry, k):
            new = self.propagate(k, carry)
            return new, (new.time_index, new.value)

        keys = jax.random.split(key, num_steps)
        _, (times, values) = jax.lax.scan(step, x_0, keys)
        return StateSpacePath(times, values, None)

    def expand_initial(self, key, shape) -> TimeseriesState:
        return self.initial_sample(key, shape)


@register_pytree_node_class
class AffineProcess(StructuralStochasticProcess):
    r"""Affine process: :math:`X_{t+1} = f(X_t) + g(X_t) W_{t+1}`.

    ``mean_scale_fn(state, *params) -> (loc, scale)`` defines drift/diffusion;
    ``increment_distribution`` is the law of :math:`W`; ``initial_kernel(*params)``
    (or ``*initial_parameters`` when given) builds the initial distribution.
    Mirrors the reference's ``ts.AffineProcess(f, params, inc_dist, initial_kernel)``
    construction (README.md:58, nutria.ipynb).
    """

    def __init__(
        self,
        mean_scale_fn: Callable,
        parameters: tuple,
        increment_distribution: Distribution,
        initial_kernel: Callable,
        initial_parameters: tuple | None = None,
        event_ndim: int | None = None,
    ):
        self.mean_scale_fn = mean_scale_fn
        self.parameters = tuple(parameters)
        self.increment_distribution = increment_distribution
        self.initial_kernel = initial_kernel
        self.initial_parameters = None if initial_parameters is None else tuple(initial_parameters)
        if event_ndim is None:
            event_ndim = len(increment_distribution.event_shape)
        self.event_ndim = event_ndim

    # -- pytree ------------------------------------------------------------
    def tree_flatten(self):
        children = (self.parameters, self.increment_distribution, self.initial_parameters)
        aux = (self.mean_scale_fn, self.initial_kernel, self.event_ndim)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.parameters, obj.increment_distribution, obj.initial_parameters = children
        obj.mean_scale_fn, obj.initial_kernel, obj.event_ndim = aux
        return obj

    # -- affine interface ---------------------------------------------------
    def mean_scale(self, x: TimeseriesState) -> tuple:
        """Drift and diffusion evaluated at ``x`` (reference mean_scale, 7 call sites)."""
        return self.mean_scale_fn(x, *self.parameters)

    def initial_distribution(self) -> Distribution:
        args = self.initial_parameters if self.initial_parameters is not None else self.parameters
        return self.initial_kernel(*args)

    def build_density(self, x: TimeseriesState) -> Distribution:
        loc, scale = self.mean_scale(x)
        return affine_transform(self.increment_distribution, loc, scale)

    def propagate_substeps(self, key, x: TimeseriesState, n: int) -> TimeseriesState:
        """Affine fast path: ONE batched draw of all ``n`` increments, then
        ``loc + scale * eps`` per sub-step — law-equal to ``n`` separate
        ``propagate`` calls (the pushforward of an elementwise-Normal
        increment IS ``loc + scale * eps``), at one PRNG kernel instead of
        ``n``. Matrix-scale MVN increments keep the generic loop."""
        inc = self.increment_distribution
        elementwise = isinstance(inc, Normal) or (
            isinstance(inc, Independent) and isinstance(inc.base_dist, Normal)
        )
        if n <= 0 or not elementwise:
            return super().propagate_substeps(key, x, n)

        loc, scale = self.mean_scale(x)
        bs_es = tuple(inc.batch_shape) + tuple(inc.event_shape)
        target = jnp.broadcast_shapes(jnp.shape(loc), jnp.shape(scale), bs_es)
        prefix = target[: len(target) - len(bs_es)]
        eps = inc.sample(key, (n,) + prefix)

        x = x.propagate_from(values=loc + scale * eps[0], time_increment=1.0)
        for i in range(1, n):
            loc, scale = self.mean_scale(x)
            x = x.propagate_from(values=loc + scale * eps[i], time_increment=1.0)
        return x

    def copy_with(self, parameters: tuple) -> "AffineProcess":
        """Same process with new parameter leaves (functional parameter update).

        ``parameters`` is always the FIRST pytree child, for the base class
        and for model subclasses that flatten to ``(parameters,)`` alone."""
        children, aux = self.tree_flatten()
        new_children = (tuple(parameters),) + tuple(children[1:])
        return type(self).tree_unflatten(aux, new_children)


@register_pytree_node_class
class AffineEulerMaruyama(AffineProcess):
    r"""Euler-Maruyama discretized SDE: ``x' = x + drift(x) * dt + scale(x) * dW``.

    ``mean_scale_fn`` returns ``(drift, scale)``; the increment distribution is the
    law of ``dW`` (typically ``Normal(0, sqrt(dt))`` — README.md:57). The process
    time index advances by one per sub-step; ``observe_every_step`` on the SSM maps
    sub-steps to observations.
    """

    def __init__(
        self,
        mean_scale_fn,
        parameters,
        increment_distribution,
        initial_kernel,
        dt: float,
        initial_parameters=None,
        event_ndim=None,
    ):
        super().__init__(
            mean_scale_fn,
            parameters,
            increment_distribution,
            initial_kernel,
            initial_parameters=initial_parameters,
            event_ndim=event_ndim,
        )
        self.dt = dt

    def tree_flatten(self):
        children = (self.parameters, self.increment_distribution, self.initial_parameters)
        aux = (self.mean_scale_fn, self.initial_kernel, self.event_ndim, self.dt)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.parameters, obj.increment_distribution, obj.initial_parameters = children
        obj.mean_scale_fn, obj.initial_kernel, obj.event_ndim, obj.dt = aux
        return obj

    def mean_scale(self, x: TimeseriesState) -> tuple:
        drift, scale = self.mean_scale_fn(x, *self.parameters)
        return x.value + drift * self.dt, scale


def _linear_mean_scale(x, a, b, sigma):
    a = jnp.asarray(a)
    if a.ndim >= 2:
        loc = b + jnp.einsum("...ij,...j->...i", a, x.value)
    else:
        loc = b + a * x.value
    return loc, sigma


@register_pytree_node_class
class LinearModel(AffineProcess):
    r"""Linear-Gaussian process ``x' = b + A x + sigma * eps``.

    Parameters normalize to ``(a, b, sigma)`` — a missing offset becomes 0
    (matching stochproc's normalization, visible in the reference's
    ``lambda m_, _, s_: ...`` initial kernels, tests/filters/models.py:37-40).
    """

    def __init__(self, parameters, increment_distribution, initial_kernel, event_ndim=None):
        parameters = tuple(parameters)
        if len(parameters) == 2:
            a, sigma = parameters
            parameters = (a, jnp.zeros_like(jnp.asarray(sigma)), sigma)
        elif len(parameters) != 3:
            raise ValueError("LinearModel takes (a, sigma) or (a, b, sigma)")
        super().__init__(
            _linear_mean_scale,
            parameters,
            increment_distribution,
            initial_kernel,
            event_ndim=event_ndim,
        )

    def tree_flatten(self):
        children = (self.parameters, self.increment_distribution, self.initial_parameters)
        aux = (self.initial_kernel, self.event_ndim)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.parameters, obj.increment_distribution, obj.initial_parameters = children
        obj.initial_kernel, obj.event_ndim = aux
        obj.mean_scale_fn = _linear_mean_scale
        return obj
