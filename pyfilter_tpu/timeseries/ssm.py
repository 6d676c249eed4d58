"""State-space models: hidden process + observation density builder.

Equivalent of stochproc's ``StateSpaceModel`` / ``LinearStateSpaceModel`` as
consumed by the reference (SURVEY.md §2.9: ``.hidden``, ``.build_density(state)``,
``.parameters``, ``.observe_every_step``, ``.sample_states``, ``.n_dim``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

from ..distributions import Distribution, Normal
from .process import StructuralStochasticProcess
from .state import StateSpacePath, TimeseriesState


@register_pytree_node_class
class StateSpaceModel:
    r"""Hidden Markov process observed through a pluggable observation density.

    ``observation_builder(x_state, *parameters) -> Distribution`` builds
    :math:`p(y_t | x_t)` (the reference's ``build_obs(x, *params)`` style,
    README.md:44-45). ``observe_every_step`` sub-steps the hidden process between
    observations (SDE thinning — filters/base.py:204-210).
    """

    def __init__(
        self,
        hidden: StructuralStochasticProcess,
        observation_builder: Callable,
        parameters: tuple = (),
        observe_every_step: int = 1,
    ):
        self.hidden = hidden
        self.observation_builder = observation_builder
        self.parameters = tuple(parameters)
        self.observe_every_step = int(observe_every_step)

    # -- pytree ------------------------------------------------------------
    def tree_flatten(self):
        return (self.hidden, self.parameters), (self.observation_builder, self.observe_every_step)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.hidden, obj.parameters = children
        obj.observation_builder, obj.observe_every_step = aux
        return obj

    # -- observation interface ----------------------------------------------
    def build_density(self, x: TimeseriesState) -> Distribution:
        """Observation density p(y_t | x_t)."""
        return self.observation_builder(x, *self.parameters)

    @property
    def event_shape(self) -> tuple:
        """Observation event shape, derived abstractly (no FLOPs)."""
        dist_struct = jax.eval_shape(
            lambda hidden, params: _abstract_obs_density(hidden, params, self),
            self.hidden,
            self.parameters,
        )
        return tuple(dist_struct.event_shape)

    @property
    def n_dim(self) -> int:
        return len(self.event_shape)

    # -- simulation ---------------------------------------------------------
    def initial_sample(self, key, shape=()) -> TimeseriesState:
        return self.hidden.initial_sample(key, shape)

    def sample_states(self, key, num_steps: int, x_0: TimeseriesState | None = None) -> StateSpacePath:
        """Simulate hidden path + observations; unobserved sub-steps yield NaN
        observations (matching the reference's sampled-path convention)."""
        if x_0 is None:
            key, sub = jax.random.split(key)
            x_0 = self.hidden.initial_sample(sub)

        oes = self.observe_every_step

        def step(x, k):
            k_h, k_o = jax.random.split(k)
            new_x = self.hidden.propagate(k_h, x)
            y_dist = self.build_density(new_x)
            y = y_dist.sample(k_o)
            observed = jnp.asarray(new_x.time_index % oes == 0)
            y = jnp.where(observed, y, jnp.nan)
            return new_x, (new_x.time_index, new_x.value, y)

        keys = jax.random.split(key, num_steps)
        _, (times, xs, ys) = jax.lax.scan(step, x_0, keys)
        return StateSpacePath(times, xs, ys)


def _abstract_obs_density(hidden, parameters, template: StateSpaceModel):
    """Build the observation density on an abstractly-sampled initial state.

    Runs under ``jax.eval_shape`` so no actual sampling happens.
    """
    x0 = hidden.initial_sample(jax.random.PRNGKey(0))
    return template.observation_builder(x0, *parameters)


def _linear_obs_builder_factory(obs_event_ndim: int):
    def build(x, a, b, s):
        a_arr = jnp.asarray(a)
        if a_arr.ndim >= 2:
            loc = b + jnp.einsum("...ij,...j->...i", a_arr, x.value)
        else:
            loc = b + a_arr * x.value
        dist = Normal(loc, s)
        if obs_event_ndim:
            dist = dist.to_event(obs_event_ndim)
        return dist

    return build


@register_pytree_node_class
class LinearStateSpaceModel(StateSpaceModel):
    r"""SSM with linear-Gaussian observations :math:`Y_t = b + A X_t + s V_t`.

    ``parameters`` may be ``(a, s)`` or ``(a, b, s)``; normalized to the latter
    (the reference's proposal unpacks ``a, b, s = model.parameters``,
    proposals/linear.py:48). ``event_shape`` is the observation event shape
    (``()`` scalar or ``(d,)``), passed explicitly as in stochproc.
    """

    def __init__(self, hidden, parameters, event_shape=(), observe_every_step: int = 1):
        parameters = tuple(parameters)
        if len(parameters) == 2:
            a, s = parameters
            parameters = (a, jnp.zeros_like(jnp.asarray(s)), s)
        elif len(parameters) != 3:
            raise ValueError("LinearStateSpaceModel takes (a, s) or (a, b, s)")
        event_shape = tuple(event_shape)
        super().__init__(
            hidden,
            _linear_obs_builder_factory(len(event_shape)),
            parameters,
            observe_every_step=observe_every_step,
        )
        self._event_shape = event_shape

    def tree_flatten(self):
        return (self.hidden, self.parameters), (self._event_shape, self.observe_every_step)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.hidden, obj.parameters = children
        obj._event_shape, obj.observe_every_step = aux
        obj.observation_builder = _linear_obs_builder_factory(len(obj._event_shape))
        return obj

    @property
    def event_shape(self):
        return self._event_shape
