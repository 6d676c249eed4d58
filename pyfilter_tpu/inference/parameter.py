"""Parameter view bound to a prior and a context.

Re-design of the reference's ``PriorBoundParameter`` (inference/parameter.py) —
there a ``torch.nn.Parameter`` subclass mutated in place; here a lightweight
named view over the context's immutable value store. The value itself is a
plain ``jnp`` array (model builders receive arrays, so everything rides through
``jit``/``vmap`` untouched).
"""

from __future__ import annotations

import jax

from . import prior as prior_ops


class PriorBoundParameter:
    """Named handle ``(context, name)`` exposing the reference's parameter
    surface: ``value``, ``prior``, ``get_unconstrained``, ``eval_prior``,
    ``inverse_sample`` (reference parameter.py:50-108)."""

    def __init__(self, context, name: str):
        self._context = context
        self.name = name

    @property
    def prior(self):
        return self._context.get_prior(self.name)

    @property
    def value(self) -> jax.Array:
        return self._context.get_parameter(self.name)

    def get_constrained(self) -> jax.Array:
        return self.value

    def get_unconstrained(self) -> jax.Array:
        return prior_ops.get_unconstrained(self.prior, self.value)

    def eval_prior(self, constrained: bool = True) -> jax.Array:
        return prior_ops.eval_prior(self.prior, self.value, constrained=constrained)

    def inverse_sample(self, probs, constrained: bool = True) -> jax.Array:
        """Inverse-CDF transform of uniforms under the (un)constrained prior;
        returns the *constrained* value (reference parameter.py:101-108)."""
        drawn = prior_ops.inverse_sample(self.prior, probs, constrained=constrained)
        if not constrained:
            drawn = prior_ops.get_constrained(self.prior, drawn)
        return drawn

    def update(self, value, constrained: bool = True) -> None:
        """Write a new value into the owning context (reference
        parameter.py:68-87)."""
        self._context.update_parameter(self.name, value, constrained=constrained)

    def __repr__(self):
        return f"PriorBoundParameter({self.name!r}, value={self.value!r})"
