"""Linearized proposal — mode-find the joint density, propose from a Gaussian.

Reference: pyfilter/filters/particle/proposals/linearized.py. The reference's
two engines (functorch vs legacy autograd, utils.py:64-216) collapse into one
JAX implementation (:func:`..proposals.utils.find_mode`); ``use_functorch`` is
therefore not a knob here.
"""

from __future__ import annotations

import dataclasses

from .base import Proposal
from .utils import find_mode


@dataclasses.dataclass(frozen=True)
class Linearized(Proposal):
    """Approximate the optimal proposal by linearizing
    :math:`\\log p(y_t|x_t) + \\log p(x_t|x_{t-1})` around the propagated mean
    (reference linearized.py:53-73).

    ``n_steps`` gradient (or damped-Newton, with ``use_second_order``) steps of
    size ``alpha``.
    """

    n_steps: int = 1
    alpha: float = 1e-4
    use_second_order: bool = False
    #: accepted for reference-signature compatibility; both engines collapse
    #: into the single JAX implementation (reference utils.py:64-216)
    use_functorch: bool = True

    def __post_init__(self):
        if self.n_steps < 1:
            raise ValueError("n_steps must be >= 1")

    def sample_and_weight(self, key, model, y, prediction):
        if not hasattr(model.hidden, "mean_scale"):
            raise ValueError("Linearized requires an affine hidden process")
        x = prediction.get_timeseries_state()

        mean, std = model.hidden.mean_scale(x)
        x_dist = prediction.get_predictive_density(model)

        kernel = find_mode(
            model,
            x,
            y,
            init_x=mean,
            init_std=std,
            num_steps=self.n_steps,
            alpha=self.alpha,
            use_hessian=self.use_second_order,
        )

        x_result = x.propagate_from(values=kernel.sample(key))
        return x_result, self._weight_with_kernel(model, y, x_dist, x_result, kernel)
