"""Bootstrap proposal — propose from the transition density.

Reference: pyfilter/filters/particle/proposals/bootstrap.py.
"""

from __future__ import annotations

import dataclasses

from .base import Proposal


@dataclasses.dataclass(frozen=True)
class Bootstrap(Proposal):
    """q = p(x_t | x_{t-1}); incremental weight = log p(y_t | x_t)."""

    def sample_and_weight(self, key, model, y, prediction):
        new_x = model.hidden.propagate(key, prediction.get_timeseries_state())
        dist = model.build_density(new_x)
        return new_x, dist.log_prob(y)
