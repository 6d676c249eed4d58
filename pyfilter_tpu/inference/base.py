"""Abstract inference algorithm (reference pyfilter/inference/base.py).

Algorithms hold a filter and a context. Because every state update here is
functional, the algorithm object re-binds ``self.filter`` / ``self.context``
whenever parameters change — the jitted kernels themselves stay pure.
"""

from __future__ import annotations

import jax

from ..filters.base import BaseFilter
from .context import InferenceContext
from .logging import DefaultLogger
from .state import AlgorithmState


class BaseAlgorithm:
    def __init__(self, filter_: BaseFilter, context: InferenceContext = None, key=None):
        self._filter = filter_
        self.context = context if context is not None else InferenceContext.get_context()
        self._key = key if key is not None else jax.random.PRNGKey(0)

    @property
    def filter(self) -> BaseFilter:
        return self._filter

    @filter.setter
    def filter(self, value: BaseFilter):
        self._filter = value

    def set_key(self, key) -> "BaseAlgorithm":
        self._key = key
        return self

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def fit(self, y, logging: DefaultLogger = None) -> AlgorithmState:
        raise NotImplementedError

    def __repr__(self):
        return str(self.__class__.__name__)
