"""NESSMC2 / SMC2FW hybrids (reference sequential/nessmc2.py, smc2fw.py)."""

from __future__ import annotations

from typing import Any, Dict

from .base import CombinedSequentialParticleAlgorithm
from .kernels import ShrinkingKernel
from .ness import NESS, FixedWidthNESS
from .smc2 import SMC2


class NESSMC2(CombinedSequentialParticleAlgorithm):
    """SMC2 for the first ``switch`` observations, NESS (shrinking kernel,
    threshold 0.95) afterwards — as recommended in the NESS article
    (reference nessmc2.py)."""

    def __init__(
        self,
        filter_,
        particles: int,
        switch: int = 500,
        smc2_kw: Dict[str, Any] = None,
        ness_kw: Dict[str, Any] = None,
        context=None,
        key=None,
        **kwargs,
    ):
        super().__init__(
            filter_,
            particles,
            switch,
            first_kw=smc2_kw,
            second_kw=ness_kw,
            context=context,
            key=key,
            **kwargs,
        )

    def make_first(self, filter_, context, particles, **kwargs):
        threshold = kwargs.pop("threshold", 0.5)
        return SMC2(filter_, particles, threshold=threshold, context=context, **kwargs)

    def make_second(self, filter_, context, particles, **kwargs):
        kernel = kwargs.pop("kernel", ShrinkingKernel())
        return NESS(
            filter_,
            particles,
            kernel=kernel,
            threshold=kwargs.pop("threshold", 0.95),
            context=context,
            **kwargs,
        )

    def do_on_switch(self, first, second, state):
        return state


class SMC2FW(NESSMC2):
    """SMC2 then FixedWidthNESS (Jasra & Zhou, reference smc2fw.py)."""

    def make_second(self, filter_, context, particles, **kwargs):
        return FixedWidthNESS(filter_, particles, context=context, **kwargs)
