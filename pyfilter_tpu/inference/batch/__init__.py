"""Batch inference algorithms (reference inference/batch/)."""

from . import mcmc
from .if2 import IF2, IF2Result

__all__ = ["mcmc", "IF2", "IF2Result"]
