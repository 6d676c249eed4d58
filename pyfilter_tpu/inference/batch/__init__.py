"""Batch inference algorithms (reference inference/batch/)."""

from . import mcmc

__all__ = ["mcmc"]
