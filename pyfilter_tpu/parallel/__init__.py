"""Multi-chip parallelism: mesh construction and sharded filtering.

This is NEW capability relative to the reference (SURVEY.md §2.8: the reference
has no distributed backend — its only parallelism is a broadcast batch dim).
The TPU-native scaling axes of an SMC library are:

- the particle axis ``N`` — sharded over devices; weight normalization / ESS /
  loglik become cross-device reductions and systematic resampling becomes a
  global cumsum + gather, all inserted automatically by XLA's SPMD partitioner
  from sharding annotations (the scaling-book recipe: pick a mesh, annotate,
  let XLA place collectives on ICI);
- the parameter-lane axis ``K`` (SMC2 / PMMH chains) — embarrassingly
  parallel; the only cross-lane ops are small (param ESS, MVN fits).
"""

from . import collective
from .sharding import (
    lane_sharded_filter,
    make_mesh,
    shard_filter_state,
    sharded_batch_filter,
    sharded_filter_step,
)
from .enkf import spmd_enkf
from .spmd import (
    spmd_batch_filter,
    spmd_predict,
    spmd_smooth,
    spmd_smoothed_log_likelihood,
)

__all__ = [
    "make_mesh",
    "shard_filter_state",
    "sharded_batch_filter",
    "sharded_filter_step",
    "lane_sharded_filter",
    "spmd_batch_filter",
    "spmd_enkf",
    "spmd_predict",
    "spmd_smooth",
    "spmd_smoothed_log_likelihood",
    "collective",
]
