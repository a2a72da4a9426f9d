"""Parallelism: device meshes, multi-bag DP replay, point-sharded ICP,
replica-fused same-chip batching."""
from . import batched, mesh, replay, sharded

__all__ = ["batched", "mesh", "replay", "sharded"]
