"""Parallelism: device meshes, multi-bag DP replay, point-sharded ICP."""
from . import mesh, replay, sharded

__all__ = ["mesh", "replay", "sharded"]
