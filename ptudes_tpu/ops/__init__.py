"""Device-side scan ops: projection, voxelization, hash map, deskew, ICP."""
from . import projection, voxel, hashmap, deskew, icp

__all__ = ["projection", "voxel", "hashmap", "deskew", "icp"]
