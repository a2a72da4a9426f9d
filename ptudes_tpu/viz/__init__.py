"""Visualization: matplotlib graphs, cloud accumulation/PLY, flyby camera."""
from . import cloud, fly, graphs

__all__ = ["cloud", "fly", "graphs"]
