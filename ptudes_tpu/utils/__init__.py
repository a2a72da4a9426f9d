"""Metrics, stream statistics and trajectory utilities."""
from . import metrics, stats, trajectory

__all__ = ["metrics", "stats", "trajectory"]
