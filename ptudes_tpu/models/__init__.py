"""Model families: KISS odometry, ES-EKF INS, fused LIO, simulators."""
from . import esekf, kiss, lio, sim

__all__ = ["esekf", "kiss", "lio", "sim"]
