"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware: multi-chip sharding is validated on
XLA's host-platform device emulation, per the rebuild test plan
(SURVEY.md section 4).
"""
import os

# Must run before jax is imported anywhere. The environment presets
# JAX_PLATFORMS=axon (tunneled real TPU); tests always run on virtual CPU
# devices, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
