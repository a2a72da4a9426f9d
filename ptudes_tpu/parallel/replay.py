"""Multi-bag replay and parameter sweeps (data parallelism over sequences).

BASELINE config 5: "Batched 8-way multi-bag replay (vmap over sequences)
for ICP/EKF hyperparameter sweep on a TPU slice". Sequences are
embarrassingly parallel — each device (or mesh row) runs an independent
lax.scan; stacking along the leading axis + a 'bag' sharding gives linear
scaling with zero collectives (SURVEY.md section 2c consequence (1)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import PipelineConfig
from ..models import lio
from ..ops.projection import XyzLut


def stack_bags(items: list):
    """Stack a list of pytrees (states or batches) along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *items)


def replay_bags(
    states: lio.LioState,      # stacked [B, ...]
    batches: lio.ScanBatch,    # stacked [B, N, ...]
    lut: XyzLut,
    cfg: PipelineConfig,
    mesh: Mesh | None = None,
):
    """vmapped run_sequence over the bag axis, sharded over mesh axis 'bag'
    when a mesh is given (otherwise single-device vmap)."""
    run = jax.vmap(lambda s, b: lio.run_sequence(s, b, lut, cfg=cfg))
    if mesh is None:
        return jax.jit(run)(states, batches)
    bag = NamedSharding(mesh, P("bag"))
    states = jax.device_put(states, bag)
    batches = jax.device_put(batches, bag)
    return jax.jit(run, out_shardings=(bag, bag))(states, batches)
