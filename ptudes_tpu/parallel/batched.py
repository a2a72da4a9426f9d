"""Replica-fused multi-sequence replay on ONE chip.

Round-2 finding (docs/PERF.md): ``vmap``ping B independent LIO pipelines
on one chip COLLAPSES (~16x slower aggregate at B=2) because the hash-map
insert's batched scatters serialize ~5x worse per element than unbatched
scatters, while every dense stage scales ~2x at B=2. This module is the
fix: the B replica maps live in ONE flat hash table with disjoint
per-replica slot ranges (``hashmap.create_batched``), the dense per-scan
stages run under ``jax.vmap`` exactly as before (``lio.make_scan_step``
with ``defer_insert=True``), and the map insert+evict runs ONCE per scan
step over all replicas' new points as plain unbatched scatters
(``hashmap.insert_deduped_batched``).

Algorithmic parity: replica b's voxel keys hash into slots
``[b*C, (b+1)*C)``, so the flat table IS B independent maps — for the
exact insert modes the stored map content matches B separate
single-sequence runs bit-for-bit (the octant rule is content-addressed
and per-replica frames are sub-voxel-unique). The ``overflow=False``
budget mode decimates per replica with the single-sequence rule.

Use this (not ``parallel.replay``) to pack multiple sequences onto one
chip; across chips, the ``bag`` mesh axis of ``parallel.replay`` remains
the linear-scaling axis (one unbatched program per chip).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import PipelineConfig
from ..models import lio
from ..ops import hashmap
from ..ops.projection import XyzLut


def _map_view(flat: hashmap.VoxelHashMap, b: int,
              c: int) -> hashmap.VoxelHashMap:
    """Per-replica [B, C, ...] view of the flat table (free reshape)."""
    return hashmap.VoxelHashMap(
        meta=flat.meta.reshape(b, c, hashmap.META_W),
        points=flat.points.reshape(b, c, flat.points.shape[-1]))


def _strip_map(state: lio.LioState) -> lio.LioState:
    """Replace the (stacked) map with a zero-capacity placeholder so the
    scan carry holds the map ONCE (flat), not per-replica views."""
    return state._replace(kiss=state.kiss._replace(
        local_map=jax.tree.map(lambda x: x[:, :0],
                               state.kiss.local_map)))


@partial(jax.jit, static_argnames=("cfg", "log"))
def run_sequence_batched(
    states: lio.LioState,      # stacked [B, ...] (replay.stack_bags)
    batches: lio.ScanBatch,    # stacked [B, N, ...]
    lut: XyzLut,
    *,
    cfg: PipelineConfig,
    log: bool = False,
) -> tuple[lio.LioState, lio.LioOut]:
    """B replicas through the fused pipeline with a shared flat map table.

    Same in/out contract as ``vmap(run_sequence)`` (what
    ``parallel.replay.replay_bags`` runs): stacked states in, stacked
    states + stacked [B, N] outputs back.
    """
    if cfg.map_frozen:
        raise ValueError(
            "map_frozen is not supported by the batched replica driver "
            "(its flat-table path always defers the map insert); run "
            "frozen-map sequences through lio.run_sequence or "
            "parallel.replay instead")
    b, c = states.kiss.local_map.meta.shape[:2]
    n = batches.range_m.shape[1]
    vs = cfg.kiss.resolved_voxel_size

    flat0 = hashmap.VoxelHashMap(
        meta=states.kiss.local_map.meta.reshape(b * c, hashmap.META_W),
        points=states.kiss.local_map.points.reshape(
            b * c, states.kiss.local_map.points.shape[-1]))
    rest0 = _strip_map(states)
    # time-major for lax.scan over the shared time axis
    tb = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), batches)

    # packed per-scan outputs (ONE flat f32 row per scan per replica
    # instead of ~15 stacked LioOut leaves — the same dynamic-update-slice
    # saving as the single-device driver, VERDICT r3 #5); log mode keeps
    # the unpacked pytree (FilterLog arrays don't pack)
    pk = not log
    slot_bases = jnp.arange(b, dtype=jnp.int32) * c

    def make_body(insert_overflow):
        # flat-map mode: the step takes the UNBATCHED flat table (vmap
        # in_axes None on the map leaves) plus a per-replica slot base,
        # so the ICP candidate gathers lower as single flat-index-space
        # gathers — batched gathers row-serialize per replica exactly
        # like the batched scatters the flat insert already avoids
        step = lio.make_scan_step(lut, cfg, insert_overflow=insert_overflow,
                                  log=log, defer_insert=True, pack_out=pk,
                                  map_logical_capacity=c)
        state_axes = lio.LioState(
            kiss=lio.kiss.KissState(
                local_map=hashmap.VoxelHashMap(meta=None, points=None),
                pose=0, pose_prev=0, model_sse=0, num_samples=0,
                num_scans=0),
            ekf=0)
        vstep = jax.vmap(step, in_axes=(state_axes, 0, 0))

        def body(carry, batch_t):
            flat, rest = carry
            st = rest._replace(kiss=rest.kiss._replace(local_map=flat))
            st1, (out, dfr) = vstep(st, batch_t, slot_bases)
            flat1 = hashmap.insert_deduped_batched(
                flat, dfr.frame_w, dfr.mask,
                voxel_size=vs, max_probes=cfg.cap.max_probes,
                new_capacity=(cfg.cap.max_frame if insert_overflow is True
                              else cfg.cap.max_new_per_scan),
                overflow=insert_overflow, logical_capacity=c)
            flat1 = hashmap.remove_far_batched(
                flat1, dfr.origin, dfr.evict_r2, logical_capacity=c)
            counts = flat1.meta[:, 1].reshape(b, c)
            map_pts = jnp.sum(counts, axis=1)
            if pk:
                out = out.at[:, lio.PK_MAP_POINTS].set(
                    map_pts.astype(jnp.float32))
            else:
                out = out._replace(aux=out.aux._replace(map_points=map_pts))
            return (flat1, _strip_map(st1)), out

        return body

    k = n if cfg.bootstrap_scans < 0 else min(cfg.bootstrap_scans, n)
    carry = (flat0, rest0)
    if k >= n:
        carry, out = jax.lax.scan(make_body(True), carry, tb)
    elif k == 0:
        carry, out = jax.lax.scan(
            make_body(cfg.steady_insert_mode), carry, tb)
    else:
        head = jax.tree.map(lambda x: x[:k], tb)
        rest_b = jax.tree.map(lambda x: x[k:], tb)
        carry, out_h = jax.lax.scan(make_body(True), carry, head)
        carry, out_t = jax.lax.scan(
            make_body(cfg.steady_insert_mode), carry, rest_b)
        out = jax.tree.map(
            lambda a_, b_: jnp.concatenate([a_, b_], axis=0), out_h, out_t)

    flat, rest = carry
    fin = rest._replace(kiss=rest.kiss._replace(
        local_map=_map_view(flat, b, c)))
    out = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), out)
    return fin, (lio.unpack_out(out) if pk else out)
