"""Fixed-capacity voxel hash map in HBM.

TPU-native replacement for kiss-icp's C++ ``VoxelHashMap`` (reference call
sites ``src/ptudes/kiss.py:108-114,129,161``): a persistent local map that
supports

* ``insert``  — scatter up to ``max_points_per_voxel`` points per voxel,
* ``query``   — nearest neighbor over the 27-voxel neighborhood,
* ``remove_far`` — distance-based eviction around the current origin,

all with static shapes, pure-functional updates, and only scatter/gather
primitives, so the whole structure lives in the ``lax.scan`` carry of the
odometry loop (SURVEY.md section 7, stage 4).

Layout: open addressing with linear probing over a power-of-two table.

    keys   [C, 3] int32 — voxel coordinate (SENTINEL_COORD when free)
    points [C, P, 3] f32 — stored points
    counts [C]    int32 — valid points in slot (0 for free/evicted)

Concurrency-free insert protocol: (A) every point first searches its FULL
probe chain for an existing entry of its voxel key; (B) still-unresolved
points then claim free slots round by round, arbitrated by scatter-min of
the batch index — same-voxel losers match the winner's slot in the same
round's post-claim check. Because lookup always precedes claiming and both
insert and query scan the entire probe chain, eviction (slots reset to
free) never creates duplicate or unreachable entries.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .voxel import spatial_hash, voxel_coords

SENTINEL_COORD = jnp.int32(-(2**31) + 1)
_INT_MAX = jnp.int32(2**31 - 1)

# 27-neighborhood offsets (static), center voxel first so ties prefer it
_NEIGHBOR_OFFSETS = np.array(
    sorted(
        [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
        key=lambda o: (abs(o[0]) + abs(o[1]) + abs(o[2])),
    ),
    dtype=np.int32,
)


class VoxelHashMap(NamedTuple):
    keys: jax.Array    # [C, 3] int32
    points: jax.Array  # [C, P, 3] f32
    counts: jax.Array  # [C] int32


def create(capacity: int, max_points_per_voxel: int) -> VoxelHashMap:
    assert capacity & (capacity - 1) == 0, "capacity must be a power of two"
    return VoxelHashMap(
        keys=jnp.full((capacity, 3), SENTINEL_COORD, jnp.int32),
        points=jnp.zeros((capacity, max_points_per_voxel, 3), jnp.float32),
        counts=jnp.zeros((capacity,), jnp.int32),
    )


def num_points(m: VoxelHashMap) -> jax.Array:
    return jnp.sum(m.counts)


def is_empty(m: VoxelHashMap) -> jax.Array:
    return num_points(m) == 0


@partial(jax.jit, static_argnames=("voxel_size", "max_probes"))
def insert(
    m: VoxelHashMap,
    pts: jax.Array,          # [N, 3]
    mask: jax.Array,         # [N] bool
    *,
    voxel_size: float,
    max_probes: int = 8,
) -> VoxelHashMap:
    """Insert masked points (kiss ``VoxelHashMap::AddPoints`` semantics:
    append until the voxel holds ``max_points_per_voxel`` points)."""
    cap = m.keys.shape[0]
    ppv = m.points.shape[1]
    n = pts.shape[0]

    coords = voxel_coords(pts, voxel_size)                   # [N, 3]
    h0 = spatial_hash(coords, cap)                           # [N]
    idx = jnp.arange(n, dtype=jnp.int32)

    keys = m.keys
    slot = jnp.full((n,), cap, jnp.int32)                    # cap = "dropped"
    resolved = ~mask

    # phase A — lookup: search the FULL probe chain for an existing entry
    # before any claiming, otherwise a free earlier-probe slot would shadow
    # an existing later-probe entry and fragment the map into duplicates
    for r in range(max_probes):
        s = (h0 + r) & (cap - 1)
        match = (~resolved) & jnp.all(keys[s] == coords, axis=-1)
        slot = jnp.where(match, s, slot)
        resolved = resolved | match

    # phase B — claim rounds: unresolved keys race for free slots by
    # scatter-min of batch index; same-key losers match the winner's slot
    # in the post-claim check of the same round
    for r in range(max_probes):
        s = (h0 + r) & (cap - 1)
        free = jnp.all(keys[s] == SENTINEL_COORD, axis=-1)
        want = (~resolved) & free
        claim = jnp.full((cap,), _INT_MAX, jnp.int32)
        claim = claim.at[s].min(jnp.where(want, idx, _INT_MAX), mode="drop")
        won = want & (claim[s] == idx)
        keys = keys.at[jnp.where(won, s, cap)].set(
            jnp.where(won[:, None], coords, SENTINEL_COORD), mode="drop"
        )
        match = (~resolved) & jnp.all(keys[s] == coords, axis=-1)
        slot = jnp.where(match, s, slot)
        resolved = resolved | match

    # rank of each point within its slot (stable order by batch index):
    # sort by slot, positions within equal-slot runs
    order = jnp.argsort(slot, stable=True)
    slot_sorted = slot[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    run_start = jnp.where(
        jnp.concatenate([jnp.array([True]), slot_sorted[1:] != slot_sorted[:-1]]),
        pos,
        0,
    )
    run_start = jax.lax.associative_scan(jnp.maximum, run_start)
    rank_sorted = pos - run_start
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)

    base = m.counts.at[slot].get(mode="fill", fill_value=0)
    write_pos = base + rank
    accept = resolved & (write_pos < ppv)

    tgt_slot = jnp.where(accept, slot, cap)                  # OOB -> dropped
    points = m.points.at[tgt_slot, jnp.where(accept, write_pos, 0)].set(
        pts, mode="drop"
    )
    counts = m.counts.at[tgt_slot].add(
        accept.astype(jnp.int32), mode="drop"
    )
    return VoxelHashMap(keys=keys, points=points, counts=counts)


@partial(jax.jit, static_argnames=("voxel_size", "max_probes"))
def query(
    m: VoxelHashMap,
    q: jax.Array,            # [M, 3]
    *,
    voxel_size: float,
    max_probes: int = 8,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Nearest stored neighbor of each query point over 27 adjacent voxels
    (kiss-icp ``GetClosestNeighbor`` semantics).

    Returns (nn [M, 3], dist2 [M], found [M]).
    """
    cap = m.keys.shape[0]
    ppv = m.points.shape[1]
    mnum = q.shape[0]

    qc = voxel_coords(q, voxel_size)                         # [M, 3]
    offsets = jnp.asarray(_NEIGHBOR_OFFSETS)                 # [27, 3]

    best_d2 = jnp.full((mnum,), jnp.inf, jnp.float32)
    best_nn = jnp.zeros((mnum, 3), jnp.float32)

    # per-neighbor running min keeps the working set small
    for j in range(offsets.shape[0]):
        key = qc + offsets[j]                                # [M, 3]
        h0 = spatial_hash(key, cap)
        found_slot = jnp.full((mnum,), cap, jnp.int32)
        found = jnp.zeros((mnum,), bool)
        for r in range(max_probes):
            s = (h0 + r) & (cap - 1)
            match = jnp.all(m.keys[s] == key, axis=-1) & ~found
            found_slot = jnp.where(match, s, found_slot)
            found = found | match

        cnt = m.counts.at[found_slot].get(mode="fill", fill_value=0)
        vox_pts = m.points.at[found_slot].get(
            mode="fill", fill_value=0.0
        )                                                    # [M, P, 3]
        d2 = jnp.sum((vox_pts - q[:, None, :]) ** 2, axis=-1)  # [M, P]
        valid = jnp.arange(ppv, dtype=jnp.int32)[None, :] < cnt[:, None]
        d2 = jnp.where(valid, d2, jnp.inf)
        k = jnp.argmin(d2, axis=-1)
        dmin = jnp.take_along_axis(d2, k[:, None], axis=-1)[:, 0]
        better = dmin < best_d2
        best_nn = jnp.where(
            better[:, None],
            jnp.take_along_axis(vox_pts, k[:, None, None], axis=1)[:, 0],
            best_nn,
        )
        best_d2 = jnp.where(better, dmin, best_d2)

    return best_nn, best_d2, jnp.isfinite(best_d2)


@partial(jax.jit, static_argnames=())
def remove_far(
    m: VoxelHashMap, origin: jax.Array, max_range2: jax.Array
) -> VoxelHashMap:
    """Evict voxels whose first stored point is farther than sqrt(max_range2)
    from origin (kiss ``RemovePointsFarFromLocation`` uses the voxel's first
    point)."""
    occupied = m.counts > 0
    first_pt = m.points[:, 0, :]
    d2 = jnp.sum((first_pt - origin[None, :]) ** 2, axis=-1)
    evict = occupied & (d2 > max_range2)
    keys = jnp.where(evict[:, None], SENTINEL_COORD, m.keys)
    counts = jnp.where(evict, 0, m.counts)
    return VoxelHashMap(keys=keys, points=m.points, counts=counts)
