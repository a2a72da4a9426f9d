"""Third-level compile bisection: cumulative composition of the insert's
stages, since every op alone compiles in <1.2 s but the composed
insert_deduped costs ~35 s (profile_compile_insert.py).

    PTUDES_COMPILE_CACHE=off python tools/profile_compile_insert2.py [name ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ptudes_tpu.ops import hashmap  # noqa: E402
from ptudes_tpu.ops.voxel import compact_with_payload, voxel_coords  # noqa: E402

CAP = 1 << 19
PPV = 8
CHUNK = 4096
FRAME = 32768
VS = 0.3
_INT_MAX = np.int32(2**31 - 1)


def clock(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.monotonic()
    low = jfn.lower(*args)
    t_low = time.monotonic() - t0
    t0 = time.monotonic()
    low.compile()
    t_comp = time.monotonic() - t0
    print(f"{name:30s} lower {t_low:6.1f}s  compile {t_comp:6.1f}s",
          flush=True)


def phase_a(m, pts, mask):
    coords = voxel_coords(pts, VS)
    sub = voxel_coords(pts, 0.5 * VS) - 2 * coords
    sub_id = sub[:, 0] + 2 * sub[:, 1] + 4 * sub[:, 2]
    fp, h0 = hashmap._fingerprint_and_slot(coords, CAP)
    s = h0 & (CAP - 1)
    rows = m.meta.at[s].get(mode="fill", fill_value=0)
    match = rows[:, 0] == fp
    slot = jnp.where(match, s, CAP)
    occ = jnp.where(match, rows[:, 5], 0)
    free_seen = rows[:, 0] == 0
    is_new = mask & jnp.where(
        match, ~((occ >> sub_id) & 1).astype(bool), free_seen)
    return slot, match, is_new


def upto_compact(m, pts, mask):
    slot, found, is_new = phase_a(m, pts, mask)
    new_pos = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    payload = jnp.stack([slot, found.astype(jnp.int32)], axis=1)
    cpts, cpay, cmask = compact_with_payload(
        pts, payload, is_new & (new_pos < CHUNK), CHUNK)
    return cpts, cpay, cmask


def upto_claim(m, pts, mask):
    cpts, cpay, cmask = upto_compact(m, pts, mask)
    fps = m.meta[:, 0]
    cslot = jnp.where(cmask, cpay[:, 0], CAP)
    cfound = cmask & (cpay[:, 1] > 0)
    ccoords = voxel_coords(cpts, VS)
    cfp, ch0 = hashmap._fingerprint_and_slot(ccoords, CAP)
    cidx = jnp.arange(CHUNK, dtype=jnp.int32)
    resolved = ~cmask | cfound
    s = ch0 & (CAP - 1)
    free = fps[s] == 0
    want = (~resolved) & free
    claim = jnp.full((CAP,), _INT_MAX, jnp.int32)
    claim = claim.at[s].min(jnp.where(want, cidx, _INT_MAX), mode="drop")
    won = want & (claim[s] == cidx)
    fps = fps.at[jnp.where(won, s, CAP)].set(cfp, mode="drop")
    match = (~resolved) & (fps[s] == cfp)
    cslot = jnp.where(match, s, cslot)
    return fps, cslot, cpts, cmask, resolved | match


def full_scatters(m, pts, mask):
    fps, cslot, cpts, cmask, resolved = upto_claim(m, pts, mask)
    counts = m.meta[:, 1]
    accept = cmask & (cslot < CAP) & resolved
    ccoords = voxel_coords(cpts, VS)
    csub = voxel_coords(cpts, 0.5 * VS) - 2 * ccoords
    csub_id = jnp.where(cmask, csub[:, 0] + 2 * csub[:, 1] + 4 * csub[:, 2], 0)
    bit = jnp.where(accept, jnp.int32(1) << csub_id, 0)
    tgt = jnp.where(accept, cslot, CAP)
    batch_bits = jnp.zeros((CAP,), jnp.int32).at[tgt].add(bit, mode="drop")
    x = batch_bits[tgt] & ((jnp.int32(1) << csub_id) - 1)
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    rank = (((x + (x >> 4)) & 0x0F0F0F0F) * 0x01010101) >> 24
    base = counts.at[cslot].get(mode="fill", fill_value=0)
    write_pos = base + rank
    accept = accept & (write_pos < PPV)
    tgt = jnp.where(accept, cslot, CAP)
    points = m.points.at[tgt, jnp.where(accept, write_pos, 0)].set(
        hashmap.pack_points(cpts, ccoords, VS), mode="drop")
    counts = counts.at[tgt].add(accept.astype(jnp.int32), mode="drop")
    occ_col = m.meta[:, 5].at[tgt].add(bit, mode="drop")
    pts_i32 = jax.lax.bitcast_convert_type(cpts, jnp.int32)
    reps_i32 = m.meta[:, 2:5].at[
        jnp.where(accept & (write_pos == 0), cslot, CAP)].set(
        pts_i32, mode="drop")
    meta = jnp.concatenate(
        [fps[:, None], counts[:, None], reps_i32, occ_col[:, None],
         m.meta[:, 6:]], axis=1)
    return hashmap.VoxelHashMap(meta=meta, points=points)


def main():
    want = set(sys.argv[1:])
    rng = np.random.default_rng(0)
    m = hashmap.VoxelHashMap(meta=jnp.zeros((CAP, 8), jnp.int32),
                             points=jnp.zeros((CAP, PPV), jnp.int32))
    pts = jnp.asarray(rng.normal(size=(FRAME, 3)) * 20, jnp.float32)
    mask = jnp.asarray(rng.random(FRAME) < 0.5)

    cases = {
        "phaseA": phase_a,
        "upto_compact": upto_compact,
        "upto_claim": upto_claim,
        "full_scatters": full_scatters,
    }
    unknown = want - set(cases)
    if unknown:
        sys.exit(f"unknown: {sorted(unknown)}; valid: {sorted(cases)}")
    for name, fn in cases.items():
        if want and name not in want:
            continue
        clock(name, fn, m, pts, mask)


if __name__ == "__main__":
    main()
