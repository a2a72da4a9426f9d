"""Ablate the stages INSIDE hashmap.insert on the full bench run."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import H, W, RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from ptudes_tpu.models import lio, sim  # noqa: E402
from ptudes_tpu.ops import hashmap  # noqa: E402
from ptudes_tpu.ops.hashmap import (_INT_MAX, VoxelHashMap,  # noqa: E402
                                    _fingerprint_and_slot)
from ptudes_tpu.ops.voxel import voxel_coords  # noqa: E402


def insert_ablated(m, pts, mask, *, voxel_size, max_probes, ablate=frozenset()):
    cap = m.meta.shape[0]
    ppv = m.points.shape[1]
    n = pts.shape[0]
    coords = voxel_coords(pts, voxel_size)
    fp, h0 = _fingerprint_and_slot(coords, cap)
    idx = jnp.arange(n, dtype=jnp.int32)
    fps = m.meta[:, 0]
    slot = jnp.full((n,), cap, jnp.int32)
    resolved = ~mask

    if "lookup" not in ablate:
        for r in range(max_probes):
            s = (h0 + r) & (cap - 1)
            match = (~resolved) & (fps[s] == fp)
            slot = jnp.where(match, s, slot)
            resolved = resolved | match

    if "claim" not in ablate:
        for r in range(max_probes):
            s = (h0 + r) & (cap - 1)
            free = fps[s] == 0
            want = (~resolved) & free
            claim = jnp.full((cap,), _INT_MAX, jnp.int32)
            claim = claim.at[s].min(jnp.where(want, idx, _INT_MAX),
                                    mode="drop")
            won = want & (claim[s] == idx)
            fps = fps.at[jnp.where(won, s, cap)].set(fp, mode="drop")
            match = (~resolved) & (fps[s] == fp)
            slot = jnp.where(match, s, slot)
            resolved = resolved | match

    if "rank" in ablate:
        rank = jnp.zeros((n,), jnp.int32)
    else:
        order = jnp.argsort(slot, stable=True)
        slot_sorted = slot[order]
        pos = jnp.arange(n, dtype=jnp.int32)
        run_start = jnp.where(
            jnp.concatenate([jnp.array([True]),
                             slot_sorted[1:] != slot_sorted[:-1]]), pos, 0)
        run_start = jax.lax.associative_scan(jnp.maximum, run_start)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(pos - run_start)

    counts = m.meta[:, 1]
    base = counts.at[slot].get(mode="fill", fill_value=0)
    write_pos = base + rank
    accept = resolved & (write_pos < ppv)
    tgt_slot = jnp.where(accept, slot, cap)

    if "pwrite" in ablate:
        points = m.points
    else:
        points = m.points.at[tgt_slot, jnp.where(accept, write_pos, 0)].set(
            hashmap.pack_points(pts, coords, voxel_size), mode="drop")
    counts = counts.at[tgt_slot].add(accept.astype(jnp.int32), mode="drop")
    rep_tgt = jnp.where(accept & (write_pos == 0), slot, cap)
    pts_i32 = jax.lax.bitcast_convert_type(pts, jnp.int32)
    reps_i32 = m.meta[:, 2:5].at[rep_tgt].set(pts_i32, mode="drop")
    meta = jnp.concatenate(
        [fps[:, None], counts[:, None], reps_i32, m.meta[:, 5:]], axis=1)
    return VoxelHashMap(meta=meta, points=points)


def main():
    scans, scan_ts, gt_mid, imu_ts = make_data()
    cfg = bench_config()
    cap = cfg.cap
    vs = cfg.kiss.resolved_voxel_size
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    batches = lio.build_batches(cfg, scans, scan_ts, np.asarray(imu.lacc),
                                np.asarray(imu.avel), imu_ts)

    # run the real pipeline once to get realistic frames to insert
    state = lio.init_state(cfg)
    fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
    jax.block_until_ready(out.kiss_pose)

    # realistic frame: 50 slightly different frames inserted in sequence
    from ptudes_tpu.ops import voxel as vox
    from ptudes_tpu.ops.projection import scan_to_points
    frames = []
    for i in range(0, 50, 5):
        pts, mask, _ = scan_to_points(sensor.lut, batches.range_m[i])
        keep = vox.first_in_voxel_mask(pts, mask, vs * 0.5, cap.dedup_table)
        f, fm = vox.compact(pts, keep, cap.max_frame)
        frames.append((f, fm))
    fstack = jnp.stack([f for f, _ in frames])
    mstack = jnp.stack([m_ for _, m_ in frames])
    print("frame counts:", [int(m_.sum()) for _, m_ in frames])

    def bench_variant(name, ablate):
        def body(m, fm):
            f, msk = fm
            return insert_ablated(m, f, msk, voxel_size=vs,
                                  max_probes=cap.max_probes,
                                  ablate=ablate), 0

        @jax.jit
        def run(m):
            # 5 passes over the 10 frames = 50 inserts, one dispatch
            def onepass(m, _):
                m, _ = jax.lax.scan(body, m, (fstack, mstack))
                return m, 0
            m, _ = jax.lax.scan(onepass, m, jnp.arange(5))
            return m

        m0 = hashmap.create(cap.map_capacity, cfg.kiss.max_points_per_voxel)
        m1 = run(m0)
        jax.block_until_ready(m1.meta)
        best = np.inf
        for _ in range(3):
            t0 = time.monotonic()
            m1 = run(m0)
            jax.block_until_ready(m1.meta)
            best = min(best, time.monotonic() - t0)
        print(f"{name:24s} {best / 50 * 1e3:7.3f} ms/insert")
        return best / 50 * 1e3

    base = bench_variant("insert baseline", frozenset())
    for name in ["lookup", "claim", "rank", "pwrite"]:
        bench_variant(f"- {name}", frozenset([name]))


if __name__ == "__main__":
    main()
