"""Profile gather_candidates + insert_deduped internals at bench config.

In-jit fori_loop repetition (one dispatch, one sync) as in profile_stages.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import H, W, RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from ptudes_tpu.models import lio, sim  # noqa: E402
from ptudes_tpu.ops import hashmap, icp, voxel  # noqa: E402
from ptudes_tpu.ops.hashmap import _fingerprint_and_slot  # noqa: E402
from ptudes_tpu.ops.projection import scan_to_points  # noqa: E402
from ptudes_tpu.ops.voxel import voxel_coords  # noqa: E402

K = 50


def timeit_looped(make_body, init_carry, k=K, n=3):
    fn = jax.jit(lambda c: jax.lax.fori_loop(
        0, k, lambda i, c_: make_body(c_), c))

    def run():
        out = fn(init_carry)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jnp.sum(leaf.astype(jnp.float32)))

    run()
    t0 = time.monotonic()
    for _ in range(n):
        run()
    return (time.monotonic() - t0) / n / k * 1e3


def main():
    scans, scan_ts, gt_mid, imu_ts = make_data()
    cfg = bench_config()
    kcfg, cap = cfg.kiss, cfg.cap
    vs = kcfg.resolved_voxel_size
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    batches = lio.build_batches(cfg, scans, scan_ts, np.asarray(imu.lacc),
                                np.asarray(imu.avel), imu_ts)

    # warm map + final state from a full run
    state = lio.init_state(cfg)
    fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
    jax.block_until_ready(out.kiss_pose)
    m = fin.kiss.local_map
    pose = fin.kiss.pose
    print(f"map voxels {int(hashmap.num_voxels(m))}, "
          f"points {int(hashmap.num_points(m))}")

    # realistic source + frame from the last scan
    pts, mask, _ = scan_to_points(sensor.lut, batches.range_m[-1])
    mask = voxel.range_clip_mask(pts, mask, kcfg.min_range, kcfg.max_range)
    keep_f = voxel.first_in_voxel_mask(pts, mask, vs * 0.5, cap.dedup_table)
    frame_ds, frame_mask = voxel.compact(pts, keep_f, cap.max_frame)
    keep_s = voxel.first_in_voxel_mask(frame_ds, frame_mask, vs * 1.5,
                                       cap.dedup_table)
    source, source_mask = voxel.compact(frame_ds, keep_s, cap.max_source)
    print(f"frame {int(frame_mask.sum())}, source {int(source_mask.sum())}")
    from ptudes_tpu.geom import se3
    source_w = se3.transform(pose, source)
    frame_w = se3.transform(pose, frame_ds)

    nbhd, nvox = kcfg.nn_neighborhood, kcfg.nn_voxels
    capn = m.meta.shape[0]
    ppv = m.points.shape[1]
    mnum = source_w.shape[0]

    # --- full gather_candidates
    t = timeit_looped(lambda s_: s_ + icp.gather_candidates(
        m, s_, voxel_size=vs, max_probes=cap.max_probes, neighborhood=nbhd,
        n_voxels=nvox, fit_planes=True,
        plane_radius=kcfg.plane_fit_radius).pts[0, 0] * 1e-12, source_w)
    print(f"gather_candidates (all):   {t:7.3f} ms")

    t = timeit_looped(lambda s_: s_ + icp.gather_candidates(
        m, s_, voxel_size=vs, max_probes=cap.max_probes, neighborhood=nbhd,
        n_voxels=nvox, fit_planes=False,
        plane_radius=kcfg.plane_fit_radius).pts[0, 0] * 1e-12, source_w)
    print(f"gather (no plane fit):     {t:7.3f} ms")

    # --- meta probes only
    offsets = jnp.asarray(hashmap._NEIGHBOR_OFFSETS[:nbhd])

    def meta_probe(s_):
        qc = voxel_coords(s_, vs)
        keys = qc[:, None, :] + offsets[None, :, :]
        fp, h0 = _fingerprint_and_slot(keys, capn)
        acc = jnp.zeros((), jnp.float32)
        found = jnp.zeros((mnum, nbhd), bool)
        for r in range(cap.max_probes):
            sl = (h0 + r) & (capn - 1)
            rows = m.meta.at[sl].get(mode="fill", fill_value=0)
            match = (rows[..., 0] == fp) & ~found
            found = found | match
            acc = acc + jnp.sum(rows[..., 1].astype(jnp.float32))
        return s_ + acc * 1e-20
    t = timeit_looped(meta_probe, source_w)
    print(f"  meta probes only:        {t:7.3f} ms")

    # --- points gather only (random valid slots)
    occ_slots = jnp.where(m.meta[:, 1] > 0, jnp.arange(capn), 0)
    some = occ_slots[jnp.argsort(-m.meta[:, 1])][:mnum * nvox]
    slot_v = some[:mnum * nvox].reshape(mnum, nvox).astype(jnp.int32)

    def pts_gather(s_):
        vox_pts = m.points.at[slot_v].get(mode="fill", fill_value=0)
        return s_ + vox_pts[0, 0].astype(jnp.float32) * 1e-12
    t = timeit_looped(pts_gather, source_w)
    print(f"  points gather [M,V,P,3]: {t:7.3f} ms")

    # --- insert_deduped full
    def ins(m_):
        return hashmap.insert_deduped(
            m_, frame_w, frame_mask, voxel_size=vs,
            max_probes=cap.max_probes, new_capacity=cap.max_new_per_scan)
    t = timeit_looped(ins, m, k=10)
    print(f"insert_deduped (steady):   {t:7.3f} ms")

    # --- insert phase A only (2 meta gathers at max_frame + cumsum)
    def phase_a(s_):
        coords = voxel_coords(s_, vs)
        sub = voxel_coords(s_, 0.5 * vs) - 2 * coords
        sub_id = sub[:, 0] + 2 * sub[:, 1] + 4 * sub[:, 2]
        fp, h0 = _fingerprint_and_slot(coords, capn)
        slot = jnp.full((s_.shape[0],), capn, jnp.int32)
        occ = jnp.zeros((s_.shape[0],), jnp.int32)
        found = jnp.zeros((s_.shape[0],), bool)
        for r in range(cap.max_probes):
            sl = (h0 + r) & (capn - 1)
            rows = m.meta.at[sl].get(mode="fill", fill_value=0)
            match = (rows[:, 0] == fp) & ~found
            slot = jnp.where(match, sl, slot)
            occ = jnp.where(match, rows[:, 5], occ)
            found = found | match
        is_new = frame_mask & ~(found & ((occ >> sub_id) & 1).astype(bool))
        new_pos = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        return s_ + (new_pos[-1] + slot[0]).astype(jnp.float32) * 1e-12
    t = timeit_looped(phase_a, frame_w)
    print(f"  insert phase A:          {t:7.3f} ms")

    # --- remove_far
    def rf(m_):
        return hashmap.remove_far(m_, se3.trans(pose),
                                  jnp.asarray(kcfg.max_range**2, jnp.float32))
    t = timeit_looped(rf, m, k=10)
    print(f"remove_far:                {t:7.3f} ms")

    # --- EKF batch: new vs seq
    from ptudes_tpu.models import esekf
    ekf_state = fin.ekf
    imub = jax.tree.map(lambda x: x[-1], batches.imu)
    iv = batches.imu_valid[-1]

    t = timeit_looped(lambda st: esekf.process_imu_batch(
        st, imub, iv, cfg=cfg.ekf), ekf_state)
    print(f"EKF batch:                 {t:7.3f} ms")


if __name__ == "__main__":
    main()
