"""Truthful per-stage costs by ABLATION on the full 50-scan bench run.

The axon tunnel charges ~30 ms per host sync, which poisons micro-
benchmarks of single ops; the only trustworthy numbers on this path come
from timing the WHOLE fused lax.scan (one dispatch, one sync) with a stage
disabled or stubbed, and differencing against the baseline.

Usage: python tools/profile_ablate.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import H, W, RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from ptudes_tpu.geom import se3  # noqa: E402
from ptudes_tpu.models import esekf, kiss, lio, sim  # noqa: E402
from ptudes_tpu.ops import deskew as deskew_ops  # noqa: E402
from ptudes_tpu.ops import hashmap, icp, voxel  # noqa: E402
from ptudes_tpu.ops.projection import scan_to_points  # noqa: E402


def make_step(lut, cfg, ablate: set):
    """scan_step with named stages stubbed out (results replaced by cheap
    placeholders with the same shapes/dtypes)."""
    kcfg, cap = cfg.kiss, cfg.cap
    vs = kcfg.resolved_voxel_size

    def step(state: lio.LioState, batch: lio.ScanBatch):
        ekf0_pose = esekf.pose_mat(state.ekf)
        if "ekf" in ablate:
            ekf1 = state.ekf
        else:
            ekf1 = esekf.process_imu_batch(
                state.ekf, batch.imu, batch.imu_valid, cfg=cfg.ekf)

        pts, mask, ts01 = scan_to_points(lut, batch.range_m)
        guess = esekf.pose_mat(ekf1)

        if "deskew" not in ablate and kcfg.deskew:
            twist = se3.log_pose(se3.inv(ekf0_pose) @ esekf.pose_mat(ekf1))
            pts = deskew_ops.deskew_by_twist(pts, ts01 - 0.5, twist)
        mask = voxel.range_clip_mask(pts, mask, kcfg.min_range,
                                     kcfg.max_range)

        if "voxelize" in ablate:
            frame_ds, frame_mask = pts[:cap.max_frame], mask[:cap.max_frame]
            source, source_mask = pts[:cap.max_source], mask[:cap.max_source]
        else:
            keep_f = voxel.first_in_voxel_mask(pts, mask, vs * 0.5,
                                               cap.dedup_table)
            frame_ds, frame_mask = voxel.compact(pts, keep_f, cap.max_frame)
            keep_s = voxel.first_in_voxel_mask(frame_ds, frame_mask, vs * 1.5,
                                               cap.dedup_table)
            source, source_mask = voxel.compact(frame_ds, keep_s,
                                                cap.max_source)

        sigma = kiss.get_adaptive_threshold(state.kiss, kcfg)
        if "icp" in ablate:
            new_pose = guess.astype(jnp.float32) + 1e-12 * jnp.sum(source)
            n_corr = jnp.asarray(0, jnp.int32)
            iters = jnp.asarray(0, jnp.int32)
        else:
            res = icp.register_frame_cached(
                source, source_mask, state.kiss.local_map, guess,
                3.0 * sigma, sigma / 3.0, voxel_size=vs,
                max_probes=cap.max_probes,
                max_iterations=(1 if "icp1" in ablate
                                else kcfg.max_iterations),
                convergence=kcfg.convergence_criterion, loss=kcfg.loss,
                plane_min_quality=kcfg.plane_min_quality,
                prior_rot_weight=kcfg.prior_rot_weight,
                prior_trans_weight=kcfg.prior_trans_weight,
                neighborhood=kcfg.nn_neighborhood, n_voxels=kcfg.nn_voxels,
                plane_radius=kcfg.plane_fit_radius)
            new_pose, n_corr, iters = res.pose, res.num_corr, res.iterations

        dev = se3.inv(guess) @ new_pose
        err = kiss._model_error(dev, kcfg.max_range)
        accum = err > kcfg.min_motion_th

        if "insert" in ablate:
            local_map = state.kiss.local_map
        else:
            frame_w = se3.transform(new_pose, frame_ds)
            local_map = hashmap.insert_deduped(
                state.kiss.local_map, frame_w, frame_mask, voxel_size=vs,
                max_probes=cap.max_probes,
                new_capacity=cap.max_new_per_scan)
            if "evict" not in ablate:
                local_map = hashmap.remove_far(
                    local_map, se3.trans(new_pose),
                    jnp.asarray(kcfg.max_range**2, jnp.float32))

        kiss1 = kiss.KissState(
            local_map=local_map, pose=new_pose, pose_prev=state.kiss.pose,
            model_sse=state.kiss.model_sse + jnp.where(accum, err * err, 0.0),
            num_samples=state.kiss.num_samples + accum.astype(jnp.int32),
            num_scans=state.kiss.num_scans + 1)
        ekf2 = (ekf1 if "ekf" in ablate
                else esekf.process_pose(ekf1, new_pose, cfg=cfg.ekf))
        out = (new_pose, esekf.pose_mat(ekf2))
        return lio.LioState(kiss=kiss1, ekf=ekf2), out

    return step


def time_variant(name, ablate, lut, cfg, batches, n=3):
    step = make_step(lut, cfg, ablate)

    @jax.jit
    def run(state, b):
        return jax.lax.scan(step, state, b)

    state = lio.init_state(cfg)
    fin, out = run(state, batches)
    jax.block_until_ready(out[0])
    best = np.inf
    for _ in range(n):
        t0 = time.monotonic()
        fin, out = run(state, batches)
        jax.block_until_ready(out[0])
        best = min(best, time.monotonic() - t0)
    return best / batches.range_m.shape[0] * 1e3


def main():
    scans, scan_ts, gt_mid, imu_ts = make_data()
    cfg = bench_config()
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    batches = lio.build_batches(cfg, scans, scan_ts, np.asarray(imu.lacc),
                                np.asarray(imu.avel), imu_ts)

    base = time_variant("baseline", set(), sensor.lut, cfg, batches)
    print(f"baseline:        {base:7.3f} ms/scan ({1e3/base:.1f} scans/s)")
    for name, abl in [
        ("- ekf", {"ekf"}),
        ("- deskew", {"deskew"}),
        ("- voxelize", {"voxelize"}),
        ("- icp", {"icp"}),
        ("- icp iters (1)", {"icp1"}),
        ("- insert+evict", {"insert"}),
        ("- evict only", {"evict"}),
    ]:
        t = time_variant(name, abl, sensor.lut, cfg, batches)
        print(f"{name:16s} {t:7.3f} ms/scan  -> stage cost {base - t:6.3f} ms")


if __name__ == "__main__":
    main()
