"""Compile-time bisection of the fused LIO scan_step at bench shapes.

The driver's end-of-round bench always runs with a COLD persistent cache
(the environment resets between rounds), so cold-compile seconds are a
first-class cost (BENCH_r02 recorded compile_s=69.9). This tool lowers and
compiles each stage of the bench-config scan_step separately on the live
backend and prints per-stage compile seconds, answering "which stage is
the XLA/Mosaic compile hog?".

Usage: PTUDES_COMPILE_CACHE=off python tools/profile_compile.py [stage ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import H, W, RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from ptudes_tpu.models import esekf, kiss, lio, sim  # noqa: E402
from ptudes_tpu.ops import deskew as deskew_ops  # noqa: E402
from ptudes_tpu.ops import hashmap, icp, voxel  # noqa: E402
from ptudes_tpu.ops.projection import scan_to_points  # noqa: E402


def clock(name, fn, *args, **kwargs):
    jfn = jax.jit(fn, **kwargs)
    t0 = time.monotonic()
    low = jfn.lower(*args)
    t_low = time.monotonic() - t0
    t0 = time.monotonic()
    low.compile()
    t_comp = time.monotonic() - t0
    print(f"{name:28s} lower {t_low:6.1f}s  compile {t_comp:6.1f}s",
          flush=True)


def main():
    want = set(sys.argv[1:])
    scans, scan_ts, gt_mid, imu_ts = make_data()
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    cfg = bench_config()
    kcfg, cap = cfg.kiss, cfg.cap
    vs = kcfg.resolved_voxel_size
    batches = lio.build_batches(
        cfg, scans, scan_ts, np.asarray(imu.lacc), np.asarray(imu.avel),
        imu_ts)
    state = lio.init_state(cfg)

    scan = jnp.asarray(scans[0])
    pts, mask, ts01 = jax.jit(
        lambda s: scan_to_points(sensor.lut, s))(scan)
    guess = jnp.eye(4, dtype=jnp.float32)
    grid_hw = (H, W)

    def voxelize(pts, mask):
        pre = voxel.window_prededup_mask(pts, mask, vs * 0.5, grid_hw)
        pre_pts, pre_mask = voxel.compact(pts, pre, cap.max_frame)
        frame_ds, frame_mask = voxel.first_in_voxel_sorted(
            pre_pts, pre_mask, vs * 0.5, cap.max_frame)
        src_pts, src_keep = voxel.first_in_voxel_sorted(
            frame_ds, frame_mask, vs * 1.5, cap.max_frame)
        source, source_mask = voxel.compact(
            src_pts, src_keep, cap.max_source, decimate_overflow=True)
        return frame_ds, frame_mask, source, source_mask

    frame_ds, frame_mask, source, source_mask = jax.jit(voxelize)(pts, mask)

    stages = {}
    stages["projection"] = lambda: clock(
        "projection", lambda s: scan_to_points(
            sensor.lut, s, decimate=cfg.col_decimation), scan)
    stages["deskew"] = lambda: clock(
        "deskew_by_twist", lambda p: deskew_ops.deskew_by_twist(
            p, ts01 - 0.5, jnp.zeros(6)), pts)
    stages["voxelize"] = lambda: clock("voxelize(x2)+compact", voxelize,
                                       pts, mask)

    def reg(src, smask, g):
        return icp.register_frame_cached(
            src, smask, state.kiss.local_map, g, jnp.asarray(1.5),
            jnp.asarray(0.1667), voxel_size=vs, max_probes=cap.max_probes,
            max_iterations=kcfg.max_iterations,
            convergence=kcfg.convergence_criterion, loss=kcfg.loss,
            plane_min_quality=kcfg.plane_min_quality,
            prior_rot_weight=kcfg.prior_rot_weight,
            prior_trans_weight=kcfg.prior_trans_weight,
            neighborhood=kcfg.nn_neighborhood, n_voxels=kcfg.nn_voxels,
            plane_radius=kcfg.plane_fit_radius,
            refresh_drift=kcfg.nn_refresh_drift, gn_backend=kcfg.gn_backend)

    stages["icp"] = lambda: clock("icp cached (bench cfg)", reg,
                                  source, source_mask, guess)
    stages["icp_jnp"] = lambda: clock(
        "icp cached gn=jnp",
        lambda src, smask, g: icp.register_frame_cached(
            src, smask, state.kiss.local_map, g, jnp.asarray(1.5),
            jnp.asarray(0.1667), voxel_size=vs, max_probes=cap.max_probes,
            max_iterations=kcfg.max_iterations,
            convergence=kcfg.convergence_criterion, loss=kcfg.loss,
            plane_min_quality=kcfg.plane_min_quality,
            prior_rot_weight=kcfg.prior_rot_weight,
            prior_trans_weight=kcfg.prior_trans_weight,
            neighborhood=kcfg.nn_neighborhood, n_voxels=kcfg.nn_voxels,
            plane_radius=kcfg.plane_fit_radius,
            refresh_drift=kcfg.nn_refresh_drift, gn_backend="jnp"),
        source, source_mask, guess)

    def ins_cond(m, fw, fm):
        m2 = hashmap.insert_deduped(
            m, fw, fm, voxel_size=vs, max_probes=cap.max_probes,
            new_capacity=cap.max_new_per_scan, overflow="cond")
        return hashmap.remove_far(m2, jnp.zeros(3), jnp.asarray(70.0**2))

    def ins_boot(m, fw, fm):
        m2 = hashmap.insert_deduped(
            m, fw, fm, voxel_size=vs, max_probes=cap.max_probes,
            new_capacity=cap.max_frame, overflow=True)
        return hashmap.remove_far(m2, jnp.zeros(3), jnp.asarray(70.0**2))

    stages["insert_cond"] = lambda: clock(
        "insert cond + evict", ins_cond, state.kiss.local_map, frame_ds,
        frame_mask)
    stages["insert_boot"] = lambda: clock(
        "insert boot + evict", ins_boot, state.kiss.local_map, frame_ds,
        frame_mask)

    b0 = jax.tree.map(lambda x: x[0], batches)
    stages["ekf"] = lambda: clock(
        "ekf predict(16)+update",
        lambda st, im, iv, g: esekf.process_pose(
            esekf.process_imu_batch(st, im, iv, cfg=cfg.ekf), g,
            cfg=cfg.ekf),
        state.ekf, b0.imu, b0.imu_valid, guess)

    def step_prog(insert_overflow):
        step = lio.make_scan_step(sensor.lut, cfg,
                                  insert_overflow=insert_overflow)
        return lambda st, b: jax.lax.scan(step, st, b)

    head = jax.tree.map(lambda x: x[:1], batches)
    rest = jax.tree.map(lambda x: x[1:], batches)
    stages["step_boot"] = lambda: clock(
        "scan(step boot) x1", step_prog(True), state, head)
    stages["step_steady"] = lambda: clock(
        "scan(step steady) x49", step_prog(cfg.steady_insert_mode),
        state, rest)

    known = set(stages)
    unknown = want - known
    if unknown:
        sys.exit(f"unknown stage(s): {sorted(unknown)}; valid: "
                 f"{sorted(known)}")
    for name, fn in stages.items():
        if want and name not in want:
            continue
        fn()


if __name__ == "__main__":
    main()
