"""Benchmark: fused LIO (ICP + EKF) scan throughput on one TPU chip.

BASELINE config 1 equivalent: OS-0-128-scale scans (128 x 1024), 50 scans,
default KISS-style odometry + ES-EKF fusion — the reference's
``ptudes ekf-bench ouster --use-imu-prediction`` hot loop
(``src/ptudes/cli/ekf_bench.py:493-563``). Real sensor recordings are not
available in this environment, so scans come from the analytic raycast
simulator at the same scale (exact ranges + 1 cm noise, rotosweep motion);
the quality gate is ATE against the simulator's ground truth.

``vs_baseline``: ratio against the f64 numpy/scipy KD-tree oracle of the
same algorithm (tools/oracle_kiss.py) measured on this host's CPU — the
stand-in for kiss-icp's C++ CPU implementation, which is not installed
here. A JSON line with the full context is printed at the end.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_SCANS = 50
H, W = 128, 1024
CACHE = f"/tmp/ptudes_bench_{N_SCANS}_{H}x{W}_v3.npz"


def make_data():
    from ptudes_tpu.models import sim

    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return z["scans"], z["ts"], z["poses"], z["imu_ts"]

    ts, poses = sim.circle_trajectory(N_SCANS + 1, radius=8.0, speed=2.0,
                                      scan_dt=0.1)
    world = sim.make_sim_world(seed=0, extent=30.0, n_boxes=40,
                               keepout_points=poses[:, :3, 3])
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    scans = np.stack([
        sim.render_range_image(
            world, poses[i], sensor, max_range=70.0, noise_std=0.01,
            seed=i, end_pose=poses[i + 1])
        for i in range(N_SCANS)
    ])
    imu_ts = np.arange(1, N_SCANS * 10 + 1) * 0.01
    np.savez_compressed(CACHE, scans=scans, ts=ts[:N_SCANS],
                        poses=poses[:N_SCANS], imu_ts=imu_ts)
    return scans, ts[:N_SCANS], poses[:N_SCANS], imu_ts


def bench_tpu(scans, ts, poses, imu_ts):
    import jax
    import jax.numpy as jnp
    from ptudes_tpu.config import (Capacity, EkfConfig, KissConfig,
                                   PipelineConfig)
    from ptudes_tpu.models import lio, sim

    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=8.0, speed=2.0)
    cfg = PipelineConfig(
        kiss=KissConfig(max_range=70.0, min_range=1.0,
                        max_points_per_voxel=20, max_iterations=30,
                        deskew=True, loss="plane"),
        cap=Capacity(max_points=H * W, max_frame=32768, max_source=8192,
                     map_capacity=1 << 19, dedup_table=1 << 20),
        ekf=EkfConfig(),
        max_imu_per_scan=16,
        guess="ekf",
    )
    batches = lio.build_batches(
        cfg, scans, ts + 1e-9, np.asarray(imu.lacc), np.asarray(imu.avel),
        imu_ts)
    state = lio.init_state(cfg)

    t0 = time.monotonic()
    fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
    jax.block_until_ready(out.kiss_pose)
    compile_and_run = time.monotonic() - t0

    # steady-state timing (cached executable)
    t0 = time.monotonic()
    fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
    jax.block_until_ready(out.kiss_pose)
    dt = time.monotonic() - t0

    # quality gate: ATE RMSE vs sim ground truth
    rel = np.einsum("ij,njk->nik", np.linalg.inv(poses[0]), poses)
    kp = np.asarray(out.kiss_pose)
    terr = np.linalg.norm(kp[:, :3, 3] - rel[:, :3, 3], axis=1)
    ate_rmse = float(np.sqrt(np.mean(terr**2)))

    return {
        "scans_per_sec": N_SCANS / dt,
        "sec_per_scan": dt / N_SCANS,
        "compile_s": compile_and_run - dt,
        "ate_rmse_m": ate_rmse,
        "device": str(jax.devices()[0]),
    }


def bench_cpu_oracle(scans, ts, poses, n=8):
    """f64 numpy KD-tree oracle of the same algorithm on host CPU."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from oracle_kiss import OracleKiss
    from ptudes_tpu.models import sim
    from ptudes_tpu.ops import projection
    import jax.numpy as jnp

    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    ok = OracleKiss(voxel_size=0.7, max_range=70.0, min_range=1.0,
                    max_iters=30)
    pts_list = []
    for i in range(n):
        pts, mask, _ = projection.scan_to_points(
            sensor.lut, jnp.asarray(scans[i]))
        pts_list.append(np.asarray(pts, np.float64)[np.asarray(mask)])
    t0 = time.monotonic()
    for p in pts_list:
        ok.register(p)
    dt = time.monotonic() - t0
    return n / dt


def main():
    scans, ts, poses, imu_ts = make_data()
    tpu = bench_tpu(scans, ts, poses, imu_ts)
    cpu_scans_per_sec = bench_cpu_oracle(scans, ts, poses)
    result = {
        "metric": "lio_scans_per_sec_per_chip",
        "value": round(tpu["scans_per_sec"], 3),
        "unit": "scans/s (128x1024, ICP+EKF fused step)",
        "vs_baseline": round(tpu["scans_per_sec"] / cpu_scans_per_sec, 3),
        "baseline": {
            "what": "f64 numpy/scipy KD-tree oracle of the same algorithm "
                    "on host CPU (kiss-icp C++ not available)",
            "cpu_scans_per_sec": round(cpu_scans_per_sec, 3),
        },
        "quality": {"ate_rmse_m": round(tpu["ate_rmse_m"], 4)},
        "compile_s": round(tpu["compile_s"], 1),
        "device": tpu["device"],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
