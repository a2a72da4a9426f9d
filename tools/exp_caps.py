"""Experiment: capacity/layout knobs vs bench throughput.

The octant-dedup insert stores at most 8 points per voxel, so ppv=16
wastes half of every candidate gather and insert scatter. Also probes
max_frame / map_capacity / max_source sizing against actual occupancy.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from bench import H, W, RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from bench import _device_watchdog  # noqa: E402
from ptudes_tpu.config import Capacity, KissConfig  # noqa: E402
from ptudes_tpu.models import lio, sim  # noqa: E402
from ptudes_tpu.utils.metrics import calc_ate_rmse  # noqa: E402


def run_variant(name, cfg, scans, scan_ts, gt_mid, imu_ts, sensor, imu):
    batches = lio.build_batches(cfg, scans, scan_ts, np.asarray(imu.lacc),
                                np.asarray(imu.avel), imu_ts)
    state = lio.init_state(cfg)
    t0 = time.monotonic()
    fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
    jax.block_until_ready(out.kiss_pose)
    compile_s = time.monotonic() - t0
    best = np.inf
    for _ in range(3):
        # block on the map carry too: blocking only on a small output
        # has produced bogus sub-ms timings through the axon tunnel
        # (async dispatch resolving the small future early)
        jax.block_until_ready(fin.kiss.local_map.meta)
        t0 = time.monotonic()
        fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
        jax.block_until_ready((out.kiss_pose, fin.kiss.local_map.meta))
        best = min(best, time.monotonic() - t0)
    if best < 0.01:
        print(f"{name:28s} TIMING SUSPECT ({best * 1e3:.2f} ms for "
              f"{scans.shape[0]} scans) — rerun")
        return
    kp = np.asarray(out.kiss_pose, np.float64)
    _, ate = calc_ate_rmse(kp, gt_mid)
    n = scans.shape[0]
    print(f"{name:28s} {n / best:7.1f} scans/s  ate {float(ate):.4f} m  "
          f"src_max {int(np.asarray(out.aux.source_count).max())}  "
          f"mappts {int(np.asarray(out.aux.map_points)[-1])}  "
          f"compile {compile_s - best:.0f}s")


def main():
    _device_watchdog()
    scans, scan_ts, gt_mid, imu_ts = make_data()
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)

    from dataclasses import replace
    base = bench_config()
    variants = [
        ("bench", base),
        ("vox0.25", replace(base,
            kiss=replace(base.kiss, voxel_size=0.25))),
        ("vox0.35", replace(base,
            kiss=replace(base.kiss, voxel_size=0.35))),
        ("prior.005", replace(base,
            kiss=replace(base.kiss, prior_rot_weight=0.005,
                         prior_trans_weight=0.005))),
        ("prior.02", replace(base,
            kiss=replace(base.kiss, prior_rot_weight=0.02,
                         prior_trans_weight=0.02))),
        ("nnvox6", replace(base,
            kiss=replace(base.kiss, nn_voxels=6))),
        ("planeq0.1", replace(base,
            kiss=replace(base.kiss, plane_min_quality=0.1))),
        ("iters30", replace(base,
            kiss=replace(base.kiss, max_iterations=30))),
    ]
    for name, cfg in variants:
        run_variant(name, cfg, scans, scan_ts, gt_mid, imu_ts, sensor, imu)


if __name__ == "__main__":
    main()
