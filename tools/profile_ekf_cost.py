"""Isolate the EKF predict block's cost in the REAL fused pipeline.

With ``guess='kiss'`` and ``deskew_mode='kiss'`` the EKF subgraph's
outputs feed nothing downstream except the per-scan outputs, so varying
``max_imu_per_scan`` (the K of the inner predict scan) changes ONLY the
EKF work — no guess-quality confound (the confound that sinks the
ablation tool's '- ekf' row). Cost of one predict step ~= slope between
K=1 and K=16 divided by 15.

Usage: python tools/profile_ekf_cost.py
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from bench import H, W, RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from ptudes_tpu.models import lio, sim  # noqa: E402


def run(cfg, scans, scan_ts, imu, imu_ts, lut):
    batches = lio.build_batches(cfg, scans, scan_ts, np.asarray(imu.lacc),
                                np.asarray(imu.avel), imu_ts)
    state = lio.init_state(cfg)
    fin, out = lio.run_sequence(state, batches, lut, cfg=cfg)
    jax.block_until_ready(out.kiss_pose)
    best = np.inf
    for _ in range(3):
        t0 = time.monotonic()
        fin, out = lio.run_sequence(state, batches, lut, cfg=cfg)
        jax.block_until_ready(out.kiss_pose)
        best = min(best, time.monotonic() - t0)
    return best / len(scan_ts) * 1e3


def main():
    scans, scan_ts, gt_mid, imu_ts = make_data()
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    base = dataclasses.replace(bench_config(), guess="kiss",
                               deskew_mode="kiss")
    t1 = run(dataclasses.replace(base, max_imu_per_scan=1),
             scans, scan_ts, imu, imu_ts, sensor.lut)
    print(f"K=1 : {t1:7.3f} ms/scan", flush=True)
    t16 = run(dataclasses.replace(base, max_imu_per_scan=16),
              scans, scan_ts, imu, imu_ts, sensor.lut)
    print(f"K=16: {t16:7.3f} ms/scan", flush=True)
    print(f"EKF predict block (15 steps): {(t16 - t1) * 1e3:6.1f} us/scan "
          f"({(t16 - t1) / 15 * 1e3:5.1f} us/step)")


if __name__ == "__main__":
    main()
