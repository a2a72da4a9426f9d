"""Device trace of the ENDURANCE operating point (bench_long scale,
eviction-churn regime) — the r5 sweep plateaued at ~288 scans/s
(3.5 ms/scan), slower per scan than the 4x-bigger bench scene, so
something churn-specific dominates. Find it.
"""
import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from bench import _device_watchdog  # noqa: E402
import bench_long  # noqa: E402
from dataclasses import replace  # noqa: E402
from ptudes_tpu.config import (Capacity, EkfConfig, KissConfig,  # noqa: E402
                               PipelineConfig)
from ptudes_tpu.models import lio, sim  # noqa: E402


def main():
    _device_watchdog()
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    scans, scan_ts, gt_mid, imu_ts = bench_long.make_data()
    n0, n1 = 250, 500   # trace the SECOND chunk: churn regime, warm map
    sensor = sim.make_sim_sensor(h=bench_long.H, w=bench_long.W,
                                 fov_deg=45.0)
    imu = sim.imu_for_circle(imu_ts, radius=bench_long.RADIUS,
                             speed=bench_long.SPEED, ramp=bench_long.RAMP)
    cfg = PipelineConfig(
        kiss=KissConfig(max_range=bench_long.MAX_RANGE, min_range=1.0,
                        max_points_per_voxel=8, max_iterations=12,
                        deskew=True, loss="plane", voxel_size=0.3,
                        plane_fit_radius=0.6, nn_mode="cached",
                        nn_voxels=4, nn_neighborhood=7,
                        nn_refresh_drift=0.0),
        cap=Capacity(max_points=bench_long.H * bench_long.W,
                     max_frame=16384, max_source=2048,
                     map_capacity=1 << 19, dedup_table=1 << 17,
                     max_new_per_scan=1024, max_probes=1),
        ekf=EkfConfig(predict_batch="pallas"),
        max_imu_per_scan=16, guess="ekf",
        bootstrap_scans=3, steady_insert_mode=False, scan_unroll=2)

    state = lio.init_state(cfg)
    b0 = lio.build_batches(cfg, scans[:n0], scan_ts[:n0],
                           np.asarray(imu.lacc), np.asarray(imu.avel),
                           imu_ts)
    state, out = lio.run_sequence(state, b0, sensor.lut, cfg=cfg)
    jax.block_until_ready(out.kiss_pose)
    b1 = lio.build_batches(cfg, scans[n0:n1], scan_ts[n0:n1],
                           np.asarray(imu.lacc), np.asarray(imu.avel),
                           imu_ts, prev_scan_ts=scan_ts[n0 - 1])
    s2, out = lio.run_sequence(state, b1, sensor.lut, cfg=cfg)
    jax.block_until_ready(out.kiss_pose)

    trace_dir = "/tmp/ptudes_trace_endur"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        s2, out = lio.run_sequence(state, b1, sensor.lut, cfg=cfg)
        jax.block_until_ready(out.kiss_pose)

    files = glob.glob(
        f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    ev_by_name = defaultdict(float)
    meta = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M":
                if ev.get("name") == "process_name":
                    meta[ev.get("pid")] = ev["args"].get("name", "")
                continue
            if ev.get("ph") != "X":
                continue
            if "TPU" not in meta.get(ev.get("pid"), ""):
                continue
            ev_by_name[ev["name"]] += ev.get("dur", 0.0)
    n_scans = n1 - n0
    total = sum(ev_by_name.values())
    print(f"total device op time: {total / 1e3:.1f} ms over {n_scans} "
          f"scans ({total / n_scans:.0f} us/scan)")
    for name, dur in sorted(ev_by_name.items(), key=lambda kv: -kv[1])[
            :args.top]:
        print(f"{dur / n_scans:9.1f} us/scan  {name}")


if __name__ == "__main__":
    main()
