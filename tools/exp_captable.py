"""Capacity-vs-throughput matrix on the bench scene (VERDICT r4 #9):
map_capacity x max_source -> scans/s + ATE, so sizing a real recording
run (BASELINE config 4 scale) doesn't need re-measurement.

    python tools/exp_captable.py          # prints a markdown table
"""
import os
import sys
import time
from dataclasses import replace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import H, W, RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from bench import _device_watchdog  # noqa: E402


def main():
    _device_watchdog()
    import jax
    from ptudes_tpu.models import lio, sim
    from ptudes_tpu.utils.metrics import calc_ate_rmse

    scans, scan_ts, gt_mid, imu_ts = make_data()
    n = len(scans)
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    base = bench_config()

    map_caps = [1 << 17, 1 << 18, 1 << 19, 1 << 20]
    sources = [1024, 2048, 4096, 8192]
    rows = []
    for mc in map_caps:
        row = []
        for ms in sources:
            cfg = replace(base, cap=replace(base.cap, map_capacity=mc,
                                            max_source=ms))
            batches = lio.build_batches(
                cfg, scans, scan_ts, np.asarray(imu.lacc),
                np.asarray(imu.avel), imu_ts)
            state = lio.init_state(cfg)
            try:
                fin, out = lio.run_sequence(state, batches, sensor.lut,
                                            cfg=cfg)
                jax.block_until_ready(out.kiss_pose)
                best = np.inf
                for _ in range(3):
                    jax.block_until_ready(fin.kiss.local_map.meta)
                    t0 = time.monotonic()
                    fin, out = lio.run_sequence(state, batches,
                                                sensor.lut, cfg=cfg)
                    jax.block_until_ready((out.kiss_pose,
                                           fin.kiss.local_map.meta))
                    best = min(best, time.monotonic() - t0)
                _, ate = calc_ate_rmse(
                    np.asarray(out.kiss_pose, np.float64), gt_mid)
                cell = f"{n / best:.0f} / {float(ate):.4f}"
            except Exception as e:  # noqa: BLE001
                cell = f"FAIL {type(e).__name__}"
            row.append(cell)
            print(f"map 2^{mc.bit_length() - 1} src {ms}: {cell}",
                  flush=True)
        rows.append(row)

    print("\n| map_capacity \\ max_source | "
          + " | ".join(str(s) for s in sources) + " |")
    print("|---" * (len(sources) + 1) + "|")
    for mc, row in zip(map_caps, rows):
        print(f"| 2^{mc.bit_length() - 1} | " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
