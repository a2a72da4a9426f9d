"""Interleaved A/B: EKF pose-update form "xla" vs "pallas"
(ops/pallas_ekf.update_pose_pallas) at the bench operating point.

    python tools/exp_r5_update.py [reps=4]
"""
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from bench import _device_watchdog  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    _device_watchdog()
    import jax
    from ptudes_tpu.models import lio, sim
    from ptudes_tpu.utils.metrics import calc_ate_rmse

    scans, scan_ts, gt_mid, imu_ts = make_data()
    n = len(scans)
    sensor = sim.make_sim_sensor(h=scans.shape[1], w=scans.shape[2],
                                 fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)

    variants = {}
    for name in ("xla", "pallas"):
        cfg = bench_config()
        cfg = dataclasses.replace(
            cfg, ekf=dataclasses.replace(cfg.ekf, update_form=name))
        batches = lio.build_batches(
            cfg, scans, scan_ts, np.asarray(imu.lacc),
            np.asarray(imu.avel), imu_ts)
        state = lio.init_state(cfg)
        t0 = time.monotonic()
        _, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
        jax.block_until_ready(out.kiss_pose)
        compile_s = time.monotonic() - t0
        _, ate = calc_ate_rmse(np.asarray(out.kiss_pose, np.float64),
                               gt_mid)
        variants[name] = dict(cfg=cfg, batches=batches, state=state,
                              ate=float(ate), compile_s=compile_s,
                              times=[])
        print(f"update={name}: compile+run {compile_s:.1f} s, "
              f"ATE {ate:.4f}", flush=True)

    for rep in range(reps):
        for name, v in variants.items():
            t0 = time.monotonic()
            _, out = lio.run_sequence(v["state"], v["batches"], sensor.lut,
                                      cfg=v["cfg"])
            jax.block_until_ready(out.kiss_pose)
            dt = time.monotonic() - t0
            v["times"].append(dt)
            print(f"rep {rep} update={name}: {n / dt:7.1f} scans/s",
                  flush=True)

    print("\n== summary (best / median) ==")
    for name, v in variants.items():
        best = min(v["times"])
        med = sorted(v["times"])[len(v["times"]) // 2]
        print(f"update={name}: best {n / best:7.1f} scans/s  median "
              f"{n / med:7.1f}  ATE {v['ate']:.4f}  "
              f"compile {v['compile_s']:.0f} s")


if __name__ == "__main__":
    main()
