"""Interleaved A/B of the (flat/2, 2) gather-index reshape
(hashmap.gather_rows) at the full-pipeline level.

Variant A traces the pipeline with gather_rows monkeypatched back to the
flat gather; variant B uses the reshaped gather. The two variants use
epsilon-different static configs (convergence 1e-4 vs 1.00001e-4) so
each gets its own jit cache entry and the monkeypatch is captured at
trace time.
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
    from ptudes_tpu.ops import hashmap
    from ptudes_tpu.utils.metrics import calc_ate_rmse

    scans, scan_ts, gt_mid, imu_ts = make_data()
    n = len(scans)
    sensor = sim.make_sim_sensor(h=scans.shape[1], w=scans.shape[2],
                                 fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)

    orig = hashmap.gather_rows

    def flat_gather(table, s, fill=0):
        return table.at[s].get(mode="fill", fill_value=fill)

    variants = {}
    for name, patch, conv in (("flat", flat_gather, 1e-4),
                              ("reshape2", orig, 1.00001e-4)):
        cfg = bench_config()
        cfg = dataclasses.replace(
            cfg, kiss=dataclasses.replace(cfg.kiss,
                                          convergence_criterion=conv))
        batches = lio.build_batches(
            cfg, scans, scan_ts, np.asarray(imu.lacc),
            np.asarray(imu.avel), imu_ts)
        state = lio.init_state(cfg)
        hashmap.gather_rows = patch
        try:
            t0 = time.monotonic()
            _, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
            jax.block_until_ready(out.kiss_pose)
            compile_s = time.monotonic() - t0
        finally:
            hashmap.gather_rows = orig
        _, ate = calc_ate_rmse(np.asarray(out.kiss_pose, np.float64),
                               gt_mid)
        variants[name] = dict(cfg=cfg, batches=batches, state=state,
                              ate=float(ate), compile_s=compile_s,
                              patch=patch, times=[])
        print(f"{name}: compile+run {compile_s:.1f} s, ATE {ate:.4f}",
              flush=True)

    for rep in range(reps):
        for name, v in variants.items():
            hashmap.gather_rows = v["patch"]
            try:
                t0 = time.monotonic()
                _, out = lio.run_sequence(v["state"], v["batches"],
                                          sensor.lut, cfg=v["cfg"])
                jax.block_until_ready(out.kiss_pose)
                dt = time.monotonic() - t0
            finally:
                hashmap.gather_rows = orig
            v["times"].append(dt)
            print(f"rep {rep} {name}: {n / dt:7.1f} scans/s", flush=True)

    print("\n== summary (best / median) ==")
    for name, v in variants.items():
        best = min(v["times"])
        med = sorted(v["times"])[len(v["times"]) // 2]
        print(f"{name}: best {n / best:7.1f} scans/s  median "
              f"{n / med:7.1f}  ATE {v['ate']:.4f}")


if __name__ == "__main__":
    main()
