"""Re-sweep loop-structure knobs on the r5 (lighter) scan body:
scan_unroll / bootstrap_scans / steady insert mode were tuned on the r4
body; three mega-kernels and two epilogue folds later the per-scan op
mix changed, so re-measure.

    python tools/exp_r5_loopknobs.py
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
    variants = [
        ("base (unroll2 boot3)", base),
        ("unroll3", replace(base, scan_unroll=3)),
        ("unroll4", replace(base, scan_unroll=4)),
        ("boot2", replace(base, bootstrap_scans=2)),
        ("boot4", replace(base, bootstrap_scans=4)),
        ("steady=cond", replace(base, steady_insert_mode="cond")),
        ("imu_k12", replace(base, max_imu_per_scan=12)),
    ]
    for name, cfg in variants:
        batches = lio.build_batches(
            cfg, scans, scan_ts, np.asarray(imu.lacc),
            np.asarray(imu.avel), imu_ts)
        state = lio.init_state(cfg)
        t0 = time.monotonic()
        fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
        jax.block_until_ready(out.kiss_pose)
        compile_s = time.monotonic() - t0
        best = np.inf
        for _ in range(3):
            jax.block_until_ready(fin.kiss.local_map.meta)
            t0 = time.monotonic()
            fin, out = lio.run_sequence(state, batches, sensor.lut,
                                        cfg=cfg)
            jax.block_until_ready((out.kiss_pose,
                                   fin.kiss.local_map.meta))
            best = min(best, time.monotonic() - t0)
        _, ate = calc_ate_rmse(np.asarray(out.kiss_pose, np.float64),
                               gt_mid)
        print(f"{name:22s} {n / best:7.1f} scans/s  ate {float(ate):.4f}"
              f"  compile {compile_s - best:.0f}s", flush=True)


if __name__ == "__main__":
    main()
