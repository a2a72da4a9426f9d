"""Experiment: capacity right-sizing at bench_long's eviction-churn
operating point (VERDICT r4 next-round #2).

bench_long runs 64x512 scans with a 25 m clip on a 30 m loop — the map is
a moving window with continuous eviction+insert churn. Round 4 proved
per-row gather/scatter widths are the first-order cost knob on the 50-scan
bench but never applied that discipline here: the endurance config still
runs max_source=8192 / max_new_per_scan=8192 / max_frame=16384 at 1/4 the
scan size. This sweep measures steady-chunk throughput + quality for
right-sized capacity variants over a shortened (but churn-reaching) run.

    python tools/exp_endurance.py [n_scans=500]
"""
import os
import sys
import time
from dataclasses import replace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _device_watchdog  # noqa: E402
import bench_long  # noqa: E402
from ptudes_tpu.config import (Capacity, EkfConfig, KissConfig,  # noqa: E402
                               PipelineConfig)


def run_variant(name, cfg, scans, scan_ts, gt_mid, imu, imu_ts, sensor,
                chunk=250):
    import jax
    from ptudes_tpu.models import lio
    from ptudes_tpu.utils.metrics import calc_ate_rmse

    n = len(scans)
    state = lio.init_state(cfg)
    times = []
    outs = []
    # preload all chunk inputs to HBM before timing — the axon tunnel's
    # ~32 MB/chunk upload otherwise dominates (r5 trace: ~2.5 ms/scan of
    # transfer wait vs ~1 ms/scan of device program)
    all_b = []
    for c in range(n // chunk):
        sl = slice(c * chunk, (c + 1) * chunk)
        all_b.append(lio.build_batches(
            cfg, scans[sl], scan_ts[sl], np.asarray(imu.lacc),
            np.asarray(imu.avel), imu_ts,
            prev_scan_ts=(scan_ts[sl.start - 1] if c else None)))
    jax.block_until_ready(all_b)
    for c in range(n // chunk):
        jax.block_until_ready(state.kiss.local_map.meta)
        t0 = time.monotonic()
        state, out = lio.run_sequence(state, all_b[c], sensor.lut,
                                      cfg=cfg)
        jax.block_until_ready((out.kiss_pose, state.kiss.local_map.meta))
        times.append(time.monotonic() - t0)
        outs.append(jax.tree.map(np.asarray, out))
    out = jax.tree.map(lambda *x: np.concatenate(x), *outs)
    kp = np.asarray(out.kiss_pose, np.float64)
    _, ate = calc_ate_rmse(kp, gt_mid[:n])
    steady = [chunk / t for t in times[1:]]
    mp = np.asarray(out.aux.map_points, np.int64)
    churn = int(np.sum(np.diff(mp) < 0))
    print(f"{name:26s} steady {np.mean(steady):7.1f} scans/s "
          f"(chunks {[f'{s:.0f}' for s in steady]})  "
          f"ate {float(ate):.4f} m  churn {churn}  "
          f"map_max {mp.max()}  compile {times[0] - chunk / steady[0]:.0f}s",
          flush=True)
    return float(np.mean(steady)), float(ate)


def main():
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    _device_watchdog()
    from ptudes_tpu.models import sim

    scans, scan_ts, gt_mid, imu_ts = bench_long.make_data()
    scans, scan_ts = scans[:n_scans], scan_ts[:n_scans]
    sensor = sim.make_sim_sensor(h=bench_long.H, w=bench_long.W,
                                 fov_deg=45.0)
    imu = sim.imu_for_circle(imu_ts, radius=bench_long.RADIUS,
                             speed=bench_long.SPEED, ramp=bench_long.RAMP)

    kiss = KissConfig(max_range=bench_long.MAX_RANGE, min_range=1.0,
                      max_points_per_voxel=8, max_iterations=20,
                      deskew=True, loss="plane", voxel_size=0.3,
                      plane_fit_radius=0.6, nn_mode="cached",
                      nn_voxels=4, nn_neighborhood=7, nn_refresh_drift=0.0)

    def cfg(max_frame=16384, max_source=8192, max_new=8192,
            map_cap=1 << 19, dedup=1 << 17, boot=1, steady="cond",
            unroll=1, coldec=1, **kw):
        return PipelineConfig(
            kiss=replace(kiss, **kw),
            cap=Capacity(max_points=bench_long.H * bench_long.W,
                         max_frame=max_frame, max_source=max_source,
                         map_capacity=map_cap, dedup_table=dedup,
                         max_new_per_scan=max_new, max_probes=1),
            ekf=EkfConfig(predict_batch="pallas"),
            max_imu_per_scan=16, guess="ekf",
            bootstrap_scans=boot, steady_insert_mode=steady,
            scan_unroll=unroll, col_decimation=coldec)

    # round 1 (500 scans, steady chunk 1): r4-default 204.4 @ 0.1170,
    # boot3+decim+unroll2 206.0 @ 0.1195, src2048+new2048 251.6 @ 0.1176,
    # src2048+new4096 256.0 @ 0.1155, src2048+new1024 284.2 @ 0.0949,
    # +frame8192 263.8 @ 0.1506 (frame capacity starves the map — out),
    # +map2^18 176.6 (probe-chain collisions — out, matches r4).
    variants = [
        ("rs src2048 new1024", cfg(boot=3, steady=False, unroll=2,
                                   max_source=2048, max_new=1024)),
        ("rs src2048 new512", cfg(boot=3, steady=False, unroll=2,
                                  max_source=2048, max_new=512)),
        ("rs src1024 new1024", cfg(boot=3, steady=False, unroll=2,
                                   max_source=1024, max_new=1024)),
        ("rs new1024 unroll3", cfg(boot=3, steady=False, unroll=3,
                                   max_source=2048, max_new=1024)),
        ("rs new1024 coldec2", cfg(boot=3, steady=False, unroll=2,
                                   max_source=2048, max_new=1024,
                                   coldec=2)),
        ("rs new1024 iters12", cfg(boot=3, steady=False, unroll=2,
                                   max_source=2048, max_new=1024,
                                   max_iterations=12)),
    ]
    for name, c in variants:
        try:
            run_variant(name, c, scans, scan_ts, gt_mid, imu, imu_ts,
                        sensor)
        except Exception as e:  # noqa: BLE001 — keep sweeping
            print(f"{name:26s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
