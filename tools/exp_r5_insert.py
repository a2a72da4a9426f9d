"""Round-5 insert-path experiments at bench shapes.

profile_gather3 measured the steady insert's phase-A occupancy gather
(one meta row per frame point, at max_frame=32768 capacity width) at
~420 us net — the single largest op left in the scan body. This script
measures, at the pipeline level (the only trustworthy scoreboard):

  * actual frame occupancy on the bench scene (is 32768 oversized?)
  * max_frame right-sizing variants
  * gather index-shape reshapes (the [8192x7] anomaly from
    profile_gather3: same row count, 3x faster than [32768x1])
"""
import os
import sys
import time
from dataclasses import replace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import H, W, RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from bench import _device_watchdog  # noqa: E402
from ptudes_tpu.models import lio, sim  # noqa: E402
from ptudes_tpu.ops import voxel  # noqa: E402
from ptudes_tpu.ops.projection import scan_to_points  # noqa: E402
from ptudes_tpu.utils.metrics import calc_ate_rmse  # noqa: E402

K = 100


def timed(name, make_body, init):
    fn = jax.jit(lambda c: jax.lax.fori_loop(
        0, K, lambda i, c_: make_body(c_), init))

    def run():
        out = fn(init)
        np.asarray(jax.tree.leaves(out)[0].astype(jnp.float32))

    run()
    best = np.inf
    for _ in range(3):
        t0 = time.monotonic()
        run()
        best = min(best, time.monotonic() - t0)
    print(f"{name:46s} {best / K * 1e6:9.1f} us", flush=True)


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
        jax.block_until_ready(fin.kiss.local_map.meta)
        t0 = time.monotonic()
        fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
        jax.block_until_ready((out.kiss_pose, fin.kiss.local_map.meta))
        best = min(best, time.monotonic() - t0)
    kp = np.asarray(out.kiss_pose, np.float64)
    _, ate = calc_ate_rmse(kp, gt_mid)
    n = scans.shape[0]
    print(f"{name:30s} {n / best:7.1f} scans/s  ate {float(ate):.4f} m  "
          f"compile {compile_s - best:.0f}s", flush=True)


def main():
    _device_watchdog()
    scans, scan_ts, gt_mid, imu_ts = make_data()
    cfg = bench_config()
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)

    # --- actual frame occupancy over all 50 scans (host loop, cheap)
    vs = cfg.kiss.resolved_voxel_size
    fmax = 0
    for i in range(len(scans)):
        pts, mask, _ = scan_to_points(sensor.lut,
                                      jnp.asarray(scans[i]))
        mask = voxel.range_clip_mask(pts, mask, cfg.kiss.min_range,
                                     cfg.kiss.max_range)
        pre = voxel.window_prededup_mask(pts, mask, vs * 0.5, (H, W))
        fmax = max(fmax, int(jnp.sum(pre)))
    print(f"max window-prededup survivors over 50 scans: {fmax} "
          f"(max_frame capacity {cfg.cap.max_frame})", flush=True)

    # --- gather shape reshapes (confirm/refute the [8192x7] anomaly)
    rng = np.random.default_rng(0)
    CAP = 1 << 19
    meta8 = jnp.asarray(rng.integers(0, 2**31, (CAP, 8), np.int64),
                        jnp.int32)
    flat = jnp.asarray(rng.integers(0, CAP, (32768,), np.int64), jnp.int32)
    for shape in ((32768,), (16384, 2), (8192, 4), (4096, 8), (2048, 16),
                  (8192, 7)):
        tot = int(np.prod(shape))
        s = flat[:tot].reshape(shape)

        def body(c, s=s):
            rows = meta8.at[(s + (c & 1)) % CAP].get(
                mode="fill", fill_value=0)
            first = rows[(0,) * (rows.ndim - 1) + (0,)]
            return c + (first & 1)

        timed(f"gather meta8 idx{shape}", body, jnp.int32(0))

    # --- pipeline-level max_frame right-sizing
    for mf in (32768, 16384):
        for dd in (cfg.cap.dedup_table,):
            c2 = replace(cfg, cap=replace(cfg.cap, max_frame=mf,
                                          dedup_table=dd))
            run_variant(f"max_frame={mf}", c2, scans, scan_ts, gt_mid,
                        imu_ts, sensor, imu)


if __name__ == "__main__":
    main()
