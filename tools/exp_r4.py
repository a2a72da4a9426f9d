"""Round-4 perf experiment matrix on the live device.

Round-4 trace finding (tools/trace_stages.py, 2026-08-20, 298 scans/s
operating point): the steady insert path is now the biggest per-scan
cost — the two exact-"cond" boundaries cost ~115 us/scan amortized even
UNTAKEN, the overflow fori (taken on early map-fill scans) another
~180 us/scan, plus ~350 us of claim/scatter work; candidate gathers
+ prep are ~550 us; the full-width compact sort ~95 us.

Hypotheses tested here:
  * bootstrapN + steady decimate: the bench scene maps almost fully in
    the first few scans (extent 30 m < max_range 70 m), so running the
    first N scans with the exact full-overflow body and the tail with
    the loop-free decimated insert should recover the decimate mode's
    speed (312 r2) without its ATE hit (0.0190 — incurred during the
    map-fill phase, not the steady tail);
  * col_decimation=2: halves every full-width stage (projection, window
    pre-dedup, compact sort) at sub-voxel spatial cost;
  * nn_neighborhood=4 on top (octant-directed candidates: 4 meta rows
    per point instead of 7).

Usage: python tools/exp_r4.py [variant ...]   (default: all)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataclasses import replace  # noqa: E402

from bench import H, W, RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from ptudes_tpu.models import sim  # noqa: E402
from exp_caps import run_variant  # noqa: E402


def main():
    scans, scan_ts, gt_mid, imu_ts = make_data()
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)

    base = bench_config()

    def boot_decim(n):
        return replace(base, bootstrap_scans=n, steady_insert_mode=False)

    variants = [
        ("bench", base),
        ("boot3+decim", boot_decim(3)),
        ("boot5+decim", boot_decim(5)),
        ("boot8+decim", boot_decim(8)),
        ("boot5+decim+cdec2", replace(boot_decim(5), col_decimation=2)),
        ("boot5+decim+nn4", replace(
            boot_decim(5),
            kiss=replace(base.kiss, nn_neighborhood=4))),
        ("cdec2", replace(base, col_decimation=2)),
    ]
    want = set(sys.argv[1:])
    known = {name for name, _ in variants}
    unknown = want - known
    if unknown:
        sys.exit(f"unknown variant(s): {sorted(unknown)}; "
                 f"valid names: {sorted(known)}")
    for name, cfg in variants:
        if want and name not in want:
            continue
        run_variant(name, cfg, scans, scan_ts, gt_mid, imu_ts, sensor, imu)


if __name__ == "__main__":
    main()
