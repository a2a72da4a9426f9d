"""Round-2 perf experiment matrix on the live device.

Variants over bench_config():
  * gn_backend="fused" — whole ICP loop in one Pallas kernel
    (ops.pallas_icp) vs the XLA while_loop around per-iteration kernels;
  * max_new_per_scan=8192 — on the frontier-heavy bench scene every scan
    overflows the 4096 budget, so the exact "cond" steady insert still
    pays one fori trip (~0.45 ms carry boundary) plus a second 4096-row
    claim+scatter (~0.2 ms); one 8192-wide chunk (~0.38 ms) was predicted
    to beat both — MEASURED TO REGRESS (253->234 base, 294->263 fused;
    see the note in the variants list below);
  * the combination, and the decimate steady mode on top.

Usage: python tools/exp_r2.py [variant ...]   (default: all)
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
    fused = replace(base, kiss=replace(base.kiss, gn_backend="fused"))
    wide = replace(base, cap=replace(base.cap, max_new_per_scan=8192))
    variants = [
        ("bench", base),
        ("fused", fused),
        ("new8192", wide),
        ("fused+new8192", replace(fused,
            cap=replace(fused.cap, max_new_per_scan=8192))),
        ("fused+new8192+decim", replace(fused,
            cap=replace(fused.cap, max_new_per_scan=8192),
            steady_insert_mode=False)),
        ("fused+new8192+nn4", replace(fused,
            kiss=replace(fused.kiss, nn_neighborhood=4),
            cap=replace(fused.cap, max_new_per_scan=8192))),
        # measured (2026-08-19): new8192 REGRESSES (253->234 base,
        # 294->263 fused) — the one-wide-chunk insert loses to the cond
        # steady mode at these occupancies; nn4/decim ride plain fused.
        ("fused+nn4", replace(fused,
            kiss=replace(fused.kiss, nn_neighborhood=4))),
        ("fused+decim", replace(fused, steady_insert_mode=False)),
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
