"""Round-4b matrix: shave the steady insert + gather widths.

Base = round-4 bench config (boot3 + decimated steady insert,
315.3 scans/s @ ATE 0.0131). Trace at that operating point: insert
claim+point scatters ~225 us/scan (scatter cost is per ROW of the op —
the 4096-row budget is paid even when few points are new), candidate +
compact gathers ~420 us, full-width compact sort ~92 us.

Variants:
  * new2048/new1024 — smaller steady insert budget (scatter/claim rows
    scale down; overflow just retries next scan);
  * unroll3/unroll4 — deeper lax.scan unroll now that the steady body
    lost the cond/fori (the r3 unroll=4 regression was measured with
    the heavier body);
  * src2048 — halve the ICP source capacity (every per-point gather and
    GN row halves; ATE risk, the r2 8192->4096 step was ATE-neutral);
  * nnv3 — 3 candidate voxels instead of 4 (points-gather rows -25%).

Usage: python tools/exp_r4b.py [variant ...]
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

    base = bench_config()  # already boot3+decim after round 4
    variants = [
        ("base", base),
        ("new2048", replace(base,
                            cap=replace(base.cap, max_new_per_scan=2048))),
        ("new1024", replace(base,
                            cap=replace(base.cap, max_new_per_scan=1024))),
        ("unroll3", replace(base, scan_unroll=3)),
        ("unroll4", replace(base, scan_unroll=4)),
        ("src2048", replace(base,
                            cap=replace(base.cap, max_source=2048))),
        ("nnv3", replace(base, kiss=replace(base.kiss, nn_voxels=3))),
        ("new2048+unroll3", replace(
            base, scan_unroll=3,
            cap=replace(base.cap, max_new_per_scan=2048))),
    ]
    want = set(sys.argv[1:])
    known = {name for name, _ in variants}
    unknown = want - known
    if unknown:
        sys.exit(f"unknown variant(s): {sorted(unknown)}; "
                 f"valid: {sorted(known)}")
    for name, cfg in variants:
        if want and name not in want:
            continue
        run_variant(name, cfg, scans, scan_ts, gt_mid, imu_ts, sensor, imu)


if __name__ == "__main__":
    main()


def combos():
    scans, scan_ts, gt_mid, imu_ts = make_data()
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    base = bench_config()
    variants = [
        ("n2048+s2048", replace(base, cap=replace(
            base.cap, max_new_per_scan=2048, max_source=2048))),
        ("n2048+s2048+u3", replace(base, scan_unroll=3, cap=replace(
            base.cap, max_new_per_scan=2048, max_source=2048))),
        ("n1536+s2048", replace(base, cap=replace(
            base.cap, max_new_per_scan=1536, max_source=2048))),
        ("n1024+s2048", replace(base, cap=replace(
            base.cap, max_new_per_scan=1024, max_source=2048))),
    ]
    for name, cfg in variants:
        run_variant(name, cfg, scans, scan_ts, gt_mid, imu_ts, sensor, imu)


def combos2():
    """map_capacity sizing: the lax.scan carry boundary copies are
    map-table dominated (~290 us/scan at 2^19 slots x (8+8) i32). The
    bench map holds ~50k occupied voxels — 2^18 doubles the load factor
    (~10% -> 20%, more home-slot misses at max_probes=1) but halves the
    boundary traffic."""
    scans, scan_ts, gt_mid, imu_ts = make_data()
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    base = bench_config()
    variants = [
        ("cap18", replace(base, cap=replace(
            base.cap, map_capacity=1 << 18))),
        ("cap18+p2", replace(base, cap=replace(
            base.cap, map_capacity=1 << 18, max_probes=2))),
        ("cap17", replace(base, cap=replace(
            base.cap, map_capacity=1 << 17))),
    ]
    for name, cfg in variants:
        run_variant(name, cfg, scans, scan_ts, gt_mid, imu_ts, sensor, imu)


def combos3():
    """Cheap residual knobs at the 342 operating point."""
    scans, scan_ts, gt_mid, imu_ts = make_data()
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    base = bench_config()
    variants = [
        ("dedup17", replace(base, cap=replace(
            base.cap, dedup_table=1 << 17))),
        ("frame16k", replace(base, cap=replace(
            base.cap, max_frame=16384))),
        ("boot2", replace(base, bootstrap_scans=2)),
        ("boot4", replace(base, bootstrap_scans=4)),
    ]
    for name, cfg in variants:
        run_variant(name, cfg, scans, scan_ts, gt_mid, imu_ts, sensor, imu)
