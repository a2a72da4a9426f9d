"""Re-analyze an existing /tmp/ptudes_trace dump: per-op table with FULL
op_name paths + aggregation by pipeline stage.

Stage attribution comes from the op_name path recorded in HLO metadata
(jit(run_sequence)/while/body/<func>/...), which survives fusion better
than source lines. Run tools/profile_trace.py first to produce the trace;
this script only re-parses it (no device work except the cached lowering
for metadata).

Usage: python tools/trace_stages.py [--top 60]
"""
import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from bench import H, W, N_SCANS, RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from bench import _device_watchdog  # noqa: E402
from ptudes_tpu.models import lio, sim  # noqa: E402

STAGES = [
    ("icp_pallas", r"icp_loop|pallas|custom-call|prep_with_plane|gn_prepped"),
    ("icp_gather_cand", r"gather_candidates"),
    ("icp_other", r"register_frame|register_scan/.*(icp|solve_spd|exp_twist)"),
    ("voxelize", r"first_in_voxel|window_prededup|compact|range_clip"),
    ("map_insert", r"insert_deduped|insert_chunk"),
    ("map_evict", r"remove_far"),
    ("ekf", r"process_imu|process_pose|masked_update|esekf|pose_mat"),
    ("project_deskew", r"scan_to_points|deskew"),
]


def classify(op_path: str) -> str:
    for name, pat in STAGES:
        if re.search(pat, op_path):
            return name
    return "other"


def main():
    _device_watchdog()
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--scans", type=int, default=N_SCANS,
                    help="scan count the trace covers (per-scan "
                         "normalization divisor; default: bench N_SCANS)")
    args = ap.parse_args()
    ns = args.scans

    files = glob.glob("/tmp/ptudes_trace/**/*.trace.json.gz", recursive=True)
    assert files, "run tools/profile_trace.py first"
    events = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            events.extend(json.load(fh).get("traceEvents", []))

    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e.get("pid")] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower()}

    by_name = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        by_name[e.get("name", "?")] += e["dur"]
        cnt[e.get("name", "?")] += 1

    # metadata from the cached lowering
    scans, scan_ts, gt_mid, imu_ts = make_data()
    cfg = bench_config()
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    batches = lio.build_batches(cfg, scans, scan_ts, np.asarray(imu.lacc),
                                np.asarray(imu.avel), imu_ts)
    state = lio.init_state(cfg)
    lowered = jax.jit(
        lambda s, b: lio.run_sequence(s, b, sensor.lut, cfg=cfg)
    ).lower(state, batches)
    hlo = lowered.compile().as_text()
    meta = {}
    for mm in re.finditer(r"%([\w.\-]+) = [^\n]*metadata={([^}]*)}", hlo):
        name, body = mm.groups()
        if name in meta:
            continue
        op = re.search(r'op_name="([^"]*)"', body)
        if op:
            meta[name] = op.group(1)

    # skip wrapper/parent ops that double-count children
    skip = re.compile(r"^(jit_|while\.|cond\.\d+$|body\.|condition\.)")
    stage_us = defaultdict(float)
    rows = []
    for name, us in by_name.items():
        path = meta.get(name, "")
        top_level = skip.match(name) and not path
        rows.append((us, name, path, top_level))
        if not top_level:
            stage_us[classify(path or name)] += us

    print(f"=== per-stage (leaf ops only), us/scan over {ns} scans ===")
    tot = 0.0
    for k, v in sorted(stage_us.items(), key=lambda kv: -kv[1]):
        print(f"  {v / ns:8.1f}  {k}")
        tot += v
    print(f"  {tot / ns:8.1f}  TOTAL leaves\n")

    print("=== top ops (full op_name path) ===")
    for us, name, path, top in sorted(rows, key=lambda r: -r[0])[:args.top]:
        tag = "[parent] " if top else ""
        print(f"{us / ns:9.1f} us/scan x{cnt[name] // ns:<4d} {tag}{name[:28]:28s} {path[-120:]}")


if __name__ == "__main__":
    main()
