"""Per-op device profile of the replica-fused batched driver (B=2).

Round-4, VERDICT #2: single-chip replica batching still loses to serial
(x2 aggregate 165.7 vs single 298.5 scans/s). This trace shows WHERE the
2x dense-stage headroom goes in ``parallel.batched.run_sequence_batched``
— prime suspect: the vmapped candidate row-gathers (batched gathers
serialize per row exactly like batched scatters; the insert was already
flattened, the gathers were not).

Usage: python tools/trace_batched.py [--replicas 2] [--top 40]
"""
import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from bench import H, W, N_SCANS, RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from bench import _device_watchdog  # noqa: E402
from ptudes_tpu.models import lio, sim  # noqa: E402
from ptudes_tpu.parallel import batched, replay  # noqa: E402


def main():
    _device_watchdog()
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--replicas", type=int, default=2)
    args = ap.parse_args()
    b = args.replicas

    scans, scan_ts, gt_mid, imu_ts = make_data()
    cfg = bench_config()
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    base = lio.build_batches(cfg, scans, scan_ts, np.asarray(imu.lacc),
                             np.asarray(imu.avel), imu_ts)
    states = replay.stack_bags([lio.init_state(cfg) for _ in range(b)])
    batches = replay.stack_bags([base] * b)

    fin, out = batched.run_sequence_batched(
        states, batches, sensor.lut, cfg=cfg)
    jax.block_until_ready(out.kiss_pose)

    trace_dir = "/tmp/ptudes_trace_batched"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        fin, out = batched.run_sequence_batched(
            states, batches, sensor.lut, cfg=cfg)
        jax.block_until_ready(out.kiss_pose)

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
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
    by_cat = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        by_name[name] += e["dur"]
        base_name = name.split(".")[0]
        by_cat[base_name] += e["dur"]

    ns = N_SCANS
    total = sum(v for k, v in by_name.items()
                if not k.startswith(("jit_", "while")))
    print(f"B={b}: total leaf-ish device us/scan-step: {total / ns:.0f} "
          f"(aggregate {b}x{ns} scans)")
    print("=== by op category, us/scan-step ===")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {v / ns:9.1f}  {k}")
    print("=== top ops ===")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {v / ns:9.1f}  {k}")


if __name__ == "__main__":
    main()
