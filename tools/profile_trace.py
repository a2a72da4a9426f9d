"""Real per-op device profile of the fused LIO step via jax.profiler.

Aggregates XLA op durations from the trace-viewer JSON that
jax.profiler.trace writes, grouped by fusion/op name. This is ground
truth — unlike ablation differencing or fori-loop microbenchmarks, both
of which interact with XLA rewrites (DCE, CSE, hoisting).

Usage: python tools/profile_trace.py [--top 40]
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

from bench import H, W, RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from bench import _device_watchdog  # noqa: E402
from ptudes_tpu.models import lio, sim  # noqa: E402


def main():
    _device_watchdog()
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    scans, scan_ts, gt_mid, imu_ts = make_data()
    cfg = bench_config()
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    batches = lio.build_batches(cfg, scans, scan_ts, np.asarray(imu.lacc),
                                np.asarray(imu.avel), imu_ts)
    state = lio.init_state(cfg)

    fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
    jax.block_until_ready(out.kiss_pose)

    trace_dir = "/tmp/ptudes_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
        jax.block_until_ready(out.kiss_pose)

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace files found under", trace_dir)
        ls = glob.glob(f"{trace_dir}/**/*", recursive=True)
        for f in ls:
            print("  ", f)
        return
    events = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events.extend(data.get("traceEvents", []))

    # device-side complete events: pid/tid of TPU op lanes; use 'dur' (us)
    by_name = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e.get("pid")] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower()}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        by_name[name] += e["dur"]
        cnt[name] += 1
        total += e["dur"]

    print(f"process names: {sorted(set(pids.values()))}")
    print(f"total device op time: {total / 1e3:.1f} ms over 50 scans "
          f"({total / 1e3 / 50:.3f} ms/scan)\n")

    # join with HLO metadata: op name -> source file:line from the
    # optimized module (same jit instance -> same fusion numbering)
    lowered = jax.jit(
        lambda s, b: lio.run_sequence(s, b, sensor.lut, cfg=cfg)
    ).lower(state, batches)
    hlo = lowered.compile().as_text()
    import re
    meta = {}
    for mm in re.finditer(r"%([\w.\-]+) = [^\n]*metadata={([^}]*)}", hlo):
        name, body = mm.groups()
        if name in meta:
            continue
        op = re.search(r'op_name="([^"]*)"', body)
        f = re.search(r'source_file="([^"]*)"', body)
        ln = re.search(r"source_line=(\d+)", body)
        if op or f:
            src = f"{(f.group(1) if f else '').replace('/root/repo/', '')}" \
                  f":{ln.group(1) if ln else '?'}"
            opn = (op.group(1) if op else "").split("/")[-1]
            meta[name] = f"{src} {opn}"

    rows = sorted(by_name.items(), key=lambda kv: -kv[1])[:args.top]
    for name, us in rows:
        info = meta.get(name, "")
        print(f"{us / 50:9.1f} us/scan  x{cnt[name] // 50:<4d} "
              f"{name[:40]:40s} {info[:90]}")


if __name__ == "__main__":
    main()
