"""Dump optimized HLO of run_sequence and locate named fusions' metadata.

Pairs with profile_trace.py: trace gives per-fusion durations, this maps
fusion names back to python source lines (op metadata survives into the
optimized module).

Usage: python tools/dump_hlo.py fusion.2881 fusion.2882 ...
"""
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from bench import H, W, RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from ptudes_tpu.models import lio, sim  # noqa: E402

HLO_PATH = "/tmp/ptudes_hlo.txt"


def main():
    names = sys.argv[1:]
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
    txt = lowered.compile().as_text()
    with open(HLO_PATH, "w") as f:
        f.write(txt)
    print(f"optimized HLO written to {HLO_PATH} ({len(txt)} bytes)")

    if not names:
        return
    lines = txt.splitlines()
    for want in names:
        pat = re.compile(rf"%?{re.escape(want)}\b.*=")
        print(f"\n=== {want} ===")
        for i, ln in enumerate(lines):
            if pat.search(ln) and "fusion" not in ln.split("=")[0].replace(
                    want, ""):
                print(ln.strip()[:400])
                break


if __name__ == "__main__":
    main()
