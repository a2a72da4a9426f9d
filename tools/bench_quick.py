"""Quick TPU probe: bench.py's pipeline leg only (no CPU oracle, no
replica rows) — for iterating on compile-time / throughput changes.

    PTUDES_COMPILE_CACHE=off python tools/bench_quick.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_tpu, make_data  # noqa: E402


def main():
    scans, scan_ts, gt_mid, imu_ts = make_data()
    r = bench_tpu(scans, scan_ts, gt_mid, imu_ts)
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in r.items()}))


if __name__ == "__main__":
    main()
