"""Generate a real-format Ouster fixture: pcap + metadata JSON + NC GT csv.

Synthesizes a recording at the true LEGACY byte layout with epoch-scale
timestamps (~1.7e9 s, like PTP-synced sensors in Newer College bags), so
the full CLI path — pcap split, packet decode, scan assembly, build_batches
timestamp rebase, fused LIO, GT matching/ATE — is exercised end to end the
way a real capture would (reference surface: ``ptudes ekf-bench ouster``,
``/root/reference/src/ptudes/cli/ekf_bench.py:326-666``).

The scene, trajectory and IMU come from the analytic simulator
(``ptudes_tpu.models.sim``); the sweep is a true rotosweep (each column
rendered from its own interpolated pose), which the constant-velocity
deskew must undo. GT poses are written at the scan timestamps but carry the
mid-sweep pose — the kiss deskew anchors points at mid-scan
(``ptudes_tpu/ops/deskew.py``), so that is the pose ICP estimates.

Usage: python tools/make_fixture.py OUTDIR [--scans N] [--h H] [--w W]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ptudes_tpu import GRAV  # noqa: E402
from ptudes_tpu.io import metadata as meta_io  # noqa: E402
from ptudes_tpu.io import packets as pkt  # noqa: E402
from ptudes_tpu.io import pcap as pcap_io  # noqa: E402
from ptudes_tpu.io.poses import save_poses_nc_gt_format  # noqa: E402
from ptudes_tpu.models import sim  # noqa: E402

T0_EPOCH = 1.7e9  # seconds — PTP epoch scale
SCAN_DT = 0.1     # 10 Hz
IMU_DT = 0.01     # 100 Hz


def make_info(h: int, w: int) -> meta_io.SensorInfo:
    return meta_io.SensorInfo(
        prod_line=f"OS-0-{h}",
        mode=f"{w}x10",
        columns_per_frame=w,
        pixels_per_column=h,
        columns_per_packet=16,
        pixel_shift_by_row=[0] * h,
        udp_profile_lidar=meta_io.PROFILE_LEGACY,
        beam_altitude_angles=np.linspace(22.5, -22.5, h),
        beam_azimuth_angles=np.zeros(h),
        lidar_origin_to_beam_origin_mm=0.0,
        lidar_to_sensor_transform=np.eye(4),
        imu_to_sensor_transform=np.eye(4),
        extrinsic=np.eye(4),
    )


def info_to_json(info: meta_io.SensorInfo) -> str:
    return json.dumps({
        "prod_line": info.prod_line,
        "lidar_mode": info.mode,
        "beam_altitude_angles": list(info.beam_altitude_angles),
        "beam_azimuth_angles": list(info.beam_azimuth_angles),
        "lidar_origin_to_beam_origin_mm": info.lidar_origin_to_beam_origin_mm,
        "lidar_to_sensor_transform":
            list(info.lidar_to_sensor_transform.ravel()),
        "imu_to_sensor_transform":
            list(info.imu_to_sensor_transform.ravel()),
        "data_format": {
            "columns_per_frame": info.w,
            "columns_per_packet": info.columns_per_packet,
            "pixel_shift_by_row": info.pixel_shift_by_row,
            "udp_profile_lidar": info.udp_profile_lidar,
        },
    }, indent=1)


def generate(outdir: str, n_scans: int = 30, h: int = 32, w: int = 512,
             seed: int = 0, noise_std: float = 0.01):
    os.makedirs(outdir, exist_ok=True)
    info = make_info(h, w)

    # trajectory sampled at sweep starts; one extra pose for the last sweep's
    # end; mid-sweep GT poses from the analytic circle at t + SCAN_DT/2
    ts_rel, poses = sim.circle_trajectory(n_scans + 1, radius=8.0, speed=2.0,
                                          scan_dt=SCAN_DT)
    _, poses_mid = sim.circle_trajectory(n_scans + 1, radius=8.0, speed=2.0,
                                         scan_dt=SCAN_DT)
    # mid-sweep poses: re-evaluate the analytic circle shifted by half a sweep
    omega = 2.0 / 8.0
    a_mid = omega * (ts_rel + SCAN_DT / 2.0)
    poses_mid = np.tile(np.eye(4), (n_scans + 1, 1, 1))
    ca, sa = np.cos(a_mid), np.sin(a_mid)
    poses_mid[:, 0, 0], poses_mid[:, 0, 1] = ca, -sa
    poses_mid[:, 1, 0], poses_mid[:, 1, 1] = sa, ca
    poses_mid[:, :3, 3] = np.stack(
        [8.0 * sa, 8.0 * (1 - ca), np.full_like(a_mid, 1.2)], -1)

    world = sim.make_sim_world(seed=seed, extent=25.0, n_boxes=30,
                               keepout_points=poses[:, :3, 3])
    sensor = sim.make_sim_sensor(h=h, w=w, fov_deg=45.0)

    payloads = []
    cpp = info.columns_per_packet
    for i in range(n_scans):
        img = sim.render_range_image(world, poses[i], sensor, max_range=60.0,
                                     noise_std=noise_std, seed=seed * 997 + i,
                                     end_pose=poses[i + 1])
        rng_mm = np.clip(img * 1000.0, 0, (1 << 20) - 1).astype(np.uint32)
        t_start = T0_EPOCH + i * SCAN_DT
        for c0 in range(0, w, cpp):
            mids = np.arange(c0, c0 + cpp)
            col_ts_ns = ((t_start + mids / w * SCAN_DT) * 1e9).astype(
                np.uint64)
            buf = pkt.make_legacy_packet(info, col_ts_ns, mids, 1 + i,
                                         rng_mm[:, mids].T)
            payloads.append((float(col_ts_ns[0]) * 1e-9, buf))

    # IMU packets at 100 Hz over the whole recording (exact circle IMU)
    imu_ts_rel = np.arange(1, n_scans * 10 + 1) * IMU_DT
    imu = sim.imu_for_circle(imu_ts_rel, radius=8.0, speed=2.0)
    lacc, avel = np.asarray(imu.lacc, np.float64), np.asarray(imu.avel,
                                                              np.float64)
    for k, trel in enumerate(imu_ts_rel):
        ns = int(round((T0_EPOCH + trel) * 1e9))
        buf = pkt.make_imu_packet(ns, lacc[k] / GRAV, np.rad2deg(avel[k]))
        payloads.append((T0_EPOCH + trel, buf))

    payloads.sort(key=lambda p: p[0])
    pcap_path = os.path.join(outdir, "fixture.pcap")
    # mtu=1500: lidar packets exceed Ethernet MTU and are IP-fragmented,
    # exactly like real captures — exercises the reassembly path
    pcap_io.write_pcap_udp(pcap_path, payloads, mtu=1500)

    meta_path = os.path.join(outdir, "fixture.json")
    with open(meta_path, "w") as f:
        f.write(info_to_json(info))

    # GT: mid-sweep pose, stamped with the scan timestamp the pipeline
    # reports (last valid column ts = end of sweep) so ts-matching finds it
    scan_ts = T0_EPOCH + np.arange(n_scans) * SCAN_DT + (w - 1) / w * SCAN_DT
    gt_path = os.path.join(outdir, "gt.csv")
    save_poses_nc_gt_format(gt_path, scan_ts, poses_mid[:n_scans],
                            header="synthetic circle GT (mid-sweep poses)")

    print(f"fixture: {pcap_path} ({os.path.getsize(pcap_path)} bytes), "
          f"{meta_path}, {gt_path}; {n_scans} scans {h}x{w} @ epoch "
          f"t0={T0_EPOCH}")
    return pcap_path, meta_path, gt_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--scans", type=int, default=30)
    ap.add_argument("--h", type=int, default=32)
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    generate(args.outdir, args.scans, args.h, args.w, args.seed)
