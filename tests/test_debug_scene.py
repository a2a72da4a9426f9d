"""EKF debug scene export (replaces the reference's ekf_viz 3D debugger,
src/ptudes/ins/viz_utils.py:317-626) — headless load-back checks."""
import json
import os

import numpy as np
import pytest

from ptudes_tpu.config import Capacity, EkfConfig, KissConfig, PipelineConfig
from ptudes_tpu.models import lio, sim
from ptudes_tpu.viz.cloud import load_ply
from ptudes_tpu.viz.debug_scene import export_debug_scenes, sample_covariance


def test_covariance_sampling_statistics():
    """Position samples must reproduce the marginal within sampling error
    (the reference samples 2000 points from the position marginal,
    viz_utils.py:506-523)."""
    cov = np.eye(18) * 1e-6
    cov[0:3, 0:3] = np.diag([0.04, 0.01, 0.0025])
    cov[6:9, 6:9] = np.eye(3) * 1e-4
    pos = np.array([1.0, -2.0, 3.0])
    cloud, axes = sample_covariance(pos, cov, np.eye(3), n_pos=4000,
                                    n_att=100, seed=1)
    assert cloud.shape == (4000, 3)
    assert np.allclose(cloud.mean(axis=0), pos, atol=0.02)
    assert np.allclose(cloud.std(axis=0), [0.2, 0.1, 0.05], rtol=0.15)
    assert axes.shape == (300, 3)


@pytest.mark.slow
def test_export_and_load_back(tmp_path):
    n = 6
    ts, _ = sim.circle_trajectory(n + 1, radius=8.0, speed=2.0,
                                  scan_dt=0.1, ramp=1.0)
    sweep = sim.circle_poses_at(ts, radius=8.0, speed=2.0, ramp=1.0)
    world = sim.make_sim_world(seed=0, extent=25.0, n_boxes=20,
                               keepout_points=sweep[:, :3, 3])
    sensor = sim.make_sim_sensor(h=32, w=128, fov_deg=45.0)
    scans = np.stack([
        sim.render_range_image(world, sweep[i], sensor, max_range=60.0,
                               noise_std=0.01, seed=i,
                               end_pose=sweep[i + 1]) for i in range(n)])
    imu_ts = np.arange(1, n * 10 + 2) * 0.01
    imu = sim.imu_for_circle(imu_ts, radius=8.0, speed=2.0, ramp=1.0)
    cfg = PipelineConfig(
        kiss=KissConfig(max_range=30.0, min_range=1.0,
                        max_points_per_voxel=8, max_iterations=20,
                        deskew=True, loss="plane", voxel_size=0.3,
                        plane_fit_radius=0.6),
        cap=Capacity(max_points=32 * 128, max_frame=4096, max_source=2048,
                     map_capacity=1 << 15, dedup_table=1 << 16,
                     max_new_per_scan=4096),
        ekf=EkfConfig(), max_imu_per_scan=16, guess="ekf")
    batches = lio.build_batches(cfg, scans, ts[:n] + 0.1,
                                np.asarray(imu.lacc), np.asarray(imu.avel),
                                imu_ts)
    out = str(tmp_path / "scene")
    idx = export_debug_scenes(out, cfg, sensor.lut, batches, stride=2,
                              map_stride=4, n_pos_samples=500,
                              n_att_samples=20)
    assert idx["knots"] == [0, 2, 4]
    with open(os.path.join(out, "scene.json")) as f:
        assert json.load(f)["knots"] == [0, 2, 4]

    # load a mid-sequence knot back and sanity-check contents
    with open(os.path.join(out, "knot_0002.json")) as f:
        meta = json.load(f)
    assert meta["scan_valid"] and meta["num_corr"] > 100
    src = load_ply(os.path.join(out, "knot_0002_source.ply"))
    tgt = load_ply(os.path.join(out, "knot_0002_target.ply"))
    assert len(src) == meta["num_corr"] == len(tgt)
    # correspondences are within the 3-sigma gate
    d = np.linalg.norm(src - tgt, axis=1)
    assert (d <= 3.0 * meta["sigma"] + 1e-5).all()
    # covariance cloud statistics match the filter's covariance diagonal
    cov_pos = load_ply(os.path.join(out, "knot_0002_cov_pos.ply"))
    assert len(cov_pos) == 500
    ekf_pose = np.asarray(meta["ekf_pose"])
    assert np.allclose(cov_pos.mean(axis=0), ekf_pose[:3, 3], atol=0.1)
    sig = np.sqrt(np.asarray(meta["cov_diag"][0:3]))
    assert np.allclose(cov_pos.std(axis=0), sig, rtol=0.3)
    # map snapshot exists for map_stride knots
    assert os.path.exists(os.path.join(out, "knot_0000_map.ply"))
    assert os.path.exists(os.path.join(out, "knot_0004_map.ply"))
