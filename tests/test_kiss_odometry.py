"""End-to-end odometry test: simulated lidar world -> KISS odometry -> ATE
against analytic ground-truth trajectory (SURVEY.md sec 7 minimum slice)."""
import numpy as np
import pytest
import jax.numpy as jnp

from ptudes_tpu.config import Capacity, KissConfig
from ptudes_tpu.geom import se3
from ptudes_tpu.models import kiss, sim
from ptudes_tpu.ops import projection

CAP = Capacity(
    max_points=64 * 512,
    max_frame=16384,
    max_source=4096,
    map_capacity=1 << 16,
    dedup_table=1 << 18,
)
CFG = KissConfig(max_range=60.0, min_range=1.0, voxel_size=0.6,
                 max_points_per_voxel=8, max_iterations=30)


@pytest.fixture(scope="module")
def sim_run():
    world = sim.make_world(seed=0, n=60000, extent=40.0)
    sensor = sim.make_sim_sensor(h=64, w=512, fov_deg=45.0)
    ts, poses = sim.circle_trajectory(25, radius=8.0, speed=2.0, scan_dt=0.1)
    scans = np.stack([
        sim.render_range_image(world, poses[i], sensor, max_range=60.0,
                               noise_std=0.01, seed=i)
        for i in range(len(ts))
    ])
    return world, sensor, ts, poses, scans


def run_odometry(sensor, scans, use_guess_poses=None):
    state = kiss.init_state(CFG, CAP)
    out = []
    for i in range(len(scans)):
        pts, mask, ts01 = projection.scan_to_points(
            sensor.lut, jnp.asarray(scans[i]))
        if use_guess_poses is not None:
            state, pose, aux = kiss.register_scan(
                state, pts, mask, ts01, cfg=CFG, cap=CAP,
                initial_guess=jnp.asarray(
                    use_guess_poses[i].astype(np.float32)),
                use_guess=True)
        else:
            state, pose, aux = kiss.register_scan(
                state, pts, mask, ts01, cfg=CFG, cap=CAP)
        out.append((np.asarray(pose), aux))
    return state, out


def ate_trans(est_poses, gt_poses):
    """Reference ATE definition: first-pose aligned, mean of squared errors
    (src/ptudes/ins/data.py:124-153)."""
    pose0_inv = est_poses[0] @ np.linalg.inv(gt_poses[0])
    d = [np.linalg.norm((pose0_inv @ g)[:3, 3] - e[:3, 3])
         for e, g in zip(est_poses, gt_poses)]
    return float(np.mean(np.square(d)))


def test_odometry_tracks_circle(sim_run):
    _, sensor, ts, poses, scans = sim_run
    state, out = run_odometry(sensor, scans)
    est = [p for p, _ in out]
    ate = ate_trans(est, poses)
    # 5 m of travel; decimeter-level mean-squared ATE is a solid track
    assert ate < 0.05, f"ATE trans (mean sq) = {ate:.4f} m^2"
    # map grows and stays bounded
    aux_last = out[-1][1]
    assert int(aux_last.map_points) > 1000
    # adaptive threshold should have left its initial value
    assert int(state.num_samples) > 0


def test_first_scan_returns_identity(sim_run):
    _, sensor, _, _, scans = sim_run
    state = kiss.init_state(CFG, CAP)
    pts, mask, ts01 = projection.scan_to_points(
        sensor.lut, jnp.asarray(scans[0]))
    state, pose, aux = kiss.register_scan(
        state, pts, mask, ts01, cfg=CFG, cap=CAP)
    assert np.allclose(np.asarray(pose), np.eye(4), atol=1e-5)
    assert int(aux.num_corr) == 0  # empty map on first frame
    assert int(aux.map_points) > 0  # but map got populated


def test_gt_guess_mode_tracks_tighter(sim_run):
    """Reference --use-gt-guess sanity mode (ekf_bench.py:346-349)."""
    _, sensor, ts, poses, scans = sim_run
    _, out_gt = run_odometry(sensor, scans, use_guess_poses=poses)
    est = [p for p, _ in out_gt]
    ate = ate_trans(est, poses)
    assert ate < 0.05


def test_sigma_recurrence_decreases(sim_run):
    _, sensor, _, _, scans = sim_run
    _, out = run_odometry(sensor, scans)
    sigmas = [float(a.sigma) for _, a in out]
    assert sigmas[0] == CFG.initial_threshold
    # after motion statistics accumulate, sigma should drop well below init
    assert sigmas[-1] < CFG.initial_threshold
