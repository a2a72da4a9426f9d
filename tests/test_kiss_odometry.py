"""End-to-end odometry tests on the simulated analytic world.

Pure constant-velocity kiss odometry on sparse synthetic scans is only
marginally stable (sampling-noise wobble can compound through the map —
the same reason the reference pairs KISS-ICP with an ES-EKF); these tests
exercise the stable regimes: short horizons, GT-guess sanity mode
(reference --use-gt-guess), and registration quality. The fused EKF+ICP
pipeline has its own test module (test_lio.py).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from ptudes_tpu.config import Capacity, KissConfig
from ptudes_tpu.models import kiss, sim
from ptudes_tpu.ops import projection

CAP = Capacity(
    max_points=32 * 256,
    max_frame=16384,
    max_source=8192,
    map_capacity=1 << 16,
    dedup_table=1 << 17,
)
CFG = KissConfig(max_range=30.0, min_range=1.0, max_points_per_voxel=16,
                 max_iterations=40, deskew=False, loss="point")
N_SCANS = 12


@pytest.fixture(scope="module")
def sim_run():
    ts, poses = sim.circle_trajectory(N_SCANS, radius=8.0, speed=2.0,
                                      scan_dt=0.1)
    world = sim.make_sim_world(seed=0, extent=25.0, n_boxes=40,
                               keepout_points=poses[:, :3, 3])
    sensor = sim.make_sim_sensor(h=32, w=256, fov_deg=45.0)
    scans = np.stack([
        sim.render_range_image(world, poses[i], sensor, max_range=60.0,
                               noise_std=0.01, seed=i)
        for i in range(N_SCANS)
    ])
    return world, sensor, ts, poses, scans


def run_odometry(sensor, scans, cfg=CFG, use_guess_poses=None):
    state = kiss.init_state(cfg, CAP)
    out = []
    for i in range(len(scans)):
        pts, mask, ts01 = projection.scan_to_points(
            sensor.lut, jnp.asarray(scans[i]))
        if use_guess_poses is not None:
            state, pose, aux = kiss.register_scan(
                state, pts, mask, ts01, cfg=cfg, cap=CAP,
                initial_guess=jnp.asarray(
                    use_guess_poses[i].astype(np.float32)),
                use_guess=True)
        else:
            state, pose, aux = kiss.register_scan(
                state, pts, mask, ts01, cfg=cfg, cap=CAP)
        out.append((np.asarray(pose), aux))
    return state, out


def ate_trans(est_poses, gt_poses):
    """Reference ATE definition: first-pose aligned, mean of squared errors
    (src/ptudes/ins/data.py:124-153)."""
    pose0_inv = est_poses[0] @ np.linalg.inv(gt_poses[0])
    d = [np.linalg.norm((pose0_inv @ g)[:3, 3] - e[:3, 3])
         for e, g in zip(est_poses, gt_poses)]
    return float(np.mean(np.square(d)))


def test_odometry_tracks_circle_short(sim_run):
    _, sensor, ts, poses, scans = sim_run
    state, out = run_odometry(sensor, scans)
    est = [p for p, _ in out]
    ate = ate_trans(est, poses)
    # divergence guard (the initial identity-guess lag dominates on the
    # coarse test sensor); tighter accuracy gates live in test_lio.py
    assert ate < 0.3, f"ATE trans (mean sq) = {ate:.4f} m^2"
    aux_last = out[-1][1]
    assert int(aux_last.map_points) > 1000
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


def test_gt_guess_mode(sim_run):
    """Reference --use-gt-guess sanity mode (ekf_bench.py:346-349)."""
    _, sensor, ts, poses, scans = sim_run
    _, out_gt = run_odometry(sensor, scans, use_guess_poses=poses)
    est = [p for p, _ in out_gt]
    ate = ate_trans(est, poses)
    assert ate < 0.1


def test_plane_loss_tracks(sim_run):
    _, sensor, ts, poses, scans = sim_run
    cfg = KissConfig(max_range=30.0, min_range=1.0, max_points_per_voxel=16,
                     max_iterations=40, deskew=False, loss="plane")
    _, out = run_odometry(sensor, scans, cfg=cfg)
    est = [p for p, _ in out]
    ate = ate_trans(est, poses)
    assert ate < 0.3


def test_sigma_recurrence(sim_run):
    _, sensor, _, _, scans = sim_run
    _, out = run_odometry(sensor, scans)
    sigmas = [float(a.sigma) for _, a in out]
    assert sigmas[0] == CFG.initial_threshold
    assert sigmas[-1] < CFG.initial_threshold


def test_grid_prededup_matches_flat_path(sim_run):
    """The grid path (window pre-dedup + sort-grouped exact dedup) must
    register like the full-width table dedup. The point sets are not
    bit-identical: the table path loses ~3% of points to dedup-table
    index collisions, while the sorted path dedups at 31-bit hash width
    (losses ~1e-4) — so the grid path must store at least as many points,
    close to the true unique-voxel count, with matching poses."""
    world, sensor, ts, poses, scans = sim_run
    state_a = kiss.init_state(CFG, CAP)
    state_b = kiss.init_state(CFG, CAP)
    for i in range(4):
        pts, mask, ts01 = projection.scan_to_points(
            sensor.lut, jnp.asarray(scans[i]))
        state_a, pose_a, _ = kiss.register_scan(
            state_a, pts, mask, ts01, cfg=CFG, cap=CAP)
        state_b, pose_b, _ = kiss.register_scan(
            state_b, pts, mask, ts01, cfg=CFG, cap=CAP,
            grid_hw=(32, 256))
        # equal tracking quality vs ground truth (poses are NOT bitwise
        # comparable once the maps hold slightly different point sets)
        gt = np.linalg.inv(poses[0]) @ poses[i]
        err_a = np.linalg.norm(np.asarray(pose_a)[:3, 3] - gt[:3, 3])
        err_b = np.linalg.norm(np.asarray(pose_b)[:3, 3] - gt[:3, 3])
        assert err_b <= err_a + 0.05, (i, err_a, err_b)
        from ptudes_tpu.ops import hashmap
        na = int(hashmap.num_points(state_a.local_map))
        nb = int(hashmap.num_points(state_b.local_map))
        assert nb >= na, (na, nb)
        assert nb <= na * 1.05, (na, nb)
