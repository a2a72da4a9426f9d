"""Adversarial / degenerate-input tests for the masked fused pipeline.

The reference survives malformed scans with a Python ``continue``
(``src/ptudes/cli/ekf_bench.py:512-518``); here the equivalent gates are
masked array updates inside one lax.scan — a NaN or inf entering the
carry would poison every later scan, so these paths get direct tests
(VERDICT r1: degenerate-input coverage).
"""
import numpy as np
import pytest
import jax

from ptudes_tpu.models import lio, sim

from test_lio import make_cfg  # noqa: F401


N_SCANS = 12
H, W = 32, 256


@pytest.fixture(scope="module")
def small_run():
    ts, _ = sim.circle_trajectory(N_SCANS + 1, radius=8.0, speed=2.0,
                                  scan_dt=0.1, ramp=1.0)
    sweep = sim.circle_poses_at(ts, radius=8.0, speed=2.0, ramp=1.0)
    world = sim.make_sim_world(seed=3, extent=25.0, n_boxes=40,
                               keepout_points=sweep[:, :3, 3])
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=45.0)
    scans = np.stack([
        sim.render_range_image(world, sweep[i], sensor, max_range=60.0,
                               noise_std=0.01, seed=i,
                               end_pose=sweep[i + 1])
        for i in range(N_SCANS)
    ])
    imu_ts = np.arange(1, N_SCANS * 10 + 2) * 0.01
    imu = sim.imu_for_circle(imu_ts, radius=8.0, speed=2.0, ramp=1.0)
    scan_ts = ts[:N_SCANS] + 0.1
    gt_mid = sim.circle_poses_at(ts[:N_SCANS] + 0.05, radius=8.0,
                                 speed=2.0, ramp=1.0)
    return sensor, scan_ts, gt_mid, scans, imu, imu_ts


def _run(cfg, sensor, ts, scans, imu, imu_ts):
    batches = lio.build_batches(
        cfg, scans, ts, np.asarray(imu.lacc), np.asarray(imu.avel), imu_ts)
    return lio.run_sequence(lio.init_state(cfg), batches, sensor.lut,
                            cfg=cfg)


def _assert_all_finite(fin, out):
    for name, arr in [("kiss_pose", out.kiss_pose),
                      ("ekf_pose", out.ekf_pose),
                      ("ekf_vel", out.ekf_vel),
                      ("cov_diag", out.ekf_cov_diag)]:
        assert np.isfinite(np.asarray(arr)).all(), f"{name} went non-finite"
    assert np.isfinite(np.asarray(fin.ekf.cov)).all()
    assert np.isfinite(np.asarray(fin.kiss.pose)).all()


def _track_err(out, gt_mid):
    rel = np.einsum("ij,njk->nik", np.linalg.inv(gt_mid[0]), gt_mid)
    kp = np.asarray(out.kiss_pose)
    return np.linalg.norm(kp[:, :3, 3] - rel[:, :3, 3], axis=1)


@pytest.mark.slow
def test_all_zero_scan_mid_sequence(small_run):
    """A completely empty frame (all returns missing) must not corrupt the
    carry; tracking recovers on the following scans."""
    sensor, ts, gt_mid, scans, imu, imu_ts = small_run
    scans = scans.copy()
    scans[5] = 0.0
    cfg = make_cfg("ekf")
    fin, out = _run(cfg, sensor, ts, scans, imu, imu_ts)
    _assert_all_finite(fin, out)
    err = _track_err(out, gt_mid)
    assert err[-1] < 0.25, f"no recovery after empty scan: {err[-1]:.3f} m"


def test_nan_inf_ranges_masked_at_projection(small_run):
    """NaN/inf ranges (decode-boundary garbage) must be masked out by the
    projection/clip stages, never reaching the ICP carry."""
    sensor, ts, gt_mid, scans, imu, imu_ts = small_run
    scans = scans.copy()
    scans[3, :4, :] = np.nan
    scans[3, 4:8, :] = np.inf
    scans[7, ::2, ::3] = np.nan
    cfg = make_cfg("ekf")
    fin, out = _run(cfg, sensor, ts, scans, imu, imu_ts)
    _assert_all_finite(fin, out)
    err = _track_err(out, gt_mid)
    assert err[-1] < 0.25, f"NaN ranges degraded tracking: {err[-1]:.3f} m"


def test_imu_gap_spanning_multiple_scans(small_run):
    """An IMU outage spanning several scan intervals: those scans are
    skipped (reference `continue`, ekf_bench.py:512-518) and the pipeline
    recovers when samples return."""
    sensor, ts, gt_mid, scans, imu, imu_ts = small_run
    # drop all IMU samples in (ts[3], ts[6]] — scans 4..6 have none
    keep = ~((imu_ts > ts[3]) & (imu_ts <= ts[6]))
    cfg = make_cfg("ekf")
    batches = lio.build_batches(
        cfg, scans, ts, np.asarray(imu.lacc)[keep],
        np.asarray(imu.avel)[keep], imu_ts[keep])
    fin, out = lio.run_sequence(lio.init_state(cfg), batches, sensor.lut,
                                cfg=cfg)
    _assert_all_finite(fin, out)
    sv = np.asarray(out.scan_valid)
    assert not sv[4] and not sv[5] and not sv[6]
    assert sv[3] and sv[7]
    # skipped scans freeze the odometry pose (reference behavior)
    kp = np.asarray(out.kiss_pose)
    np.testing.assert_allclose(kp[4], kp[3], atol=1e-6)
    err = _track_err(out, gt_mid)
    assert err[-1] < 0.6, f"no recovery after IMU gap: {err[-1]:.3f} m"


@pytest.mark.slow
def test_teleport_guess_zero_correspondences(small_run):
    """A wildly wrong external guess (teleport far outside the map) yields
    zero correspondences; ICP must return the guess unchanged and stay
    finite — and the run must recover once guesses are sane again."""
    sensor, ts, gt_mid, scans, imu, imu_ts = small_run
    cfg = make_cfg("gt")
    guesses = np.tile(np.eye(4, dtype=np.float32), (N_SCANS, 1, 1))
    rel = np.einsum("ij,njk->nik", np.linalg.inv(gt_mid[0]), gt_mid)
    guesses[:] = rel.astype(np.float32)
    guesses[5, :3, 3] += np.asarray([500.0, 500.0, -200.0])  # teleport
    batches = lio.build_batches(
        cfg, scans, ts, np.asarray(imu.lacc), np.asarray(imu.avel), imu_ts,
        guess_poses=guesses)
    fin, out = lio.run_sequence(lio.init_state(cfg), batches, sensor.lut,
                                cfg=cfg)
    _assert_all_finite(fin, out)
    assert int(np.asarray(out.aux.num_corr)[5]) == 0
    # teleported scan returns (approximately) the guess
    d5 = np.linalg.norm(np.asarray(out.kiss_pose)[5, :3, 3]
                        - guesses[5, :3, 3])
    assert d5 < 1.0
    # recovery is partial by design parity: the teleport poisons the
    # adaptive-threshold statistics (model_sse += 500^2, exactly as
    # kiss-icp's AdaptiveThreshold would) and evicts the far-away map, so
    # the following scans re-bootstrap with a huge sigma that only decays
    # as samples accumulate. Gate: bounded error, no divergence.
    err = _track_err(out, gt_mid)
    assert err[-1] < 1.5, f"diverged after teleport: {err[-1]:.3f} m"


def test_empty_map_first_scan_keeps_guess():
    """Registration against an EMPTY map (bootstrap; also the empty-map
    resume case) must return the initial guess with zero correspondences,
    not NaN."""
    import jax.numpy as jnp
    from ptudes_tpu.models import kiss as kiss_model

    cfg = make_cfg("kiss")
    state = kiss_model.init_state(cfg.kiss, cfg.cap)
    pts = np.random.default_rng(0).uniform(2, 20, (H * W, 3)) \
        .astype(np.float32)
    mask = np.ones(H * W, bool)
    ts01 = np.tile(np.linspace(0, 1, W, endpoint=False,
                               dtype=np.float32), H)
    new_state, pose, aux = kiss_model.register_scan(
        state, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(ts01),
        cfg=cfg.kiss, cap=cfg.cap, grid_hw=(H, W))
    assert np.isfinite(np.asarray(pose)).all()
    np.testing.assert_allclose(np.asarray(pose), np.eye(4), atol=1e-5)
    assert int(np.asarray(aux.num_corr)) == 0


def test_carry_stays_finite_with_adversarial_everything(small_run):
    """Belt-and-suspenders: empty scans + NaN rows + IMU gap combined."""
    sensor, ts, gt_mid, scans, imu, imu_ts = small_run
    scans = scans.copy()
    scans[2] = 0.0
    scans[6, :8, :] = np.nan
    keep = ~((imu_ts > ts[8]) & (imu_ts <= ts[9]))
    cfg = make_cfg("ekf")
    batches = lio.build_batches(
        cfg, scans, ts, np.asarray(imu.lacc)[keep],
        np.asarray(imu.avel)[keep], imu_ts[keep])
    fin, out = lio.run_sequence(lio.init_state(cfg), batches, sensor.lut,
                                cfg=cfg)
    _assert_all_finite(fin, out)
