"""Fused LIO pipeline tests (the flagship scan_step under lax.scan)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ptudes_tpu.config import Capacity, EkfConfig, KissConfig, PipelineConfig
from ptudes_tpu.models import lio, sim

N_SCANS = 20


def make_cfg(guess="ekf", **kiss_kw):
    kw = dict(max_range=30.0, min_range=1.0, max_points_per_voxel=16,
              max_iterations=40, deskew=True, loss="plane",
              voxel_size=0.3, plane_fit_radius=0.6)
    kw.update(kiss_kw)
    return PipelineConfig(
        kiss=KissConfig(**kw),
        cap=Capacity(max_points=32 * 256, max_frame=16384, max_source=8192,
                     map_capacity=1 << 16, dedup_table=1 << 17),
        ekf=EkfConfig(),
        max_imu_per_scan=16,
        guess=guess,
    )


@pytest.fixture(scope="module")
def sim_run():
    """Realistic recording: platform starts AT REST (1 s speed ramp),
    columns swept over the scan period (rotosweep), scan timestamps at the
    END of the sweep (the reference's last_valid_column_ts convention)."""
    ts, _ = sim.circle_trajectory(N_SCANS + 1, radius=8.0, speed=2.0,
                                  scan_dt=0.1, ramp=1.0)
    sweep_start = sim.circle_poses_at(ts, radius=8.0, speed=2.0, ramp=1.0)
    world = sim.make_sim_world(seed=0, extent=25.0, n_boxes=40,
                               keepout_points=sweep_start[:, :3, 3])
    sensor = sim.make_sim_sensor(h=32, w=256, fov_deg=45.0)
    scans = np.stack([
        sim.render_range_image(world, sweep_start[i], sensor, max_range=60.0,
                               noise_std=0.01, seed=i,
                               end_pose=sweep_start[i + 1])
        for i in range(N_SCANS)
    ])
    imu_ts = np.arange(1, N_SCANS * 10 + 2) * 0.01
    imu = sim.imu_for_circle(imu_ts, radius=8.0, speed=2.0, ramp=1.0)
    scan_ts = ts[:N_SCANS] + 0.1
    # registered poses represent the mid-sweep pose (deskew anchor)
    gt_mid = sim.circle_poses_at(ts[:N_SCANS] + 0.05, radius=8.0, speed=2.0,
                                 ramp=1.0)
    return sensor, scan_ts, gt_mid, scans, imu, imu_ts


def run(cfg, sensor, ts, scans, imu, imu_ts, guess_poses=None):
    batches = lio.build_batches(
        cfg, scans, ts, np.asarray(imu.lacc), np.asarray(imu.avel),
        imu_ts, guess_poses=guess_poses)
    state = lio.init_state(cfg)
    return lio.run_sequence(state, batches, sensor.lut, cfg=cfg)


def rel_gt(poses):
    return np.einsum("ij,njk->nik", np.linalg.inv(poses[0]), poses)


@pytest.mark.slow
def test_ekf_guess_lio_tracks(sim_run):
    """Loosely-coupled LIO (--use-imu-prediction equivalent) stays locked
    to ground truth over the full circle."""
    sensor, ts, poses, scans, imu, imu_ts = sim_run
    cfg = make_cfg("ekf")
    fin, out = run(cfg, sensor, ts, scans, imu, imu_ts)
    rel = rel_gt(poses)
    kerr = np.linalg.norm(
        np.asarray(out.kiss_pose)[:, :3, 3] - rel[:, :3, 3], axis=1)
    eerr = np.linalg.norm(
        np.asarray(out.ekf_pose)[:, :3, 3] - rel[:, :3, 3], axis=1)
    assert np.mean(kerr**2) < 0.02, f"kiss ATE {np.mean(kerr**2):.4f}"
    assert np.mean(eerr**2) < 0.02, f"ekf ATE {np.mean(eerr**2):.4f}"
    # every scan interval contains IMU samples (end-of-sweep timestamps)
    assert np.asarray(out.scan_valid).all()
    # EKF velocity should be near the commanded 2 m/s after warmup
    assert abs(float(jnp.linalg.norm(fin.ekf.vel)) - 2.0) < 0.5


@pytest.mark.slow
def test_gt_guess_mode(sim_run):
    sensor, ts, poses, scans, imu, imu_ts = sim_run
    cfg = make_cfg("gt")
    fin, out = run(cfg, sensor, ts, scans, imu, imu_ts,
                   guess_poses=rel_gt(poses))
    rel = rel_gt(poses)
    kerr = np.linalg.norm(
        np.asarray(out.kiss_pose)[:, :3, 3] - rel[:, :3, 3], axis=1)
    assert np.mean(kerr**2) < 0.02


def test_ekf_guess_lio_tracks_fast(sim_run):
    """FAST-tier flagship smoke: the loosely-coupled LIO path (EKF guess
    + ICP + EKF update) must track the sim circle within a loose ATE
    bound. Uses the exact same config/shapes as the other fast-tier LIO
    tests so the compiled executable is shared; the slow tier's
    ``test_ekf_guess_lio_tracks`` keeps the tight bound + velocity
    checks. Exists so a trajectory-breaking change cannot pass the
    default (fast) suite."""
    sensor, ts, poses, scans, imu, imu_ts = sim_run
    cfg = make_cfg("ekf")
    fin, out = run(cfg, sensor, ts, scans, imu, imu_ts)
    rel = rel_gt(poses)
    kerr = np.linalg.norm(
        np.asarray(out.kiss_pose)[:, :3, 3] - rel[:, :3, 3], axis=1)
    assert np.isfinite(np.asarray(out.kiss_pose)).all()
    assert np.mean(kerr**2) < 0.05, f"kiss ATE {np.mean(kerr**2):.4f}"


def test_scan_without_imu_is_skipped(sim_run):
    sensor, ts, poses, scans, imu, imu_ts = sim_run
    cfg = make_cfg("ekf")
    batches = lio.build_batches(
        cfg, scans, ts, np.asarray(imu.lacc), np.asarray(imu.avel),
        imu_ts)
    # blank out scan 5's IMU block
    iv = np.asarray(batches.imu_valid).copy()
    iv[5] = False
    batches = batches._replace(imu_valid=jnp.asarray(iv))
    state = lio.init_state(cfg)
    fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
    sv = np.asarray(out.scan_valid)
    assert not sv[5] and sv[4] and sv[6]
    # skipped scan did not register: kiss pose at 5 unused; ekf pose at 5
    # equals the prediction-only pose (no jump)
    assert np.isfinite(np.asarray(out.ekf_pose)).all()


def test_epoch_scale_timestamps(sim_run):
    """Regression: real captures carry epoch clocks (~1.7e9 s) where f32
    resolution is ~128 s. build_batches must rebase in f64 on host so the
    trajectory is identical to the zero-based run."""
    sensor, ts, poses, scans, imu, imu_ts = sim_run
    cfg = make_cfg("ekf")
    epoch = 1.7e9
    fin0, out0 = run(cfg, sensor, ts, scans, imu, imu_ts)
    batches = lio.build_batches(
        cfg, scans, ts + epoch, np.asarray(imu.lacc),
        np.asarray(imu.avel), imu_ts + epoch)
    fin1, out1 = lio.run_sequence(
        lio.init_state(cfg), batches, sensor.lut, cfg=cfg)
    # f64 epoch+t representation rounds at ~5e-7 s, which the filter
    # amplifies to ~mm — anything beyond that means the f32 collapse is back
    # (pre-fix this diverged by meters).
    np.testing.assert_allclose(np.asarray(out1.kiss_pose),
                               np.asarray(out0.kiss_pose), rtol=0, atol=0.01)
    np.testing.assert_allclose(np.asarray(out1.ekf_pose),
                               np.asarray(out0.ekf_pose), rtol=0, atol=0.01)


@pytest.mark.slow
def test_vmap_multibag(sim_run):
    """8-way-style batched replay (BASELINE config 5) — here 2 sequences
    on the virtual device mesh's host platform."""
    sensor, ts, poses, scans, imu, imu_ts = sim_run
    cfg = make_cfg("ekf")
    batches = lio.build_batches(
        cfg, scans, ts, np.asarray(imu.lacc), np.asarray(imu.avel),
        imu_ts)
    # bag 2 = same with slightly noisier scans
    rng = np.random.default_rng(5)
    scans2 = np.where(scans > 0, scans + rng.normal(0, 0.02, scans.shape), 0.0
                      ).astype(np.float32)
    batches2 = batches._replace(range_m=jnp.asarray(scans2))
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), batches, batches2)
    states = jax.tree.map(
        lambda x: jnp.stack([x, x]),
        lio.init_state(cfg))

    fin, out = jax.vmap(
        lambda s, b: lio.run_sequence(s, b, sensor.lut, cfg=cfg)
    )(states, stacked)
    assert out.kiss_pose.shape == (2, N_SCANS, 4, 4)
    rel = rel_gt(poses)
    for b in range(2):
        kerr = np.linalg.norm(
            np.asarray(out.kiss_pose)[b, :, :3, 3] - rel[:, :3, 3], axis=1)
        assert np.mean(kerr**2) < 0.05


@pytest.mark.slow
def test_bootstrap_split_matches_full_overflow(sim_run):
    """bootstrap_scans=k (steady tail without the insert overflow loop)
    must track the full-overflow pipeline: on a slow-turnover scene the
    per-scan new-point budget covers everything after the first scans, so
    the trajectories agree to registration noise."""
    import dataclasses
    sensor, ts, gt_mid, scans, imu, imu_ts = sim_run
    cfg_full = dataclasses.replace(make_cfg(), bootstrap_scans=-1)
    cfg_boot = dataclasses.replace(cfg_full, bootstrap_scans=2)
    _, out_full = run(cfg_full, sensor, ts, scans, imu, imu_ts)
    _, out_boot = run(cfg_boot, sensor, ts, scans, imu, imu_ts)
    kf = np.asarray(out_full.kiss_pose)
    kb = np.asarray(out_boot.kiss_pose)
    d = np.linalg.norm(kf[:, :3, 3] - kb[:, :3, 3], axis=1)
    assert np.isfinite(kb).all()
    assert d.max() < 0.1, f"bootstrap-split diverged {d.max():.4f} m"


def test_logged_run_emits_imu_rate_history(sim_run):
    """run_sequence(log=True) emits the IMU-rate EKF history the reference
    gets from ESEKF(_logging=True) (src/ptudes/ins/es_ekf.py:171-179) and
    the ouster-mode figure set renders headless from it."""
    import matplotlib
    matplotlib.use("Agg")
    sensor, ts, poses, scans, imu, imu_ts = sim_run
    cfg = make_cfg("ekf")
    batches = lio.build_batches(
        cfg, scans, ts, np.asarray(imu.lacc), np.asarray(imu.avel), imu_ts)
    state = lio.init_state(cfg)
    fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg,
                                log=True)

    n, k = batches.imu_valid.shape
    assert out.flog.pos.shape == (n, k, 3)
    assert out.flog.cov_diag.shape == (n, k, 18)

    # knot marker: exactly one per scan-with-IMUs, at the last valid slot
    upd = np.asarray(out.flog.updated)
    iv = np.asarray(batches.imu_valid)
    for i in range(n):
        if iv[i].any():
            last = np.where(iv[i])[0][-1]
            assert upd[i].sum() == 1 and upd[i, last]
            # knot entry carries the post-update state
            np.testing.assert_allclose(
                np.asarray(out.flog.pos)[i, last],
                np.asarray(out.ekf_pose)[i, :3, 3], atol=1e-6)
        else:
            assert not upd[i].any()

    flog = lio.flatten_filter_log(out.flog, batches.imu_valid)
    assert len(flog.ts) == int(iv.sum())
    assert np.all(np.diff(np.asarray(flog.ts)) > 0)  # strict IMU-rate time
    assert np.isfinite(np.asarray(flog.cov_diag)).all()

    # headless figure set (ekf_graphs consumes the flattened log directly)
    from ptudes_tpu.viz.graphs import ekf_graphs
    fig = ekf_graphs(flog,
                     imu_lacc=np.asarray(batches.imu.lacc).reshape(-1, 3)[
                         np.asarray(batches.imu_valid).reshape(-1)],
                     gt=(ts, np.asarray(out.kiss_pose)), xy_plot=True,
                     labels=["EKF", "kiss"], show=False)
    assert fig is not None

    # logging must not change the trajectory
    fin2, out2 = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
    np.testing.assert_allclose(np.asarray(out.kiss_pose),
                               np.asarray(out2.kiss_pose), atol=0)


@pytest.mark.slow
def test_frozen_map_localization(sim_run):
    """Localization-only mode (beyond the reference): split the sequence,
    build a map on the first half, then track the second half against
    the FROZEN map — pose still locks to ground truth and the map is
    bit-identical before and after."""
    import dataclasses

    sensor, ts, poses, scans, imu, imu_ts = sim_run
    cfg = make_cfg("ekf")
    h = N_SCANS // 2

    b1 = lio.build_batches(cfg, scans[:h], ts[:h], np.asarray(imu.lacc),
                           np.asarray(imu.avel), imu_ts)
    st1, _ = lio.run_sequence(lio.init_state(cfg), b1, sensor.lut, cfg=cfg)

    fcfg = dataclasses.replace(cfg, map_frozen=True)
    b2 = lio.build_batches(fcfg, scans[h:], ts[h:], np.asarray(imu.lacc),
                           np.asarray(imu.avel), imu_ts,
                           prev_scan_ts=float(ts[h - 1]))
    st2, out = lio.run_sequence(st1, b2, sensor.lut, cfg=fcfg)

    # map untouched, bit for bit
    np.testing.assert_array_equal(
        np.asarray(st1.kiss.local_map.meta),
        np.asarray(st2.kiss.local_map.meta))
    np.testing.assert_array_equal(
        np.asarray(st1.kiss.local_map.points),
        np.asarray(st2.kiss.local_map.points))

    # localization still tracks ground truth through the second half
    rel = rel_gt(poses)
    kerr = np.linalg.norm(
        np.asarray(out.kiss_pose)[:, :3, 3] - rel[h:, :3, 3], axis=1)
    assert kerr.max() < 0.15, kerr.max()
