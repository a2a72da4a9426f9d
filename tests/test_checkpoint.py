"""Checkpoint/resume: a split run must continue bit-exact.

The reference has no state persistence (SURVEY.md section 5); this guards
the capability the rebuild adds: full-pipeline state (voxel map + EKF
covariance) round-trips through .npz and a windowed run resumed from a
checkpoint produces the same trajectory as the unbroken run.
"""
import dataclasses

import numpy as np
import jax
import pytest

from ptudes_tpu.models import lio
from ptudes_tpu.utils.checkpoint import (checkpoint_extra, load_state,
                                         save_state)

from test_lio import make_cfg, sim_run  # noqa: F401 (fixture reuse)


@pytest.mark.slow
def test_roundtrip_and_split_resume(sim_run, tmp_path):  # noqa: F811
    sensor, ts, gt_mid, scans, imu, imu_ts = sim_run
    cfg = make_cfg()

    # unbroken run
    batches = lio.build_batches(cfg, scans, ts, np.asarray(imu.lacc),
                                np.asarray(imu.avel), imu_ts)
    fin_all, out_all = lio.run_sequence(
        lio.init_state(cfg), batches, sensor.lut, cfg=cfg)

    # first half -> checkpoint -> resume second half
    k = len(ts) // 2
    b1 = lio.build_batches(cfg, scans[:k], ts[:k], np.asarray(imu.lacc),
                           np.asarray(imu.avel), imu_ts)
    mid, _ = lio.run_sequence(lio.init_state(cfg), b1, sensor.lut, cfg=cfg)

    path = str(tmp_path / "state.npz")
    save_state(path, mid, extra={"scans": k})
    assert checkpoint_extra(path)["scans"] == k
    resumed = load_state(path, lio.init_state(cfg))
    for a, b in zip(jax.tree.leaves(mid), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    sel = imu_ts > ts[k - 1]
    b2 = lio.build_batches(cfg, scans[k:], ts[k:],
                           np.asarray(imu.lacc)[sel],
                           np.asarray(imu.avel)[sel], imu_ts[sel],
                           time_origin=lio.time_origin(ts, imu_ts))
    fin_res, out_res = lio.run_sequence(resumed, b2, sensor.lut, cfg=cfg)

    kp_all = np.asarray(out_all.kiss_pose)[k:]
    kp_res = np.asarray(out_res.kiss_pose)
    d = np.linalg.norm(kp_all[:, :3, 3] - kp_res[:, :3, 3], axis=1)
    # build_batches rebases timestamps per call (f32 windows differ) and
    # the resumed half re-runs its own bootstrap insert, so "bit-exact"
    # holds for the state roundtrip above; the trajectory agrees to
    # registration noise
    assert d.max() < 0.05, f"resumed run diverged {d.max():.4f} m"


def test_resume_prev_scan_ts_windows_imu(sim_run):  # noqa: F811
    """The CLI resume path passes the checkpoint's end_scan_ts as
    build_batches(prev_scan_ts=...) instead of pre-filtering the IMU
    arrays; both must produce identical batches — otherwise resume re-feeds
    already-integrated samples (negative-dt backwards mechanization)."""
    sensor, ts, gt_mid, scans, imu, imu_ts = sim_run
    cfg = make_cfg()
    k = len(ts) // 2
    origin = lio.time_origin(ts, imu_ts)

    sel = imu_ts > ts[k - 1]
    manual = lio.build_batches(cfg, scans[k:], ts[k:],
                               np.asarray(imu.lacc)[sel],
                               np.asarray(imu.avel)[sel], imu_ts[sel],
                               time_origin=origin)
    cli = lio.build_batches(cfg, scans[k:], ts[k:], np.asarray(imu.lacc),
                            np.asarray(imu.avel), imu_ts,
                            time_origin=origin, prev_scan_ts=ts[k - 1])
    for a, b in zip(jax.tree.leaves(manual), jax.tree.leaves(cli)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mismatched_template_rejected(sim_run, tmp_path):  # noqa: F811
    cfg = make_cfg()
    path = str(tmp_path / "state.npz")
    save_state(path, lio.init_state(cfg))
    small = dataclasses.replace(
        cfg, cap=dataclasses.replace(cfg.cap, map_capacity=1 << 15))
    with pytest.raises(ValueError, match="mismatch"):
        load_state(path, lio.init_state(small))
