"""Tests for metrics, stats and trajectory utilities."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from ptudes_tpu.utils import metrics, stats, trajectory

RNG = np.random.default_rng(31)


def rand_poses(n, seed=0):
    p = np.tile(np.eye(4), (n, 1, 1))
    p[:, :3, :3] = R.random(n, random_state=seed).as_matrix()
    p[:, :3, 3] = RNG.normal(size=(n, 3)) * 5
    return p


class TestAte:
    def test_identical_trajectories_zero(self):
        p = rand_poses(10)
        ate_r, ate_t = metrics.calc_ate(p, p)
        assert ate_r < 1e-10 and ate_t < 1e-10

    def test_known_offset(self):
        p = rand_poses(10)
        q = p.copy()
        q[:, 0, 3] += 1.0  # +1 m in x everywhere
        # first-pose alignment removes the common offset
        ate_r, ate_t = metrics.calc_ate(p, q)
        assert ate_t < 1e-10

    def test_mean_squared_definition(self):
        """The reference's quirk: ATE is mean of SQUARED errors, rot scaled
        by 180/pi after squaring (src/ptudes/ins/data.py:150-152)."""
        p = np.tile(np.eye(4), (3, 1, 1))
        q = p.copy()
        q[1, 0, 3] += 2.0
        q[2, 0, 3] -= 1.0
        _, ate_t = metrics.calc_ate(p, q)
        assert np.isclose(ate_t, (0 + 4 + 1) / 3)
        _, rmse_t = metrics.calc_ate_rmse(p, q)
        assert np.isclose(rmse_t, np.sqrt(5 / 3))

    def test_rotation_units(self):
        p = np.tile(np.eye(4), (2, 1, 1))
        q = p.copy()
        ang = 0.1  # rad
        q[1, :3, :3] = R.from_rotvec([0, 0, ang]).as_matrix()
        ate_r, _ = metrics.calc_ate(p, q)
        assert np.isclose(ate_r, (ang**2 / 2) * 180 / np.pi, rtol=1e-5)
        rmse_r, _ = metrics.calc_ate_rmse(p, q)
        assert np.isclose(rmse_r, np.degrees(np.sqrt(ang**2 / 2)), rtol=1e-5)


class TestStats:
    def test_imu_stats_match_numpy(self):
        t = stats.StreamStatsTracker()
        acc = RNG.normal([0, 0, 9.8], 0.3, size=(500, 3))
        gyr = RNG.normal(0, 0.1, size=(500, 3))
        for i in range(500):
            t.track_imu(acc[i], gyr[i], i * 0.01)
        assert np.allclose(t.acc_mean, acc.mean(0), atol=1e-9)
        assert np.allclose(t.acc_std, acc.std(0), atol=1e-9)
        assert np.allclose(t.gyr_std, gyr.std(0), atol=1e-9)
        assert np.isclose(t.dt, 4.99)
        g = t.gravity_estimate
        assert np.isclose(np.linalg.norm(g), 1.0)
        assert g[2] > 0.99

    def test_scan_range_merge_matches_numpy(self):
        t = stats.StreamStatsTracker()
        all_r = []
        for i in range(10):
            rng_img = RNG.integers(0, 30000, size=(32, 64)).astype(np.uint32)
            rng_img[RNG.uniform(size=(32, 64)) < 0.3] = 0
            t.track_scan(rng_img, 100.0 + i * 0.1)
            all_r.append(rng_img[rng_img > 0] * 0.001)
        cat = np.concatenate(all_r)
        assert np.isclose(t.range_mean, cat.mean(), rtol=1e-9)
        # reference merge uses (n-1) denominators -> sample std
        assert np.isclose(t.range_std, cat.std(ddof=1), rtol=1e-6)

    def test_beam_subsampling(self):
        t = stats.StreamStatsTracker(use_beams_num=4)
        rng_img = np.zeros((32, 64), np.uint32)
        rng_img[0, :] = 1000   # only beam 0 has returns
        rng_img[16, :] = 3000
        t.track_scan(rng_img, 0.0)
        # beams selected: 0, 8, 16, 24 -> values 1 m and 3 m
        assert np.isclose(t.range_mean, 2.0)


class TestTrajectory:
    def test_evaluator_endpoints_and_midpoint(self):
        p0, p1 = np.eye(4), np.eye(4).copy()
        p1[:3, 3] = [2, 0, 0]
        p1[:3, :3] = R.from_rotvec([0, 0, 0.2]).as_matrix()
        ev = trajectory.TrajectoryEvaluator([(0.0, p0), (1.0, p1)])
        assert np.allclose(ev.pose_at(0.0), p0, atol=1e-12)
        assert np.allclose(ev.pose_at(1.0), p1, atol=1e-12)
        mid = ev.pose_at(0.5)
        assert np.allclose(mid[:3, 3], [1, 0, 0], atol=1e-12)
        assert np.allclose(
            R.from_matrix(mid[:3, :3]).as_rotvec(), [0, 0, 0.1], atol=1e-12)

    def test_evaluator_bounds(self):
        ev = trajectory.TrajectoryEvaluator(
            [(0.0, np.eye(4)), (1.0, np.eye(4))], time_bounds=0.5)
        ev.pose_at(-0.5)
        ev.pose_at(1.5)
        with pytest.raises(ValueError):
            ev.pose_at(-0.6)
        with pytest.raises(ValueError):
            ev.pose_at(1.6)

    def test_prune_trajectory(self):
        # straight line, 0.5 m steps; min_dist 2 m keeps every 4th + ends
        poses = []
        for i in range(20):
            p = np.eye(4)
            p[0, 3] = i * 0.5
            poses.append((i * 0.1, p))
        pruned = trajectory.prune_trajectory(poses, min_dist_m=2.0,
                                             min_dist_angle=180.0)
        xs = [p[0, 3] for _, p in pruned]
        assert xs[0] == 0.0
        assert all(np.diff(xs) > 2.0 - 1e-9) or len(xs) >= 2
        assert xs[-1] >= 9.0

    def test_poses_for_scans_masks_out_of_span(self):
        knots = [(1.0, np.eye(4)), (2.0, np.eye(4))]
        ts = np.array([0.0, 1.5, 3.0])
        poses, valid = trajectory.poses_for_scans(ts, knots, time_bounds=0.1)
        assert valid.tolist() == [False, True, False]


# --- differential test: GT matching vs the reference's greedy walk ------

def _greedy_close_ts(nc_gt, gt_t):
    """Differential oracle: literal iterator-based rendition of the
    reference's greedy walk (src/ptudes/utils.py:255-302), written
    separately from the production port in io/poses.py."""
    if not len(nc_gt):
        return nc_gt, []
    if not len(gt_t):
        return [], []
    nc_t = [g[0] for g in nc_gt]
    min_nc = np.min(np.diff(nc_t)) if len(nc_t) > 1 else np.inf
    min_gt = np.min(np.diff(gt_t)) if len(gt_t) > 1 else np.inf
    min_dt = min(min_nc, min_gt)

    res_nc, res_t = [], []
    it_n = iter(nc_gt)
    it_g = iter(gt_t)
    n_t = next(it_n)
    g_t = next(it_g)
    while True:
        try:
            while abs(n_t[0] - g_t) > min_dt:
                while n_t[0] < g_t - min_dt:
                    n_t = next(it_n)
                while g_t < n_t[0] - min_dt:
                    g_t = next(it_g)
            if n_t[0] < g_t:
                n_t2 = next(it_n)
                if abs(n_t[0] - g_t) < abs(n_t2[0] - g_t):
                    res_nc.append(n_t)
                    res_t.append(g_t)
                    n_t = n_t2
                    g_t = next(it_g)
            elif g_t <= n_t[0]:
                g_t2 = next(it_g)
                if abs(n_t[0] - g_t) < abs(n_t[0] - g_t2):
                    res_nc.append(n_t)
                    res_t.append(g_t)
                    n_t = next(it_n)
                    g_t = g_t2
        except StopIteration:
            break
    return res_nc, res_t


def _rand_stream(rng, n, base_dt, jitter, start=0.0):
    t = start + np.cumsum(base_dt + rng.uniform(-jitter, jitter, n))
    return np.sort(t)


def test_close_ts_matches_greedy_walk_fuzz():
    from ptudes_tpu.io.poses import filter_nc_gt_by_close_ts
    rng = np.random.default_rng(7)
    mismatches = 0
    total_pairs = 0
    for trial in range(200):
        n1 = int(rng.integers(2, 60))
        n2 = int(rng.integers(2, 60))
        dt1 = float(rng.uniform(0.05, 0.3))
        dt2 = float(rng.uniform(0.05, 0.3))
        t1 = _rand_stream(rng, n1, dt1, dt1 * 0.3)
        t2 = _rand_stream(rng, n2, dt2, dt2 * 0.3,
                          start=float(rng.uniform(-1, 1)))
        if rng.random() < 0.3:  # inject a gap
            t2 = np.concatenate([t2[: n2 // 2], t2[n2 // 2:] + 5.0])
        if rng.random() < 0.2:  # exact ties
            k = min(len(t1), len(t2)) // 2
            t2[:k] = t1[:k]
            t2 = np.sort(t2)
        nc_gt = [(float(t), np.eye(4) * (i + 1))
                 for i, t in enumerate(t1)]
        ref_nc, ref_t = _greedy_close_ts(nc_gt, list(t2))
        got_nc, got_t = filter_nc_gt_by_close_ts(nc_gt, list(t2))
        ref_pairs = [(round(a[0], 9), round(b, 9))
                     for a, b in zip(ref_nc, ref_t)]
        got_pairs = [(round(a[0], 9), round(b, 9))
                     for a, b in zip(got_nc, got_t)]
        total_pairs += len(ref_pairs)
        if ref_pairs != got_pairs:
            mismatches += 1
            extra = set(got_pairs) - set(ref_pairs)
            missing = set(ref_pairs) - set(got_pairs)
            print(f"trial {trial}: ref={len(ref_pairs)} "
                  f"got={len(got_pairs)} extra={len(extra)} "
                  f"missing={len(missing)}")
    assert total_pairs > 500
    assert mismatches == 0, f"{mismatches}/200 trials diverge from greedy"
