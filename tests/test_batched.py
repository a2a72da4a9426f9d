"""Replica-fused same-chip batching (parallel.batched): the flat-table
insert must match per-replica inserts exactly, and the batched pipeline
must reproduce the single-sequence pipeline per replica."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ptudes_tpu.config import Capacity, EkfConfig, KissConfig, PipelineConfig
from ptudes_tpu.models import lio, sim
from ptudes_tpu.ops import hashmap
from ptudes_tpu.parallel import batched, replay

N_SCANS = 8
CAP = 1 << 12
PPV = 8


pytestmark = pytest.mark.slow  # big 8-device shard_map compiles; fast tier skips (run with --full)


def _rand_frames(seed, b, n):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-6, 6, size=(b, n, 3)).astype(np.float32)
    # make each replica's frame sub-voxel (0.15) unique, as the pipeline
    # guarantees: snap to a 0.15 grid and drop duplicates per replica
    vs2 = 0.15
    mask = np.zeros((b, n), bool)
    for i in range(b):
        cells = np.floor(pts[i] / vs2).astype(np.int64)
        _, first = np.unique(
            cells[:, 0] * 73856093 + cells[:, 1] * 19349663
            + cells[:, 2] * 83492791, return_index=True)
        mask[i, first] = True
    mask &= rng.random((b, n)) < 0.9
    return jnp.asarray(pts), jnp.asarray(mask)


@pytest.mark.parametrize("overflow", [True, "cond", False])
def test_insert_batched_matches_per_replica(overflow):
    b, n = 3, 2048
    pts, mask = _rand_frames(0, b, n)
    flat = hashmap.create_batched(b, CAP, PPV)
    flat = hashmap.insert_deduped_batched(
        flat, pts, mask, voxel_size=0.3, max_probes=2,
        new_capacity=1024, overflow=overflow, logical_capacity=CAP)

    for i in range(b):
        single = hashmap.create(CAP, PPV)
        m = mask[i]
        if overflow is False:
            # the batched False mode pre-decimates per replica with the
            # single-sequence rule — replicate it here
            is_new = np.asarray(m)
            pos = np.cumsum(is_new) - 1
            n_new = max(int(is_new.sum()), 1)
            keep = is_new & ((pos * 1024) % n_new < 1024)
            # every point of an empty map is storable-new, so outer
            # decimation == inner decimation for this fixture
            m = jnp.asarray(keep)
            single = hashmap.insert_deduped(
                single, pts[i], m, voxel_size=0.3, max_probes=2,
                new_capacity=1024, overflow="cond")
        else:
            single = hashmap.insert_deduped(
                single, pts[i], m, voxel_size=0.3, max_probes=2,
                new_capacity=1024, overflow=overflow)
        got = np.asarray(flat.meta[i * CAP:(i + 1) * CAP])
        want = np.asarray(single.meta)
        np.testing.assert_array_equal(got, want)
        # same stored points per slot as sets (write order within a slot
        # can differ across chunk compositions)
        gp = np.sort(np.asarray(flat.points[i * CAP:(i + 1) * CAP]), axis=1)
        wp = np.sort(np.asarray(single.points), axis=1)
        np.testing.assert_array_equal(gp, wp)


def test_remove_far_batched_matches_per_replica():
    b, n = 2, 2048
    pts, mask = _rand_frames(1, b, n)
    flat = hashmap.create_batched(b, CAP, PPV)
    flat = hashmap.insert_deduped_batched(
        flat, pts, mask, voxel_size=0.3, max_probes=2,
        new_capacity=4096, overflow=True, logical_capacity=CAP)
    origins = jnp.asarray([[0.0, 0.0, 0.0], [3.0, -2.0, 1.0]], jnp.float32)
    r2 = jnp.asarray([9.0, 4.0], jnp.float32)
    got = hashmap.remove_far_batched(flat, origins, r2,
                                     logical_capacity=CAP)
    for i in range(b):
        single = hashmap.VoxelHashMap(
            meta=flat.meta[i * CAP:(i + 1) * CAP],
            points=flat.points[i * CAP:(i + 1) * CAP])
        want = hashmap.remove_far(single, origins[i], r2[i])
        np.testing.assert_array_equal(
            np.asarray(got.meta[i * CAP:(i + 1) * CAP]),
            np.asarray(want.meta))


def make_cfg():
    return PipelineConfig(
        kiss=KissConfig(max_range=30.0, min_range=1.0,
                        max_points_per_voxel=8, max_iterations=20,
                        deskew=True, loss="plane", voxel_size=0.3,
                        plane_fit_radius=0.6),
        cap=Capacity(max_points=32 * 256, max_frame=8192, max_source=4096,
                     map_capacity=1 << 15, dedup_table=1 << 16,
                     max_new_per_scan=4096),
        ekf=EkfConfig(),
        max_imu_per_scan=16,
        guess="ekf",
    )


@pytest.fixture(scope="module")
def two_bags():
    cfg = make_cfg()
    sensor = sim.make_sim_sensor(h=32, w=256, fov_deg=45.0)
    ts, _ = sim.circle_trajectory(N_SCANS, radius=8.0, speed=2.0,
                                  scan_dt=0.1)
    imu_ts = np.arange(1, N_SCANS * 10 + 1) * 0.01
    bags = []
    for seed, radius in ((0, 8.0), (5, 6.0)):
        poses = sim.circle_poses_at(
            np.concatenate([ts, [ts[-1] + 0.1]]), radius=radius, speed=2.0)
        world = sim.make_sim_world(seed=seed, extent=25.0, n_boxes=40,
                                   keepout_points=poses[:, :3, 3])
        scans = np.stack([
            sim.render_range_image(world, poses[i], sensor, max_range=60.0,
                                   noise_std=0.01, seed=seed * 100 + i)
            for i in range(N_SCANS)
        ])
        imu = sim.imu_for_circle(imu_ts, radius=radius, speed=2.0)
        bags.append(lio.build_batches(
            cfg, scans, ts + 1e-9, np.asarray(imu.lacc),
            np.asarray(imu.avel), imu_ts))
    return sensor, cfg, bags


def test_batched_matches_single_sequence(two_bags):
    """Two DIFFERENT sequences through the flat-map batched driver must
    each match their own single-sequence run (same algorithm, same map
    content — only the scatter layout differs)."""
    sensor, cfg, bags = two_bags
    refs = [lio.run_sequence(lio.init_state(cfg), bg, sensor.lut, cfg=cfg)
            for bg in bags]

    states = replay.stack_bags([lio.init_state(cfg)] * 2)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *bags)
    fin, out = batched.run_sequence_batched(states, stacked, sensor.lut,
                                            cfg=cfg)
    assert out.kiss_pose.shape == (2, N_SCANS, 4, 4)
    for i, (fin_ref, out_ref) in enumerate(refs):
        d = np.linalg.norm(
            np.asarray(out.kiss_pose)[i, :, :3, 3]
            - np.asarray(out_ref.kiss_pose)[:, :3, 3], axis=1)
        assert d.max() < 1e-4, f"replica {i} diverged {d.max():.6f} m"
        np.testing.assert_allclose(
            np.asarray(out.ekf_pose[i]), np.asarray(out_ref.ekf_pose),
            atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(out.aux.map_points[i]),
            np.asarray(out_ref.aux.map_points))
    # final map content per replica: bitwise equality does NOT hold at the
    # pipeline level (vmapped vs unbatched matmuls round the world-frame
    # points differently in the last ulp, so most stored reps differ by
    # ~1e-6 relative — exact-content parity is proven at the hashmap level
    # by test_insert_batched_matches_per_replica); here assert the same
    # POPULATION: total stored points within 0.5% and occupied-voxel
    # count within 0.5%
    for i, (fin_ref, _) in enumerate(refs):
        got = np.asarray(fin.kiss.local_map.meta[i])
        want = np.asarray(fin_ref.kiss.local_map.meta)
        np_got, np_want = got[:, 1].sum(), want[:, 1].sum()
        assert abs(int(np_got) - int(np_want)) <= 0.005 * np_want
        nv_got, nv_want = (got[:, 1] > 0).sum(), (want[:, 1] > 0).sum()
        assert abs(int(nv_got) - int(nv_want)) <= 0.005 * nv_want


def test_batched_log_mode(two_bags):
    sensor, cfg, bags = two_bags
    states = replay.stack_bags([lio.init_state(cfg)] * 2)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *bags)
    fin, out = batched.run_sequence_batched(states, stacked, sensor.lut,
                                            cfg=cfg, log=True)
    assert out.flog.pos.shape == (2, N_SCANS, cfg.max_imu_per_scan, 3)
    assert np.isfinite(np.asarray(out.flog.pos)).all()
