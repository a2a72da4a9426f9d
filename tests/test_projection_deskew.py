"""Tests for XYZ projection LUT and constant-velocity deskew."""
import numpy as np
import jax
import jax.numpy as jnp

from ptudes_tpu.geom import se3
from ptudes_tpu.ops import projection, deskew

RNG = np.random.default_rng(3)


def simple_lut(w=64, h=8, **kw):
    alt = np.linspace(15, -15, h)
    azi = np.zeros(h)
    return projection.make_xyz_lut(w, h, alt, azi, **kw)


class TestProjection:
    def test_directions_unit_norm(self):
        lut = simple_lut()
        n = np.linalg.norm(np.asarray(lut.direction), axis=-1)
        assert np.allclose(n, 1.0, atol=1e-6)

    def test_zero_altitude_points_in_plane(self):
        lut = projection.make_xyz_lut(32, 1, [0.0], [0.0])
        d = np.asarray(lut.direction)[0]
        assert np.allclose(d[:, 2], 0.0, atol=1e-7)
        # column 0: theta_enc = 2*pi -> +x
        assert np.allclose(d[0], [1, 0, 0], atol=1e-6)
        # quarter turn: m = W/4 -> theta = 2*pi*3/4 -> -y
        assert np.allclose(d[8], [0, -1, 0], atol=1e-5)

    def test_range_scales_distance(self):
        lut = simple_lut()
        r1 = jnp.full((8, 64), 10.0)
        r2 = jnp.full((8, 64), 20.0)
        p1 = np.asarray(projection.project(lut, r1))
        p2 = np.asarray(projection.project(lut, r2))
        assert np.allclose(np.linalg.norm(p2, axis=-1),
                           2 * np.linalg.norm(p1, axis=-1), rtol=1e-5)

    def test_beam_origin_offset(self):
        # with beam offset n, a return at range r lies at distance r from
        # the *beam origin ring*, not the lidar center
        n_mm = 15.806
        lut = projection.make_xyz_lut(32, 1, [0.0], [0.0],
                                      lidar_origin_to_beam_origin_mm=n_mm)
        p = np.asarray(projection.project(lut, jnp.full((1, 32), 5.0)))[0]
        # column 0 direction +x, beam origin at +x * n
        assert np.allclose(p[0], [5.0, 0, 0], atol=1e-6)

    def test_extrinsics_fold(self):
        ext = np.eye(4)
        ext[:3, 3] = [1.0, 2.0, 3.0]
        lut0 = simple_lut()
        lut1 = simple_lut(extrinsic=ext)
        r = jnp.full((8, 64), 7.0)
        p0 = np.asarray(projection.project(lut0, r))
        p1 = np.asarray(projection.project(lut1, r))
        assert np.allclose(p1 - p0, [1.0, 2.0, 3.0], atol=1e-5)

    def test_lidar_to_sensor_mm_translation(self):
        tf = np.eye(4)
        tf[:3, 3] = [0, 0, 36.18]  # mm, as in ouster metadata
        lut = simple_lut(lidar_to_sensor_transform=tf)
        lut0 = simple_lut()
        d = np.asarray(lut.offset) - np.asarray(lut0.offset)
        assert np.allclose(d, [0, 0, 0.03618], atol=1e-7)

    def test_scan_to_points_shapes_and_ts(self):
        lut = simple_lut()
        rng_img = jnp.asarray(RNG.uniform(0, 50, (8, 64)).astype(np.float32))
        pts, mask, ts = projection.scan_to_points(lut, rng_img)
        assert pts.shape == (512, 3) and mask.shape == (512,)
        assert np.allclose(np.asarray(ts)[:64], np.arange(64) / 64)

    def test_destagger_roundtrip(self):
        f = jnp.asarray(RNG.integers(0, 100, (4, 16)).astype(np.int32))
        shifts = jnp.asarray([0, 3, 6, 9], jnp.int32)
        d = projection.destagger(f, shifts)
        back = projection.destagger(d, -shifts)
        assert np.array_equal(np.asarray(back), np.asarray(f))


class TestDeskew:
    def test_zero_twist_identity(self):
        pts = jnp.asarray(RNG.normal(size=(100, 3)).astype(np.float32))
        out = deskew.deskew_by_twist(pts, jnp.linspace(-0.5, 0.5, 100),
                                     jnp.zeros(6))
        assert np.allclose(out, pts, atol=1e-6)

    def test_matches_exact_per_point_pose(self):
        pts = jnp.asarray(RNG.normal(size=(200, 3)).astype(np.float32) * 10)
        scales = jnp.asarray(RNG.uniform(-0.5, 0.5, 200).astype(np.float32))
        twist = jnp.asarray(np.array([0.05, -0.1, 0.2, 0.4, -0.3, 0.1],
                                     np.float32))
        fast = deskew.deskew_by_twist(pts, scales, twist)
        poses = jax.vmap(lambda s: se3.exp_twist(s * twist))(scales)
        exact = jnp.einsum("nij,nj->ni", poses[:, :3, :3], pts) + poses[:, :3, 3]
        assert np.allclose(fast, exact, atol=1e-5)

    def test_deskew_scan_uses_last_relative_motion(self):
        pts = jnp.asarray(RNG.normal(size=(50, 3)).astype(np.float32) * 5)
        ts = jnp.asarray(RNG.uniform(0, 1, 50).astype(np.float32))
        t0 = jnp.eye(4)
        tw = jnp.asarray([0.0, 0.0, 0.1, 1.0, 0.0, 0.0], jnp.float32)
        t1 = se3.exp_twist(tw)
        out = deskew.deskew_scan(pts, ts, t0, t1)
        expect = deskew.deskew_by_twist(pts, ts - 0.5, tw)
        assert np.allclose(out, expect, atol=1e-5)
        # mid-scan point (ts = 0.5) unchanged
        mid = deskew.deskew_scan(pts[:1], jnp.asarray([0.5]), t0, t1)
        assert np.allclose(mid, pts[:1], atol=1e-6)

    def test_disabled_flag(self):
        pts = jnp.asarray(RNG.normal(size=(10, 3)).astype(np.float32))
        ts = jnp.linspace(0, 1, 10)
        t1 = se3.exp_twist(jnp.asarray([0.1, 0.2, 0.3, 1.0, 2.0, 3.0]))
        out = deskew.deskew_scan(pts, ts, jnp.eye(4), t1, enabled=False)
        assert np.allclose(out, pts, atol=1e-7)
