"""Unit tests for SO(3)/SE(3) lib against scipy as an oracle."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from ptudes_tpu.geom import so3, se3

RNG = np.random.default_rng(42)


def rand_rotvecs(n, scale=np.pi * 0.9):
    v = RNG.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return (v * RNG.uniform(0, scale, size=(n, 1))).astype(np.float32)


class TestSO3:
    def test_hat_vee_roundtrip(self):
        v = RNG.normal(size=(7, 3)).astype(np.float32)
        m = so3.hat(jnp.asarray(v))
        assert np.allclose(so3.vee(m), v)
        # skew-symmetry
        assert np.allclose(m, -np.swapaxes(np.asarray(m), -1, -2))

    def test_exp_rotvec_vs_scipy(self):
        v = rand_rotvecs(50)
        ours = np.asarray(so3.exp_rotvec(jnp.asarray(v)))
        ref = R.from_rotvec(v).as_matrix()
        assert np.allclose(ours, ref, atol=1e-5)

    def test_exp_log_roundtrip(self):
        v = rand_rotvecs(50)
        back = np.asarray(so3.log_rotmat(so3.exp_rotvec(jnp.asarray(v))))
        assert np.allclose(back, v, atol=1e-4)

    def test_log_small_angle(self):
        v = (RNG.normal(size=(10, 3)) * 1e-6).astype(np.float32)
        back = np.asarray(so3.log_rotmat(so3.exp_rotvec(jnp.asarray(v))))
        assert np.allclose(back, v, atol=1e-6)

    def test_log_near_pi(self):
        v = rand_rotvecs(20, scale=np.pi - 1e-4)
        big = v / np.linalg.norm(v, axis=-1, keepdims=True) * (np.pi - 1e-3)
        m = R.from_rotvec(big).as_matrix().astype(np.float32)
        back = np.asarray(so3.log_rotmat(jnp.asarray(m)))
        assert np.allclose(
            R.from_rotvec(np.asarray(back)).as_matrix(), m, atol=1e-4
        )

    def test_quat_mat_roundtrip_vs_scipy(self):
        q = R.random(50, random_state=3).as_quat().astype(np.float32)
        m_ref = R.from_quat(q).as_matrix()
        m = np.asarray(so3.quat_to_mat(jnp.asarray(q)))
        assert np.allclose(m, m_ref, atol=1e-5)
        q_back = np.asarray(so3.mat_to_quat(jnp.asarray(m_ref.astype(np.float32))))
        # sign-canonicalized comparison
        sign = np.sign(np.sum(q_back * q, axis=-1, keepdims=True))
        assert np.allclose(q_back, q * sign, atol=1e-5)

    def test_quat_mul_matches_matmul(self):
        q1 = R.random(20, random_state=5).as_quat().astype(np.float32)
        q2 = R.random(20, random_state=6).as_quat().astype(np.float32)
        q12 = np.asarray(so3.quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
        m12 = R.from_quat(q1).as_matrix() @ R.from_quat(q2).as_matrix()
        assert np.allclose(so3.quat_to_mat(jnp.asarray(q12)), m12, atol=1e-5)

    def test_quat_rotate(self):
        q = R.random(20, random_state=7).as_quat().astype(np.float32)
        p = RNG.normal(size=(20, 3)).astype(np.float32)
        ours = np.asarray(so3.quat_rotate(jnp.asarray(q), jnp.asarray(p)))
        ref = np.einsum("nij,nj->ni", R.from_quat(q).as_matrix(), p)
        assert np.allclose(ours, ref, atol=1e-5)

    def test_rotvec_quat_roundtrip(self):
        v = rand_rotvecs(30)
        q = so3.rotvec_to_quat(jnp.asarray(v))
        assert np.allclose(so3.quat_to_rotvec(q), v, atol=1e-5)

    def test_euler_xyz_vs_scipy(self):
        rpy = RNG.uniform(-1.0, 1.0, size=(10, 3)).astype(np.float32)
        q = np.asarray(so3.quat_from_euler_xyz(jnp.asarray(rpy)))
        ref = R.from_euler("XYZ", rpy).as_quat()
        sign = np.sign(np.sum(q * ref, axis=-1, keepdims=True))
        assert np.allclose(q, ref * sign, atol=1e-5)


class TestSE3:
    def _rand_poses(self, n):
        r = R.random(n, random_state=11).as_matrix().astype(np.float32)
        t = RNG.normal(size=(n, 3)).astype(np.float32) * 5
        return np.asarray(se3.make_pose(jnp.asarray(r), jnp.asarray(t)))

    def test_make_inv(self):
        p = self._rand_poses(20)
        ident = np.asarray(se3.inv(jnp.asarray(p))) @ p
        assert np.allclose(ident, np.eye(4), atol=1e-5)

    def test_exp_log_roundtrip(self):
        tw = RNG.normal(size=(30, 6)).astype(np.float32)
        # keep rotation magnitude strictly below pi so log is the inverse
        n = np.linalg.norm(tw[:, :3], axis=-1, keepdims=True)
        tw[:, :3] *= 0.9 * np.pi / np.maximum(n, 1.0) * RNG.uniform(
            0.05, 1.0, size=(30, 1)).astype(np.float32)
        p = se3.exp_twist(jnp.asarray(tw))
        back = np.asarray(se3.log_pose(p))
        assert np.allclose(back, tw, atol=1e-4)

    def test_log_identity(self):
        p = jnp.eye(4)
        assert np.allclose(se3.log_pose(p), 0.0, atol=1e-7)

    def test_transform(self):
        p = self._rand_poses(4)
        pts = RNG.normal(size=(4, 100, 3)).astype(np.float32)
        ours = np.asarray(se3.transform(jnp.asarray(p), jnp.asarray(pts)))
        ref = np.einsum("bij,bnj->bni", p[:, :3, :3], pts) + p[:, None, :3, 3]
        assert np.allclose(ours, ref, atol=1e-5)

    def test_interp_endpoints_and_midpoint(self):
        p = self._rand_poses(2)
        p0, p1 = jnp.asarray(p[0]), jnp.asarray(p[1])
        assert np.allclose(se3.interp(p0, p1, jnp.asarray(0.0)), p[0], atol=1e-5)
        assert np.allclose(se3.interp(p0, p1, jnp.asarray(1.0)), p[1], atol=1e-4)
        mid = se3.interp(p0, p1, jnp.asarray(0.5))
        # midpoint is geodesic: d(p0, mid) == d(mid, p1)
        d0 = np.asarray(se3.log_pose(se3.inv(p0) @ mid))
        d1 = np.asarray(se3.log_pose(se3.inv(mid) @ p1))
        assert np.allclose(d0, d1, atol=1e-4)

    def test_jit_and_vmap(self):
        tw = jnp.asarray(RNG.normal(size=(8, 6)).astype(np.float32))
        f = jax.jit(jax.vmap(se3.exp_twist))
        assert f(tw).shape == (8, 4, 4)


def test_eight_virtual_devices():
    assert jax.device_count() == 8
