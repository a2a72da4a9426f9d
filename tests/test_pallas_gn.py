"""Pallas fused GN iteration parity vs the plain-XLA path.

Runs the kernel in the Pallas interpreter on the CPU mesh (numerics
identical to the compiled TPU kernel)."""
import numpy as np
import jax.numpy as jnp

from ptudes_tpu.geom import se3
from ptudes_tpu.ops import hashmap, icp, voxel
from ptudes_tpu.ops.pallas_gn import BLK, gn_from_candidates_pallas


def _setup(seed=5):
    rng = np.random.default_rng(seed)
    m = hashmap.create(1 << 14, 16)
    pts = rng.uniform(-15, 15, (40000, 3)).astype(np.float32)
    keep = voxel.first_in_voxel_mask(
        jnp.asarray(pts), jnp.ones(len(pts), bool), 0.15, 1 << 17)
    m = hashmap.insert_deduped(m, jnp.asarray(pts), keep, voxel_size=0.3,
                               max_probes=2, new_capacity=8192)
    n = 2 * BLK
    src = rng.uniform(-14, 14, (n, 3)).astype(np.float32)
    mask = jnp.asarray(rng.uniform(size=n) < 0.9)
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [0.05, -0.03, 0.02]
    tj = jnp.asarray(t)
    cand = icp.gather_candidates(
        m, se3.transform(tj, jnp.asarray(src)), voxel_size=0.3,
        max_probes=2, neighborhood=7, n_voxels=4, fit_planes=True,
        plane_radius=0.6)
    return tj, jnp.asarray(src), mask, cand


def test_pallas_gn_parity():
    tj, src, mask, cand = _setup()
    kern = jnp.asarray(0.1667, jnp.float32)
    max_d2 = jnp.asarray(2.25, jnp.float32)
    for loss in ["plane", "point"]:
        jtj0, jtr0, nc0, tw0 = icp.gn_from_candidates(
            tj, src, mask, cand, kern, max_d2,
            loss=loss, plane_min_quality=0.2)
        jtj1, jtr1, nc1, tw1 = gn_from_candidates_pallas(
            tj, src, mask, cand, kern, max_d2,
            loss=loss, plane_min_quality=0.2, interpret=True)
        assert int(nc0) == int(nc1) and int(nc0) > 100
        scale = float(jnp.max(jnp.abs(jtj0))) + 1e-9
        assert float(jnp.max(jnp.abs(jtj1 - jtj0))) / scale < 1e-5
        scale_r = float(jnp.max(jnp.abs(jtr0))) + 1e-9
        assert float(jnp.max(jnp.abs(jtr1 - jtr0))) / scale_r < 1e-5
        np.testing.assert_allclose(float(tw0), float(tw1), rtol=1e-5)


def test_plane_moments_parity():
    """prep_with_plane_pallas' fused moments fit must match
    gather_candidates' XLA patch plane fit (planar scene, so the fits are
    well-conditioned)."""
    from ptudes_tpu.ops.pallas_gn import prep_with_plane_pallas
    rng = np.random.default_rng(7)
    m = hashmap.create(1 << 14, 16)
    xy = rng.uniform(-15, 15, (40000, 2)).astype(np.float32)
    z = (0.2 * xy[:, 0] + 0.1 * xy[:, 1]
         + rng.normal(scale=0.01, size=40000)).astype(np.float32)
    pts = np.column_stack([xy, z])
    keep = voxel.first_in_voxel_mask(
        jnp.asarray(pts), jnp.ones(len(pts), bool), 0.15, 1 << 17)
    m = hashmap.insert_deduped(m, jnp.asarray(pts), keep, voxel_size=0.3,
                               max_probes=2, new_capacity=8192)
    n = 2 * BLK
    sxy = rng.uniform(-14, 14, (n, 2)).astype(np.float32)
    src = np.column_stack(
        [sxy, (0.2 * sxy[:, 0] + 0.1 * sxy[:, 1])]).astype(np.float32)
    mask = jnp.asarray(rng.uniform(size=n) < 0.9)
    tj = jnp.eye(4, dtype=jnp.float32)
    src = jnp.asarray(src)
    cand = icp.gather_candidates(
        m, src, voxel_size=0.3, max_probes=2, neighborhood=7,
        n_voxels=4, fit_planes=True, plane_radius=0.6)
    q_w = se3.transform(tj, src)
    prepped = prep_with_plane_pallas(
        cand, mask, q_w, jnp.asarray(0.6, jnp.float32),
        loss="plane", interpret=True)
    # feat rows: normal(3), centroid(3), quality, mask
    n_ref = np.asarray(cand.normal)
    c_ref = np.asarray(cand.centroid)
    q_ref = np.asarray(cand.quality)
    feat = np.asarray(prepped.feat)
    ok = q_ref > 0.3  # well-conditioned fits compare stably
    assert ok.sum() > 500
    # normals defined up to sign
    dots = np.abs(np.sum(feat[0:3].T[ok] * n_ref[ok], axis=1))
    assert np.quantile(dots, 0.01) > 0.999
    np.testing.assert_allclose(feat[3:6].T[ok], c_ref[ok], atol=2e-3)
    np.testing.assert_allclose(feat[6][ok], q_ref[ok], atol=2e-2)
    np.testing.assert_allclose(
        feat[7], np.asarray(mask).astype(np.float32))
