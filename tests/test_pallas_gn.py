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
