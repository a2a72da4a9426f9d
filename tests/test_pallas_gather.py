"""Parity tests for the fused candidate gather+select+prep kernels
(ops/pallas_gather.py) against the XLA reference path
(ops.icp.gather_candidates + ops.pallas_gn.prep_with_plane_pallas).

Runs the Pallas kernels in interpreter mode (CPU). The fused path's one
numeric deviation is the in-kernel Newton acos in the eigensolve
(TPU Pallas lowers no arccos), so normals/quality compare with a small
tolerance; everything integer-derived (candidate coords, validity,
selection) must match exactly.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ptudes_tpu.geom import se3
from ptudes_tpu.ops import hashmap, icp
from ptudes_tpu.ops.pallas_gather import gather_prep_fused
from ptudes_tpu.ops.pallas_gn import prep_with_plane_pallas

VS = 0.3
N = 2048  # the reference prep kernel requires N % pallas_gn.BLK == 0


def _make_map(seed=0, n_pts=4000, ppv=8, cap=1 << 12):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-6.0, 6.0, size=(n_pts, 3)).astype(np.float32)
    m = hashmap.create(cap, ppv)
    m = hashmap.insert(m, jnp.asarray(pts), jnp.ones(n_pts, bool),
                       voxel_size=VS, max_probes=2)
    return m, pts


def _make_queries(pts, seed=1):
    rng = np.random.default_rng(seed)
    src = pts[rng.choice(len(pts), N, replace=False)] \
        + rng.normal(0, 0.05, (N, 3)).astype(np.float32)
    mask = np.ones(N, bool)
    mask[-7:] = False
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [0.02, -0.01, 0.015]
    return jnp.asarray(src, jnp.float32), jnp.asarray(mask), jnp.asarray(t)


@pytest.mark.parametrize("neighborhood,max_probes", [(7, 1), (7, 2),
                                                     (27, 2)])
def test_fused_matches_xla_prep(neighborhood, max_probes):
    m, pts = _make_map()
    src, mask, t = _make_queries(pts)

    cand = icp.gather_candidates(
        m, se3.transform(t, src), voxel_size=VS, max_probes=max_probes,
        neighborhood=neighborhood, n_voxels=4, fit_planes=False)
    ref = prep_with_plane_pallas(
        cand, mask, se3.transform(t, src),
        jnp.asarray(1.5 * VS, jnp.float32), loss="plane", interpret=True)

    got = gather_prep_fused(
        m, src, mask, t, voxel_size=VS, max_probes=max_probes,
        neighborhood=neighborhood, n_voxels=4, plane_radius=1.5 * VS,
        loss="plane", interpret=True)

    # candidate tensors: same selection -> identical validity, and
    # identical coords on VALID slots (invalid slots hold junk decoded
    # from different fill rows in the two implementations)
    np.testing.assert_array_equal(np.asarray(got.inf), np.asarray(ref.inf))
    valid = np.asarray(ref.inf) == 0.0
    for a, b in ((got.cx, ref.cx), (got.cy, ref.cy), (got.cz, ref.cz)):
        np.testing.assert_allclose(np.asarray(a)[valid],
                                   np.asarray(b)[valid], rtol=0, atol=1e-6)
    # plane fit: centroid/mask exact-ish, normal/quality within the
    # Newton-acos tolerance (sign of the normal is arbitrary but the
    # closed form is deterministic -> same sign)
    np.testing.assert_allclose(np.asarray(got.feat[3:6]),
                               np.asarray(ref.feat[3:6]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.feat[7]),
                                  np.asarray(ref.feat[7]))
    q_ref = np.asarray(ref.feat[6])
    q_got = np.asarray(got.feat[6])
    np.testing.assert_allclose(q_got, q_ref, atol=2e-2)
    # normals: compare |dot| where the plane is meaningful
    good = q_ref > 0.3
    dots = np.abs(np.sum(np.asarray(got.feat[:3]).T[good]
                         * np.asarray(ref.feat[:3]).T[good], axis=1))
    assert dots.min() > 0.995, f"worst normal dot {dots.min():.4f}"


def test_fused_point_loss_feat():
    m, pts = _make_map()
    src, mask, t = _make_queries(pts)
    got = gather_prep_fused(
        m, src, mask, t, voxel_size=VS, max_probes=1, neighborhood=7,
        n_voxels=4, plane_radius=1.5 * VS, loss="point", interpret=True)
    f = np.asarray(got.feat)
    assert (f[:6] == 0).all()
    assert (f[6] == -1.0).all()
    np.testing.assert_array_equal(f[7].astype(bool), np.asarray(mask))


def test_register_frame_cached_pose_parity():
    """End to end: the registration pose with the fused gather matches
    the XLA-path pose (forced via a wide source capacity that keeps the
    kernels but swaps gather implementations is not possible from the
    public API, so compare fused vs jnp backend)."""
    m, pts = _make_map()
    src, mask, t = _make_queries(pts)
    kw = dict(voxel_size=VS, max_probes=2, max_iterations=12,
              loss="plane", neighborhood=7, n_voxels=4,
              nn_refresh_drift=0.0)

    sig = jnp.asarray(0.6, jnp.float32)
    res_jnp = icp.register_frame_cached(
        src, mask, m, t, 3.0 * sig, sig / 3.0,
        gn_backend="jnp", refresh_drift=0.0,
        voxel_size=VS, max_probes=2, max_iterations=12,
        loss="plane", neighborhood=7, n_voxels=4)
    res_pal = icp.register_frame_cached(
        src, mask, m, t, 3.0 * sig, sig / 3.0,
        gn_backend="pallas", refresh_drift=0.0,
        voxel_size=VS, max_probes=2, max_iterations=12,
        loss="plane", neighborhood=7, n_voxels=4)
    np.testing.assert_allclose(np.asarray(res_pal.pose),
                               np.asarray(res_jnp.pose), atol=2e-4)
    assert abs(int(res_pal.iterations) - int(res_jnp.iterations)) <= 2
