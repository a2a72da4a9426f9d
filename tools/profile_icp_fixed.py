"""Decompose the fused registration's FIXED cost (~1 ms measured,
tools/profile_icp_slope.py: 2.6 us/GN-iteration, ~976 us fixed):

  stage A: gather_candidates (meta probe + top-V + points fetch + unpack)
  stage B: prep_with_plane_pallas (transposes + moments kernel + eig)
  stage C: everything else in register_frame_cached (glue, kernel launch)

Usage: python tools/profile_icp_fixed.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ptudes_tpu.geom import se3  # noqa: E402
from ptudes_tpu.ops import hashmap, icp, voxel  # noqa: E402
from ptudes_tpu.ops.pallas_gn import prep_with_plane_pallas  # noqa: E402


REPS = 50


def bench(fn, guess):
    """Time ``fn(pose)`` REPS times INSIDE one jit (lax.scan with a
    per-rep pose perturbation so nothing CSEs) — per-dispatch overhead
    through the axon tunnel is ~2.5 ms and would swamp per-call numbers."""
    @jax.jit
    def reps(g0):
        def body(g, eps):
            out = fn(g @ se3.exp_twist(eps))
            s = sum(jnp.sum(x.astype(jnp.float32))
                    for x in jax.tree.leaves(out))
            return g, s
        eps = jnp.zeros((REPS, 6), jnp.float32).at[:, 3].set(
            jnp.linspace(0.0, 0.02, REPS))
        _, s = jax.lax.scan(body, g0, eps)
        return s.sum()

    out = reps(guess)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.monotonic()
        out = reps(guess)
        jax.block_until_ready(out)
        best = min(best, (time.monotonic() - t0) / REPS)
    return best * 1e6


def main():
    rng = np.random.default_rng(7)
    m = hashmap.create(1 << 19, 8)
    half = 60000
    floor = np.stack([rng.uniform(-30, 30, half),
                      rng.uniform(-30, 30, half),
                      rng.uniform(-0.02, 0.02, half)], -1)
    wall = np.stack([rng.uniform(-30, 30, half),
                     np.full(half, 12.0) + rng.uniform(-0.02, 0.02, half),
                     rng.uniform(0, 6, half)], -1)
    pts = np.vstack([floor, wall]).astype(np.float32)
    keep = voxel.first_in_voxel_mask(
        jnp.asarray(pts), jnp.ones(len(pts), bool), 0.25, 1 << 18)
    m = hashmap.insert_deduped(m, jnp.asarray(pts), keep, voxel_size=0.5,
                               max_probes=1, new_capacity=65536)
    jax.block_until_ready(m.meta)

    n = 4096
    idx = rng.choice(len(pts), n, replace=False)
    src = jnp.asarray(pts[idx] + rng.normal(0, 0.01, (n, 3)),
                      dtype=jnp.float32)
    mask = jnp.ones(n, bool)
    guess = se3.exp_twist(
        jnp.asarray([0.004, -0.003, 0.006, 0.05, -0.04, 0.03], jnp.float32))

    def stage_a(g):
        return icp.gather_candidates(
            m, se3.transform(g, src), voxel_size=0.5, max_probes=1,
            neighborhood=7, n_voxels=4, fit_planes=False, plane_radius=0.75)

    def stage_ab(g):
        cand = icp.gather_candidates(
            m, se3.transform(g, src), voxel_size=0.5, max_probes=1,
            neighborhood=7, n_voxels=4, fit_planes=False, plane_radius=0.75)
        return prep_with_plane_pallas(
            cand, mask, se3.transform(g, src),
            jnp.asarray(0.75, jnp.float32), loss="plane")

    def full(g):
        return icp.register_frame_cached(
            src, mask, m, g, jnp.asarray(1.5, jnp.float32),
            jnp.asarray(0.1667, jnp.float32), voxel_size=0.5, max_probes=1,
            max_iterations=8, convergence=1e-4, loss="plane",
            plane_min_quality=0.2, prior_rot_weight=0.01,
            prior_trans_weight=0.01, neighborhood=7, n_voxels=4,
            plane_radius=0.75, gn_backend="fused", refresh_drift=0.0)

    # sub-pieces of stage A
    from ptudes_tpu.ops.voxel import voxel_coords

    def meta_gather(g):
        pts_w = se3.transform(g, src)
        qc = voxel_coords(pts_w, 0.5)
        offsets = jnp.asarray(hashmap._NEIGHBOR_OFFSETS[:7])
        keys = qc[:, None, :] + offsets[None, :, :]
        fp, h0 = hashmap._fingerprint_and_slot(keys, m.meta.shape[0])
        rows = m.meta.at[h0].get(mode="fill", fill_value=0)
        return rows.sum()

    def points_gather(g):
        pts_w = se3.transform(g, src)
        qc = voxel_coords(pts_w, 0.5)
        fp, h0 = hashmap._fingerprint_and_slot(
            qc[:, None, :] + jnp.zeros((1, 4, 3), jnp.int32), m.meta.shape[0])
        packed = m.points.at[h0].get(mode="fill", fill_value=0)
        return packed.sum()

    print(f"meta gather [4096x7 rows]   : {bench(meta_gather, guess):8.1f} us")
    print(f"points gather [4096x4 rows] : {bench(points_gather, guess):8.1f} us")
    print(f"stage A gather_candidates   : {bench(stage_a, guess):8.1f} us")
    print(f"stage A+B (+prep)           : {bench(stage_ab, guess):8.1f} us")
    print(f"full registration (8 iters) : {bench(full, guess):8.1f} us")


if __name__ == "__main__":
    main()
