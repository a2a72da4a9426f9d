"""Time register_frame_cached backends standalone on the live device.

Compares the per-registration wall time of:
  * gn_backend="pallas": XLA while_loop around the fused GN-iteration
    kernel (round-1 default on TPU)
  * gn_backend="fused":  the whole loop inside one kernel (ops.pallas_icp)
  * gn_backend="jnp":    plain XLA

Shapes mirror bench.py's ICP stage (max_source=4096, C=32 candidates,
plane loss, priors 0.01). Each timing runs the registration B times back
to back under one jit (guess perturbed per rep so the loop cannot be
CSE'd) to amortize dispatch overhead.

Usage: python tools/profile_icp_fused.py [--reps 50]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ptudes_tpu.geom import se3  # noqa: E402
from ptudes_tpu.ops import hashmap, icp, voxel  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

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
    src = jnp.asarray(pts[idx] + rng.normal(0, 0.01, (n, 3)))
    src = src.astype(jnp.float32)
    mask = jnp.ones(n, bool)
    tw = jnp.asarray([0.004, -0.003, 0.006, 0.05, -0.04, 0.03], jnp.float32)
    guess = se3.exp_twist(tw)

    def one(backend, g):
        return icp.register_frame_cached(
            src, mask, m, g,
            jnp.asarray(1.5, jnp.float32), jnp.asarray(0.1667, jnp.float32),
            voxel_size=0.5, max_probes=1, max_iterations=args.iters,
            convergence=1e-4, loss="plane", plane_min_quality=0.2,
            prior_rot_weight=0.01, prior_trans_weight=0.01,
            neighborhood=7, n_voxels=4, plane_radius=0.75,
            gn_backend=backend, refresh_drift=0.0)

    for backend in ["pallas", "fused", "jnp"]:
        @jax.jit
        def reps(g0):
            def body(g, eps):
                r = one(backend, g @ se3.exp_twist(eps))
                return g, (r.pose[0, 3], r.iterations)
            eps = jnp.zeros((args.reps, 6), jnp.float32)
            eps = eps.at[:, 3].set(
                jnp.linspace(0.0, 0.02, args.reps))
            _, (x, it) = jax.lax.scan(body, g0, eps)
            return x.sum(), it

        t0 = time.monotonic()
        out = reps(guess)
        jax.block_until_ready(out[0])
        compile_s = time.monotonic() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.monotonic()
            out = reps(guess)
            jax.block_until_ready(out[0])
            best = min(best, time.monotonic() - t0)
        it = np.asarray(out[1])
        print(f"{backend:7s}: {best / args.reps * 1e6:8.1f} us/registration "
              f"(compile {compile_s:.1f} s, iters p50 {np.median(it):.0f} "
              f"max {it.max()})")


if __name__ == "__main__":
    main()
