"""Isolate the fused ICP kernel's per-iteration cost from its fixed cost.

Runs icp_loop_pallas with convergence=0 (never converges) at several
max_iterations values and fits time = fixed + slope * iters. Separately
times the candidate gather+prep alone. This answers WHERE a registration's
~1 ms goes: prep, kernel fixed overhead, vector body per iteration, or the
scalar solve chain (which scales with iters too — distinguish by comparing
the slope against the known vector-pass cost).

Usage: python tools/profile_icp_slope.py
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
    tw = jnp.asarray([0.004, -0.003, 0.006, 0.05, -0.04, 0.03], jnp.float32)
    guess = se3.exp_twist(tw)
    reps = 50

    def run(max_iters, conv):
        @jax.jit
        def fn(g0):
            def body(g, eps):
                r = icp.register_frame_cached(
                    src, mask, m, g @ se3.exp_twist(eps),
                    jnp.asarray(1.5, jnp.float32),
                    jnp.asarray(0.1667, jnp.float32),
                    voxel_size=0.5, max_probes=1, max_iterations=max_iters,
                    convergence=conv, loss="plane", plane_min_quality=0.2,
                    prior_rot_weight=0.01, prior_trans_weight=0.01,
                    neighborhood=7, n_voxels=4, plane_radius=0.75,
                    gn_backend="fused", refresh_drift=0.0)
                return g, (r.pose[0, 3], r.iterations)
            eps = jnp.zeros((reps, 6), jnp.float32).at[:, 3].set(
                jnp.linspace(0.0, 0.02, reps))
            _, (x, it) = jax.lax.scan(body, g0, eps)
            return x.sum(), it

        out = fn(guess)
        jax.block_until_ready(out[0])
        best = np.inf
        for _ in range(3):
            t0 = time.monotonic()
            out = fn(guess)
            jax.block_until_ready(out[0])
            best = min(best, time.monotonic() - t0)
        return best / reps * 1e6, int(np.median(np.asarray(out[1])))

    # gather+prep only (max_iterations=1, conv huge -> 1 iteration)
    t1, _ = run(1, 1e9)
    rows = []
    for k in (2, 8, 16):
        t, it = run(k, 0.0)   # never converges: exactly k iterations
        rows.append((k, t))
        print(f"iters={k:3d}: {t:8.1f} us/registration")
    (k0, a), (k1, b) = rows[0], rows[-1]
    slope = (b - a) / (k1 - k0)
    fixed = a - slope * k0
    print(f"\nprep+1iter       : {t1:8.1f} us")
    print(f"per-iteration    : {slope:8.1f} us")
    print(f"fixed (incl prep): {fixed:8.1f} us")


if __name__ == "__main__":
    main()
