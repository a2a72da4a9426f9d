"""Whole-loop fused ICP kernel (ops.pallas_icp) parity vs the XLA loop.

Runs in the Pallas interpreter on CPU — numerics identical to the
compiled TPU kernel modulo op ordering inside reductions."""
import numpy as np
import jax.numpy as jnp

from ptudes_tpu.geom import se3
from ptudes_tpu.ops import hashmap, icp, voxel


def _setup(seed=5, n=2048):
    rng = np.random.default_rng(seed)
    m = hashmap.create(1 << 14, 8)
    # structured world (planes) so the plane branch actually engages
    half = 20000
    floor = np.stack([rng.uniform(-15, 15, half),
                      rng.uniform(-15, 15, half),
                      rng.uniform(-0.02, 0.02, half)], -1)
    wall = np.stack([rng.uniform(-15, 15, half),
                     np.full(half, 8.0) + rng.uniform(-0.02, 0.02, half),
                     rng.uniform(0, 4, half)], -1)
    pts = np.vstack([floor, wall]).astype(np.float32)
    keep = voxel.first_in_voxel_mask(
        jnp.asarray(pts), jnp.ones(len(pts), bool), 0.15, 1 << 17)
    m = hashmap.insert_deduped(m, jnp.asarray(pts), keep, voxel_size=0.3,
                               max_probes=2, new_capacity=8192)
    idx = rng.choice(len(pts), n, replace=False)
    src = pts[idx] + rng.normal(0, 0.01, (n, 3)).astype(np.float32)
    mask = jnp.asarray(rng.uniform(size=n) < 0.95)
    tw = np.array([0.004, -0.003, 0.006, 0.05, -0.04, 0.03], np.float32)
    guess = np.asarray(se3.exp_twist(jnp.asarray(tw)), np.float32)
    return m, jnp.asarray(src.astype(np.float32)), mask, jnp.asarray(guess)


def _run(backend, m, src, mask, guess, loss, priors=(0.01, 0.01)):
    return icp.register_frame_cached(
        src, mask, m, guess,
        jnp.asarray(0.5, jnp.float32), jnp.asarray(0.1667, jnp.float32),
        voxel_size=0.3, max_probes=2, max_iterations=30,
        convergence=1e-5, loss=loss, plane_min_quality=0.2,
        prior_rot_weight=priors[0], prior_trans_weight=priors[1],
        neighborhood=7, n_voxels=4, plane_radius=0.6,
        gn_backend=backend, refresh_drift=0.0)


def test_fused_loop_matches_xla_loop():
    m, src, mask, guess = _setup()
    for loss in ["plane", "point"]:
        for priors in [(0.01, 0.01), (0.0, 0.0)]:
            r_jnp = _run("jnp", m, src, mask, guess, loss, priors)
            r_fus = _run("fused", m, src, mask, guess, loss, priors)
            d = np.asarray(se3.log_pose(
                se3.inv(r_jnp.pose) @ r_fus.pose))
            assert np.linalg.norm(d) < 5e-4, (loss, priors, d)
            # same correspondence regime and a similar iteration count
            assert abs(int(r_jnp.num_corr) - int(r_fus.num_corr)) <= \
                max(3, int(0.01 * int(r_jnp.num_corr))), (loss, priors)
            assert abs(int(r_jnp.iterations) - int(r_fus.iterations)) <= 2


def test_fused_loop_converges_to_truth():
    m, src, mask, guess = _setup()
    res = _run("fused", m, src, mask, guess, "plane")
    # src points were drawn from the map (plus 1 cm noise): the solution
    # is identity
    d = np.asarray(se3.log_pose(res.pose))
    assert np.linalg.norm(d) < 0.02
    assert int(res.iterations) < 30


def test_fused_loop_empty_map_returns_guess():
    import jax.numpy as jnp
    from ptudes_tpu.ops import hashmap

    m, src, mask, guess = _setup()
    empty = hashmap.create(1 << 14, 8)
    res = _run("fused", empty, src, mask, guess, "plane", priors=(0.0, 0.0))
    # Tikhonov-floored solve on zero correspondences -> dx = 0 -> the
    # initial guess comes back after one masked iteration (kiss parity:
    # first frame registers at the guess)
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(guess),
                               atol=1e-6)
    assert int(res.num_corr) == 0
