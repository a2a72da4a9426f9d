"""ICP registration tests: recover known transforms on synthetic clouds."""
import numpy as np
import jax.numpy as jnp

from ptudes_tpu.geom import se3
from ptudes_tpu.ops import hashmap, icp

RNG = np.random.default_rng(11)
VS = 1.0


def make_world(n=4000):
    """Structured world: floor + two walls + scattered boxes (not degenerate
    for point-to-point ICP)."""
    floor = np.stack(
        [RNG.uniform(-30, 30, n // 2), RNG.uniform(-30, 30, n // 2),
         RNG.uniform(-0.05, 0.05, n // 2)], -1)
    wall1 = np.stack(
        [RNG.uniform(-30, 30, n // 4), np.full(n // 4, 10.0)
         + RNG.uniform(-0.05, 0.05, n // 4), RNG.uniform(0, 5, n // 4)], -1)
    wall2 = np.stack(
        [np.full(n // 4, -12.0) + RNG.uniform(-0.05, 0.05, n // 4),
         RNG.uniform(-30, 30, n // 4), RNG.uniform(0, 5, n // 4)], -1)
    return np.vstack([floor, wall1, wall2]).astype(np.float32)


def build_map(world):
    m = hashmap.create(1 << 15, 16)
    return hashmap.insert(
        m, jnp.asarray(world), jnp.ones(len(world), bool), voxel_size=VS
    )


def register(source, m, guess, sigma=1.0, iters=40):
    n = len(source)
    return icp.register_frame(
        jnp.asarray(source), jnp.ones(n, bool), m,
        jnp.asarray(guess.astype(np.float32)),
        jnp.asarray(3.0 * sigma), jnp.asarray(sigma / 3.0),
        voxel_size=VS, max_iterations=iters,
    )


def test_identity_stays_identity():
    world = make_world()
    m = build_map(world)
    res = register(world[::4], m, np.eye(4))
    d = np.asarray(se3.log_pose(jnp.asarray(res.pose)))
    assert np.linalg.norm(d) < 1e-3
    assert int(res.iterations) <= 3


def test_recover_small_transform():
    world = make_world()
    m = build_map(world)
    true_tw = np.array([0.02, -0.03, 0.05, 0.3, 0.2, -0.1], np.float32)
    t_true = np.asarray(se3.exp_twist(jnp.asarray(true_tw)))
    # scan points = world seen from the (inverse) true pose + noise
    src = np.asarray(
        se3.transform(se3.inv(jnp.asarray(t_true)), jnp.asarray(world[::3]))
    ) + RNG.normal(scale=0.01, size=(len(world[::3]), 3)).astype(np.float32)
    res = register(src, m, np.eye(4))
    err = np.asarray(se3.log_pose(se3.inv(jnp.asarray(t_true)) @ res.pose))
    assert np.linalg.norm(err[:3]) < 0.01   # rot, rad
    assert np.linalg.norm(err[3:]) < 0.05   # trans, m
    assert int(res.num_corr) > 0.8 * len(src)


def test_good_initial_guess_converges_faster():
    world = make_world()
    m = build_map(world)
    true_tw = np.array([0.05, 0.02, -0.08, 1.0, -0.6, 0.2], np.float32)
    t_true = np.asarray(se3.exp_twist(jnp.asarray(true_tw)))
    src = np.asarray(
        se3.transform(se3.inv(jnp.asarray(t_true)), jnp.asarray(world[::3]))
    ).astype(np.float32)
    res_cold = register(src, m, np.eye(4))
    res_warm = register(src, m, t_true)
    assert int(res_warm.iterations) <= int(res_cold.iterations)
    err = np.asarray(se3.log_pose(se3.inv(jnp.asarray(t_true)) @ res_warm.pose))
    assert np.linalg.norm(err) < 0.02


def test_empty_map_returns_initial_guess():
    m = hashmap.create(1 << 12, 8)
    src = make_world(400)
    guess = np.asarray(se3.exp_twist(jnp.asarray([0.1, 0, 0, 1.0, 2.0, 0.5])))
    res = register(src, m, guess)
    assert np.allclose(np.asarray(res.pose), guess, atol=1e-5)
    assert int(res.num_corr) == 0


def test_robust_kernel_rejects_outliers():
    world = make_world()
    m = build_map(world)
    src = world[::3].copy()
    # 20% gross outliers
    k = len(src) // 5
    src[:k] += RNG.uniform(20, 40, size=(k, 3)).astype(np.float32)
    res = register(src, m, np.eye(4), sigma=0.5)
    d = np.asarray(se3.log_pose(jnp.asarray(res.pose)))
    assert np.linalg.norm(d) < 0.02


def test_octant_neighborhood_recall():
    """neighborhood=4 (octant-directed) must surface the true NN whenever
    the query sits within half a voxel of it — the regime ICP operates in
    (sources are drawn from / near mapped surfaces)."""
    import jax.numpy as jnp
    from ptudes_tpu.ops import icp

    rng = np.random.default_rng(19)
    world = make_world(6000)
    m = build_map(world)
    idx = rng.choice(len(world), 512, replace=False)
    queries = world[idx] + rng.uniform(-0.2, 0.2, (512, 3)).astype(
        np.float32) * VS
    qj = jnp.asarray(queries)

    def nn_d2(cand):
        d2 = jnp.sum((cand.pts - qj[:, None, :]) ** 2, axis=-1)
        return np.asarray(jnp.min(
            jnp.where(cand.valid, d2, jnp.inf), axis=-1))

    d4 = nn_d2(icp.gather_candidates(
        m, qj, voxel_size=VS, max_probes=2, neighborhood=4, n_voxels=4,
        fit_planes=False))
    d7 = nn_d2(icp.gather_candidates(
        m, qj, voxel_size=VS, max_probes=2, neighborhood=7, n_voxels=4,
        fit_planes=False))
    # near-identical NN vs the 7-face mode the pipelines run (98.6%
    # measured; where they differ the octant set is often BETTER — it
    # skips the lossy top-4-of-7 rep-distance ranking). The 7-vs-27 gap
    # is larger (~88%) and was already accepted at equal ATE.
    same = np.isclose(d4, d7, rtol=1e-5, atol=1e-7) | (
        ~np.isfinite(d4) & ~np.isfinite(d7))
    assert same.mean() > 0.97, same.mean()
    # a handful of queries may land where all 4 octant voxels are empty
    # (ICP masks not-found); the overwhelming majority must resolve
    assert np.isfinite(d4).mean() > 0.99
