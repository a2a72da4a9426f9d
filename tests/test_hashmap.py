"""Property tests for the fixed-capacity voxel hash map (SURVEY.md sec 4)."""
import numpy as np
import jax.numpy as jnp

from ptudes_tpu.ops import hashmap, voxel

RNG = np.random.default_rng(7)
VS = 1.0
CAP = 1 << 14
PPV = 8


def make_map():
    return hashmap.create(CAP, PPV)


def brute_nn(stored, q):
    d = np.linalg.norm(stored[None, :, :] - q[:, None, :], axis=-1)
    k = np.argmin(d, axis=1)
    return stored[k], d[np.arange(len(q)), k]


def test_insert_and_count():
    m = make_map()
    pts = RNG.uniform(-10, 10, size=(500, 3)).astype(np.float32)
    m = hashmap.insert(m, jnp.asarray(pts), jnp.ones(500, bool), voxel_size=VS)
    assert int(hashmap.num_points(m)) == 500
    assert not bool(hashmap.is_empty(m))


def test_insert_respects_mask():
    m = make_map()
    pts = RNG.uniform(-10, 10, size=(100, 3)).astype(np.float32)
    mask = np.zeros(100, bool)
    mask[:30] = True
    m = hashmap.insert(m, jnp.asarray(pts), jnp.asarray(mask), voxel_size=VS)
    assert int(hashmap.num_points(m)) == 30


def test_max_points_per_voxel():
    m = make_map()
    # 20 points in one voxel, capacity PPV=8
    pts = (RNG.uniform(0.1, 0.9, size=(20, 3))).astype(np.float32)
    m = hashmap.insert(m, jnp.asarray(pts), jnp.ones(20, bool), voxel_size=VS)
    assert int(hashmap.num_points(m)) == PPV
    assert int(hashmap.num_voxels(m)) == 1
    # first PPV points in batch order are the ones kept (stored points are
    # voxel-quantized at VS/1024)
    stored = np.asarray(hashmap.stored_points(m, VS))[
        np.asarray(m.counts) > 0][0]
    assert np.allclose(sorted(stored.tolist()), sorted(pts[:PPV].tolist()),
                       atol=VS / 1024)
    # representative = first point of the batch
    rep = np.asarray(m.reps)[np.asarray(m.counts) > 0][0]
    assert np.allclose(rep, pts[0])


def test_incremental_insert_same_voxel():
    m = make_map()
    a = np.full((3, 3), 0.2, np.float32) + RNG.uniform(0, 0.1, (3, 3)).astype(np.float32)
    b = np.full((3, 3), 0.6, np.float32) + RNG.uniform(0, 0.1, (3, 3)).astype(np.float32)
    m = hashmap.insert(m, jnp.asarray(a), jnp.ones(3, bool), voxel_size=VS)
    m = hashmap.insert(m, jnp.asarray(b), jnp.ones(3, bool), voxel_size=VS)
    assert int(hashmap.num_points(m)) == 6
    occ = np.asarray(m.counts) > 0
    assert occ.sum() == 1  # one voxel


def test_query_exact_nn_within_neighborhood():
    m = make_map()
    pts = RNG.uniform(-15, 15, size=(2000, 3)).astype(np.float32)
    m = hashmap.insert(m, jnp.asarray(pts), jnp.ones(2000, bool), voxel_size=VS)
    q = (pts[:300] + RNG.normal(scale=0.2, size=(300, 3))).astype(np.float32)
    res = hashmap.query(m, jnp.asarray(q), voxel_size=VS, approx=False)
    nn, d2, found = np.asarray(res.nn), np.asarray(res.d2), np.asarray(res.found)
    assert found.all()
    bn, bd = brute_nn(pts, q)
    # exact query matches bruteforce whenever the true NN lies in the
    # 27-neighborhood
    same_nbhd = np.all(
        np.abs(np.floor(bn / VS) - np.floor(q / VS)) <= 1, axis=-1
    )
    assert same_nbhd.mean() > 0.95
    # stored points are quantized at VS/1024 per axis -> distances can
    # shift by up to sqrt(3)/2048 * VS vs brute force on the originals
    agree = np.isclose(np.sqrt(d2[same_nbhd]), bd[same_nbhd],
                       atol=2e-3 * VS)
    assert agree.all()
    # approximate (rep-ranked) query: errors bounded by the voxel diagonal
    res_a = hashmap.query(m, jnp.asarray(q), voxel_size=VS)
    assert np.asarray(res_a.found).all()
    gap = np.sqrt(np.asarray(res_a.d2)) - np.sqrt(d2)
    assert (gap >= -1e-5).all()  # approx can never beat exact
    assert np.quantile(gap, 0.95) < VS  # and is rarely much worse


def test_query_not_found_far_away():
    m = make_map()
    pts = RNG.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    m = hashmap.insert(m, jnp.asarray(pts), jnp.ones(100, bool), voxel_size=VS)
    q = np.array([[100.0, 100.0, 100.0]], np.float32)
    res = hashmap.query(m, jnp.asarray(q), voxel_size=VS)
    assert not bool(res.found[0])


def test_remove_far_evicts():
    m = make_map()
    near = RNG.uniform(-5, 5, size=(50, 3)).astype(np.float32)
    far = RNG.uniform(95, 105, size=(50, 3)).astype(np.float32)
    m = hashmap.insert(
        m, jnp.asarray(np.vstack([near, far])), jnp.ones(100, bool), voxel_size=VS
    )
    m = hashmap.remove_far(m, jnp.zeros(3), jnp.asarray(50.0**2))
    assert int(hashmap.num_points(m)) == 50
    # all remaining are near points
    stored = np.asarray(hashmap.stored_points(m, VS)).reshape(-1, 3)
    cnt_mask = (
        np.arange(PPV)[None, :] < np.asarray(m.counts)[:, None]
    ).reshape(-1)
    assert (np.linalg.norm(stored[cnt_mask], axis=-1) < 50).all()
    # evicted slots are reusable
    assert int(hashmap.num_voxels(m)) == int((np.asarray(m.fps) != 0).sum())


def test_reinsert_after_eviction():
    m = make_map()
    pts = RNG.uniform(-5, 5, size=(50, 3)).astype(np.float32)
    m = hashmap.insert(m, jnp.asarray(pts), jnp.ones(50, bool), voxel_size=VS)
    m = hashmap.remove_far(m, jnp.zeros(3), jnp.asarray(0.01))
    assert int(hashmap.num_points(m)) == 0
    m = hashmap.insert(m, jnp.asarray(pts), jnp.ones(50, bool), voxel_size=VS)
    assert int(hashmap.num_points(m)) == 50
    res = hashmap.query(m, jnp.asarray(pts[:10]), voxel_size=VS)
    assert np.asarray(res.found).all()
    assert np.allclose(np.asarray(res.d2), 0.0, atol=1e-6)


def test_load_factor_contract():
    """Design contract: at the intended <=25% load factor, default probe
    depth resolves effectively all keys; higher load needs deeper probes."""
    pts = (RNG.permutation(40**3)[:2000]).astype(np.int64)
    coords = np.stack(np.unravel_index(pts, (40, 40, 40)), -1).astype(np.float32)
    coords = coords + 0.5

    m = hashmap.create(1 << 14, 4)  # 16384 slots, 12% load
    m = hashmap.insert(
        m, jnp.asarray(coords), jnp.ones(len(coords), bool), voxel_size=VS
    )
    assert int(hashmap.num_points(m)) >= 0.99 * len(coords)

    # 50% load still works with a deeper probe chain
    m2 = hashmap.create(1 << 12, 4)
    m2 = hashmap.insert(
        m2, jnp.asarray(coords), jnp.ones(len(coords), bool),
        voxel_size=VS, max_probes=16,
    )
    assert int(hashmap.num_points(m2)) >= 0.99 * len(coords)


def test_insert_deduped_matches_generic():
    """On an octant-unique batch, insert_deduped stores the same point set
    as the generic insert (order within a voxel may differ)."""
    rng = np.random.default_rng(7)
    pts = rng.uniform(-10, 10, (5000, 3)).astype(np.float32)
    keep = voxel.first_in_voxel_mask(
        jnp.asarray(pts), jnp.ones(5000, bool), 0.25, 1 << 16)
    m1 = hashmap.insert(hashmap.create(1 << 14, 8), jnp.asarray(pts), keep,
                        voxel_size=0.5, max_probes=2)
    m2 = hashmap.insert_deduped(hashmap.create(1 << 14, 8), jnp.asarray(pts),
                                keep, voxel_size=0.5, max_probes=2,
                                new_capacity=8192)
    assert int(hashmap.num_points(m1)) == int(hashmap.num_points(m2))
    assert int(hashmap.num_voxels(m1)) == int(hashmap.num_voxels(m2))

    def stored(m):
        meta = np.asarray(m.meta)
        p = np.asarray(hashmap.stored_points(m, 0.5))
        out = []
        for s in np.nonzero(meta[:, 1] > 0)[0]:
            for k in range(meta[s, 1]):
                out.append(tuple(np.round(p[s, k], 4)))
        return sorted(out)

    assert stored(m1) == stored(m2)


def test_insert_deduped_skips_present_octants():
    """Re-inserting the same frame adds nothing; eviction clears occupancy
    so octants can be refilled."""
    rng = np.random.default_rng(8)
    pts = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
    keep = voxel.first_in_voxel_mask(
        jnp.asarray(pts), jnp.ones(2000, bool), 0.25, 1 << 16)
    m = hashmap.insert_deduped(hashmap.create(1 << 13, 8), jnp.asarray(pts),
                               keep, voxel_size=0.5, max_probes=2)
    n1 = int(hashmap.num_points(m))
    assert n1 > 1000
    m2 = hashmap.insert_deduped(m, jnp.asarray(pts), keep,
                                voxel_size=0.5, max_probes=2)
    assert int(hashmap.num_points(m2)) == n1
    m3 = hashmap.remove_far(m2, jnp.asarray([100.0, 100.0, 100.0]),
                            jnp.asarray(1.0))
    assert int(hashmap.num_points(m3)) == 0
    m4 = hashmap.insert_deduped(m3, jnp.asarray(pts), keep,
                                voxel_size=0.5, max_probes=2)
    assert int(hashmap.num_points(m4)) == n1


def test_gather_rows_matches_flat_gather():
    """hashmap.gather_rows (the (flat/2, 2) index reshape) must be
    bit-identical to the plain row gather, including OOB fill, across
    the shapes the hot paths use."""
    rng = np.random.default_rng(11)
    table = jnp.asarray(
        rng.integers(-2**31, 2**31 - 1, (4096, 8), np.int64), jnp.int32)
    for shape in ((8192,), (2048, 7), (2048, 4), (33,), (4095,)):
        s = jnp.asarray(rng.integers(0, 5000, shape, np.int64), jnp.int32)
        got = hashmap.gather_rows(table, s)
        ref = table.at[s].get(mode="fill", fill_value=0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
