"""Tests for voxel downsample + compaction."""
import numpy as np
import jax.numpy as jnp

from ptudes_tpu.ops import voxel

RNG = np.random.default_rng(0)
TABLE = 1 << 16


def test_first_in_voxel_keeps_one_per_voxel():
    # 3 points in voxel (0,0,0), 2 in (5,5,5), 1 in (-3,0,1)
    pts = np.array(
        [
            [0.1, 0.2, 0.3],
            [0.4, 0.4, 0.4],
            [0.9, 0.9, 0.9],
            [5.5, 5.5, 5.5],
            [5.1, 5.9, 5.2],
            [-2.5, 0.5, 1.5],
        ],
        np.float32,
    )
    mask = np.ones(6, bool)
    keep = np.asarray(
        voxel.first_in_voxel_mask(jnp.asarray(pts), jnp.asarray(mask), 1.0, TABLE)
    )
    assert keep.tolist() == [True, False, False, True, False, True]


def test_first_in_voxel_respects_mask():
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2]], np.float32)
    keep = np.asarray(
        voxel.first_in_voxel_mask(
            jnp.asarray(pts), jnp.asarray([False, True]), 1.0, TABLE
        )
    )
    # first point invalid -> second wins the voxel
    assert keep.tolist() == [False, True]


def test_downsample_random_counts_match_numpy():
    pts = RNG.uniform(-20, 20, size=(5000, 3)).astype(np.float32)
    mask = RNG.uniform(size=5000) < 0.8
    vs = 1.5
    out, out_mask = voxel.voxel_downsample(
        jnp.asarray(pts), jnp.asarray(mask), vs, 4096, TABLE
    )
    got = int(np.sum(out_mask))
    # numpy oracle: unique voxels among masked points
    vox = np.floor(pts[mask] / vs).astype(np.int64)
    expect = len({tuple(v) for v in vox})
    # collisions may only *drop* voxels, never add; expect <2% loss
    assert got <= expect
    assert got >= expect * 0.97
    # surviving points are unique per voxel
    got_vox = np.floor(np.asarray(out)[np.asarray(out_mask)] / vs).astype(np.int64)
    assert len({tuple(v) for v in got_vox}) == got


def test_compact_order_and_overflow():
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    mask = np.array([1, 0, 1, 1, 0, 1, 1, 1, 0, 1], bool)
    out, om = voxel.compact(jnp.asarray(pts), jnp.asarray(mask), 4)
    assert np.asarray(om).tolist() == [True] * 4
    assert np.allclose(np.asarray(out), pts[mask][:4])

    out, om = voxel.compact(jnp.asarray(pts), jnp.asarray(mask), 16)
    assert int(np.sum(om)) == 7
    assert np.allclose(np.asarray(out)[:7], pts[mask])


def test_compact_with_payload():
    pts = RNG.normal(size=(100, 3)).astype(np.float32)
    ts = RNG.uniform(size=100).astype(np.float32)
    mask = RNG.uniform(size=100) < 0.5
    out, outp, om = voxel.compact_with_payload(
        jnp.asarray(pts), jnp.asarray(ts), jnp.asarray(mask), 64
    )
    k = int(np.sum(mask))
    assert np.allclose(np.asarray(out)[:k], pts[mask])
    assert np.allclose(np.asarray(outp)[:k], ts[mask])


def test_range_clip():
    pts = np.array([[0.5, 0, 0], [3, 0, 0], [80, 0, 0]], np.float32)
    m = voxel.range_clip_mask(jnp.asarray(pts), jnp.ones(3, bool), 1.0, 70.0)
    assert np.asarray(m).tolist() == [False, True, False]


def test_first_in_voxel_sorted_matches_table_variant():
    pts = RNG.uniform(-10, 10, (2000, 3)).astype(np.float32)
    mask = RNG.random(2000) > 0.2
    # wide table: at 2^16 the table variant itself aliases ~20 voxels,
    # which the 31-bit sorted variant correctly keeps
    keep = np.asarray(voxel.first_in_voxel_mask(
        jnp.asarray(pts), jnp.asarray(mask), 0.5, 1 << 22))
    out, okeep = voxel.first_in_voxel_sorted(
        jnp.asarray(pts), jnp.asarray(mask), 0.5, 2048)
    a = pts[keep]
    b = np.asarray(out)[np.asarray(okeep)]
    # same point SET (sorted variant reorders by voxel hash)
    assert len(a) == len(b)
    av = a[np.lexsort(a.T)]
    bv = b[np.lexsort(b.T)]
    np.testing.assert_allclose(av, bv)


def test_first_in_voxel_sorted_overflow_keeps_unique_voxels():
    """Input wider than capacity: every unique voxel (up to capacity) must
    survive — a naive post-slice would silently drop valid points hiding
    behind sliced-away duplicate runs."""
    # 3000 valid points but only ~600 unique voxels; capacity 1024 < 3000
    base = RNG.integers(-5, 5, (600, 3)).astype(np.float32)
    pts = np.repeat(base, 5, axis=0) + RNG.uniform(0, 0.09, (3000, 3)) \
        .astype(np.float32)
    order = RNG.permutation(3000)
    pts = pts[order]
    mask = np.ones(3000, bool)
    out, keep = voxel.first_in_voxel_sorted(
        jnp.asarray(pts), jnp.asarray(mask), 0.1, 1024)
    kept = np.asarray(out)[np.asarray(keep)]
    uniq_in = len(np.unique(np.floor(pts / 0.1).astype(np.int64), axis=0))
    uniq_kept = len(np.unique(np.floor(kept / 0.1).astype(np.int64), axis=0))
    assert len(kept) == uniq_kept  # one point per voxel
    # all unique voxels survive (up to 31-bit hash aliasing, none expected
    # at this scale)
    assert uniq_kept == min(uniq_in, 1024)


def test_window_prededup_no_row_wrap():
    """A point in row 0 must never be deduped against a same-voxel point
    in the bottom rows (causally later in column-major sweep order)."""
    h, w = 8, 16
    pts = RNG.uniform(5, 10, (h * w, 3)).astype(np.float32)
    grid = pts.reshape(h, w, 3)
    # same voxel at (row 0, col 3) and (row 7, col 3): row 0 is first in
    # scan order within the column, so it must survive
    grid[0, 3] = [2.02, 2.02, 2.02]
    grid[7, 3] = [2.04, 2.04, 2.04]
    keep = np.asarray(voxel.window_prededup_mask(
        jnp.asarray(grid.reshape(-1, 3)), jnp.ones(h * w, bool), 0.5,
        (h, w), rows=4, cols=4)).reshape(h, w)
    assert keep[0, 3], "row-0 point deduped against row-wrapped later point"
