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
