"""Second-level compile-time bisection: which op INSIDE the map insert
is the XLA compile hog (profile_compile.py isolated insert+evict at
~40 s of the ~95 s total cold compile).

Each candidate op compiles standalone at bench shapes (map capacity
2^19, chunk 4096, frame 32768). Run on the live TPU backend:

    PTUDES_COMPILE_CACHE=off python tools/profile_compile_insert.py [name ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

CAP = 1 << 19
PPV = 8
CHUNK = 4096
FRAME = 32768


def clock(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.monotonic()
    low = jfn.lower(*args)
    t_low = time.monotonic() - t0
    t0 = time.monotonic()
    low.compile()
    t_comp = time.monotonic() - t0
    print(f"{name:34s} lower {t_low:6.1f}s  compile {t_comp:6.1f}s",
          flush=True)


def main():
    want = set(sys.argv[1:])
    rng = np.random.default_rng(0)
    meta = jnp.zeros((CAP, 8), jnp.int32)
    points = jnp.zeros((CAP, PPV), jnp.int32)
    fps = meta[:, 0]
    counts = meta[:, 1]
    pts_c = jnp.asarray(rng.normal(size=(CHUNK, 3)), jnp.float32)
    pts_f = jnp.asarray(rng.normal(size=(FRAME, 3)), jnp.float32)
    slot_c = jnp.asarray(rng.integers(0, CAP, CHUNK), jnp.int32)
    slot_f = jnp.asarray(rng.integers(0, CAP, FRAME), jnp.int32)
    wp_c = jnp.asarray(rng.integers(0, PPV, CHUNK), jnp.int32)
    val_c = jnp.asarray(rng.integers(0, 1 << 30, CHUNK), jnp.int32)
    mask_f = jnp.asarray(rng.random(FRAME) < 0.5)

    cases = {
        # phase A: 1-probe meta row gather at frame width
        "gatherA_meta_rows[32k,8]": (
            lambda m, s: m.at[s].get(mode="fill", fill_value=0),
            (meta, slot_f)),
        # claim round: scatter-min + row-set
        "claim_scatter_min[512k]<-4k": (
            lambda f, s, i: jnp.full((CAP,), np.int32(2**31 - 1), jnp.int32)
            .at[s].min(jnp.where(i > 0, i, np.int32(2**31 - 1)), mode="drop"),
            (fps, slot_c, val_c)),
        "fps_row_set[512k]<-4k": (
            lambda f, s, v: f.at[s].set(v, mode="drop"),
            (fps, slot_c, val_c)),
        # the 2D coordinate point-store scatter
        "points_2d_set[512k,8]<-4k": (
            lambda p, s, w, v: p.at[s, w].set(v, mode="drop"),
            (points, slot_c, wp_c, val_c)),
        "counts_add[512k]<-4k": (
            lambda c, s: c.at[s].add(1, mode="drop"),
            (counts, slot_c)),
        "reps_set[512k,3]<-4k": (
            lambda m, s, p: m[:, 2:5].at[s].set(
                jax.lax.bitcast_convert_type(p, jnp.int32), mode="drop"),
            (meta, slot_c, pts_c)),
        "evict_elementwise[512k,8]": (
            lambda m: jnp.where(
                (m[:, 1:2] > 0), m * jnp.asarray(
                    [0, 0, 1, 1, 1, 0, 1, 1], jnp.int32)[None, :], m),
            (meta,)),
        "cumsum_isnew[32k]": (
            lambda mk: jnp.cumsum(mk.astype(jnp.int32)) - 1, (mask_f,)),
    }

    # the real thing for reference, plus its pieces composed
    from ptudes_tpu.ops import hashmap

    m = hashmap.VoxelHashMap(meta=meta, points=points)
    cases["insert_deduped_cond(full)"] = (
        lambda mm, p, mk: hashmap.insert_deduped(
            mm, p, mk, voxel_size=0.3, max_probes=1, new_capacity=CHUNK,
            overflow="cond"),
        (m, pts_f, mask_f))
    cases["insert_deduped_nochunkloop"] = (
        lambda mm, p, mk: hashmap.insert_deduped(
            mm, p, mk, voxel_size=0.3, max_probes=1, new_capacity=CHUNK,
            overflow=False),
        (m, pts_f, mask_f))
    cases["insert_deduped_boot1chunk"] = (
        lambda mm, p, mk: hashmap.insert_deduped(
            mm, p, mk, voxel_size=0.3, max_probes=1, new_capacity=FRAME,
            overflow=True),
        (m, pts_f, mask_f))

    unknown = want - set(cases)
    if unknown:
        sys.exit(f"unknown: {sorted(unknown)}; valid: {sorted(cases)}")
    for name, (fn, args) in cases.items():
        if want and name not in want:
            continue
        clock(name, fn, *args)


if __name__ == "__main__":
    main()
