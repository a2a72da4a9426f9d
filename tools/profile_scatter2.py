"""Scatter index-shape probe: does the (flat/2, 2) index reshape that
speeds row GATHERS 2.6x (tools/exp_r5_insert.py) also speed scatters?

Covers the insert cascade's op shapes (ops/hashmap.py insert_deduped):
claim scatter-min, fps set, counts add, occupancy add, reps row set,
points 2D-coordinate set — at chunk width (2048) and frame width.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _device_watchdog  # noqa: E402

K = 100
CAP = 1 << 19


def timed(name, make_body, init):
    fn = jax.jit(lambda c: jax.lax.fori_loop(
        0, K, lambda i, c_: make_body(c_), init))

    def run():
        out = fn(init)
        np.asarray(jax.tree.leaves(out)[0].astype(jnp.float32)
                   if jax.tree.leaves(out)[0].ndim == 0
                   else jax.tree.leaves(out)[0][0, 0])

    run()
    best = np.inf
    for _ in range(3):
        t0 = time.monotonic()
        run()
        best = min(best, time.monotonic() - t0)
    print(f"{name:52s} {best / K * 1e6:9.1f} us", flush=True)


def main():
    _device_watchdog()
    rng = np.random.default_rng(0)
    col0 = jnp.zeros((CAP,), jnp.int32)
    tbl8 = jnp.zeros((CAP, 8), jnp.int32)

    def idx(n):
        return jnp.asarray(rng.integers(0, CAP, (n,), np.int64), jnp.int32)

    timed("floor: empty body", lambda c: (c[0] + 1, c[1]),
          (jnp.int32(0), col0))

    for n in (2048, 32768):
        s = idx(n)
        upd = jnp.asarray(rng.integers(0, 100, (n,), np.int64), jnp.int32)

        def set_flat(c, s=s, upd=upd):
            cnt, col = c
            col = col.at[(s + (cnt & 1)) % CAP].set(upd, mode="drop")
            return cnt + (col[0] & 1), col

        timed(f"col set   flat [{n}]", set_flat, (jnp.int32(0), col0))

        def set_2d(c, s=s, upd=upd):
            cnt, col = c
            s2 = ((s + (cnt & 1)) % CAP).reshape(-1, 2)
            col = col.at[s2].set(upd.reshape(-1, 2), mode="drop")
            return cnt + (col[0] & 1), col

        timed(f"col set   (n/2,2) [{n}]", set_2d, (jnp.int32(0), col0))

        def add_flat(c, s=s, upd=upd):
            cnt, col = c
            col = col.at[(s + (cnt & 1)) % CAP].add(upd, mode="drop")
            return cnt + (col[0] & 1), col

        timed(f"col add   flat [{n}]", add_flat, (jnp.int32(0), col0))

        def add_2d(c, s=s, upd=upd):
            cnt, col = c
            s2 = ((s + (cnt & 1)) % CAP).reshape(-1, 2)
            col = col.at[s2].add(upd.reshape(-1, 2), mode="drop")
            return cnt + (col[0] & 1), col

        timed(f"col add   (n/2,2) [{n}]", add_2d, (jnp.int32(0), col0))

        def min_flat(c, s=s, upd=upd):
            cnt, col = c
            col = col.at[(s + (cnt & 1)) % CAP].min(upd, mode="drop")
            return cnt + (col[0] & 1), col

        timed(f"col min   flat [{n}]", min_flat, (jnp.int32(0), col0))

        def min_2d(c, s=s, upd=upd):
            cnt, col = c
            s2 = ((s + (cnt & 1)) % CAP).reshape(-1, 2)
            col = col.at[s2].min(upd.reshape(-1, 2), mode="drop")
            return cnt + (col[0] & 1), col

        timed(f"col min   (n/2,2) [{n}]", min_2d, (jnp.int32(0), col0))

    # row scatter (reps 3-wide set) and 2D-coordinate element scatter
    n = 2048
    s = idx(n)
    upd3 = jnp.asarray(rng.integers(0, 100, (n, 3), np.int64), jnp.int32)
    pos = jnp.asarray(rng.integers(0, 8, (n,), np.int64), jnp.int32)
    upd1 = upd3[:, 0]

    def row_set_flat(c):
        cnt, t = c
        t = t.at[(s + (cnt & 1)) % CAP, 2:5].set(upd3, mode="drop")
        return cnt + (t[0, 0] & 1), t

    timed("rows[:,2:5] set flat [2048]", row_set_flat,
          (jnp.int32(0), tbl8))

    def row_set_2d(c):
        cnt, t = c
        s2 = ((s + (cnt & 1)) % CAP).reshape(-1, 2)
        t = t.at[s2, 2:5].set(upd3.reshape(-1, 2, 3), mode="drop")
        return cnt + (t[0, 0] & 1), t

    timed("rows[:,2:5] set (n/2,2) [2048]", row_set_2d,
          (jnp.int32(0), tbl8))

    def elem2d_flat(c):
        cnt, t = c
        t = t.at[(s + (cnt & 1)) % CAP, pos].set(upd1, mode="drop")
        return cnt + (t[0, 0] & 1), t

    timed("points (slot,pos) set flat [2048]", elem2d_flat,
          (jnp.int32(0), tbl8))

    def elem2d_2d(c):
        cnt, t = c
        s2 = ((s + (cnt & 1)) % CAP).reshape(-1, 2)
        t = t.at[s2, pos.reshape(-1, 2)].set(upd1.reshape(-1, 2),
                                             mode="drop")
        return cnt + (t[0, 0] & 1), t

    timed("points (slot,pos) set (n/2,2) [2048]", elem2d_2d,
          (jnp.int32(0), tbl8))


if __name__ == "__main__":
    main()
