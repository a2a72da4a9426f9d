"""Row-gather scaling probe: is the TPU gather cost per ROW or per OP?

profile_gather2 measured [2048x7]-row and [2048x4]-row gathers at ~240
and ~230 us — nearly equal despite 1.75x the rows, suggesting a large
fixed per-gather-op cost (latency chain), not the assumed ~5 ns/row
serialization. This probe sweeps row counts, table widths, and
dependent-vs-independent gather pairs to decide the round-5 redesign:
a combined meta+points table (ONE gather) vs overlapped independent
gathers.
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
    # carry is int32 and every body derives its indices from it AND folds
    # a gathered value back in — a real serial dependence XLA cannot
    # constant-fold away (profile_gather2's `c * 0` trick was folded,
    # hoisting the gathers and measuring only the loop-boundary floor)
    fn = jax.jit(lambda c: jax.lax.fori_loop(
        0, K, lambda i, c_: make_body(c_), init))

    def run():
        out = fn(init)
        np.asarray(jax.tree.leaves(out)[0].astype(jnp.float32))

    run()
    best = np.inf
    for _ in range(3):
        t0 = time.monotonic()
        run()
        best = min(best, time.monotonic() - t0)
    print(f"{name:46s} {best / K * 1e6:9.1f} us", flush=True)


def main():
    _device_watchdog()
    rng = np.random.default_rng(0)
    meta8 = jnp.asarray(rng.integers(0, 2**31, (CAP, 8), np.int64),
                        jnp.int32)
    meta16 = jnp.asarray(rng.integers(0, 2**31, (CAP, 16), np.int64),
                         jnp.int32)
    pts8 = jnp.asarray(rng.integers(0, 2**31, (CAP, 8), np.int64),
                       jnp.int32)

    def idx(n, j, seed):
        return jnp.asarray(
            rng.integers(0, CAP, (n, j), np.int64), jnp.int32)

    timed("floor: empty body (c + 1)", lambda c: c + 1,
          jnp.int32(0))

    for n, j in ((2048, 1), (2048, 2), (2048, 4), (2048, 7), (2048, 14),
                 (2048, 28), (8192, 7), (16384, 1), (32768, 1)):
        s = idx(n, j, 0)

        def body(c, s=s):
            rows = meta8.at[(s + (c & 1)) % CAP].get(
                mode="fill", fill_value=0)
            return c + (rows[0, 0, 0] & 1)

        timed(f"gather meta8  [{n}x{j}] rows", body, jnp.int32(0))

    s7 = idx(2048, 7, 1)

    def body16(c):
        rows = meta16.at[(s7 + (c & 1)) % CAP].get(
            mode="fill", fill_value=0)
        return c + (rows[0, 0, 0] & 1)

    timed("gather meta16 [2048x7] rows (64B rows)", body16,
          jnp.int32(0))

    s4 = idx(2048, 4, 2)

    def dep_chain(c):
        rows = meta8.at[(s7 + (c & 1)) % CAP].get(
            mode="fill", fill_value=0)
        # dependent second gather (slots derived from the first)
        sl = (rows[:, :4, 0] & (CAP - 1))
        p = pts8.at[sl].get(mode="fill", fill_value=0)
        return c + (p[0, 0, 0] & 1)

    timed("dependent: meta[2048x7] -> pts[2048x4]", dep_chain,
          jnp.int32(0))

    def indep_pair(c):
        z = c & 1
        rows = meta8.at[(s7 + z) % CAP].get(mode="fill", fill_value=0)
        p = pts8.at[(s4 + z) % CAP].get(mode="fill", fill_value=0)
        return c + (rows[0, 0, 0] & 1) + (p[0, 0, 0] & 1)

    timed("independent: meta[2048x7] + pts[2048x4]", indep_pair,
          jnp.int32(0))

    def indep_pair7(c):
        z = c & 1
        rows = meta8.at[(s7 + z) % CAP].get(mode="fill", fill_value=0)
        p = pts8.at[(s7 + z) % CAP].get(mode="fill", fill_value=0)
        return c + (rows[0, 0, 0] & 1) + (p[0, 0, 0] & 1)

    timed("independent: meta[2048x7] + pts[2048x7]", indep_pair7,
          jnp.int32(0))

    # element (single-int) gather vs row gather at the same index count
    col = meta8[:, 0]

    def elem_gather(c):
        v = col.at[(s7 + (c & 1)) % CAP].get(mode="fill", fill_value=0)
        return c + (v[0, 0] & 1)

    timed("element gather col[2048x7]", elem_gather, jnp.int32(0))


if __name__ == "__main__":
    main()
