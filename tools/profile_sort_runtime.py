"""Runtime A/B of the payload-sort vs (key,iota)-sort+gather formulations
at the pipeline's REAL shapes, on the live TPU — the sort refactor cut
cold compile 69.9 -> 39.7 s but cost ~7% throughput; find which site.

    python tools/profile_sort_runtime.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def bench(name, fn, *args):
    jfn = jax.jit(fn)
    jax.block_until_ready(jfn(*args))
    times = []
    for _ in range(30):
        t0 = time.monotonic()
        jax.block_until_ready(jfn(*args))
        times.append(time.monotonic() - t0)
    print(f"{name:44s} p50 {sorted(times)[15]*1e6:8.0f} us", flush=True)


def payload_sort(keys, cols):
    return jax.lax.sort(tuple(keys) + tuple(cols), num_keys=len(keys),
                        is_stable=True)[len(keys):]


def perm_gather(keys, pts, capacity):
    n = keys[0].shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    res = jax.lax.sort(tuple(keys) + (iota,), num_keys=len(keys),
                       is_stable=True)
    perm = res[-1][:capacity]
    return pts.at[perm].get(mode="fill", fill_value=0.0)


def main():
    rng = np.random.default_rng(0)
    for n, capacity, nkeys, npay in (
            (131072, 32768, 1, 3),   # window-survivor compact
            (32768, 32768, 2, 3),    # first_in_voxel_sorted fast path
            (32768, 4096, 1, 3),     # source compact (decimate)
            (32768, 4096, 1, 5),     # insert chunk compact_with_payload
    ):
        keys = [jnp.asarray(rng.integers(0, 2, n), jnp.int32)
                for _ in range(nkeys)]
        pts = jnp.asarray(rng.normal(size=(n, npay)), jnp.float32)
        cols = [pts[:, i] for i in range(npay)]
        bench(f"payload_sort n={n} k={nkeys} pay={npay}",
              lambda *a: payload_sort(a[:nkeys], a[nkeys:]), *keys, *cols)
        bench(f"perm_gather  n={n} k={nkeys} cap={capacity} pay={npay}",
              lambda *a: perm_gather(a[:nkeys], a[nkeys], capacity),
              *keys, pts)


if __name__ == "__main__":
    main()
