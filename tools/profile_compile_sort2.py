"""Fifth-level compile bisection: lax.sort compile-cost scaling in width,
operand count, stability — and whether identical sorts in ONE module are
deduped (decides the mitigation strategy for the ~70 s cold bench compile).

    PTUDES_COMPILE_CACHE=off python tools/profile_compile_sort2.py [name ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def clock(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.monotonic()
    low = jfn.lower(*args)
    t_low = time.monotonic() - t0
    t0 = time.monotonic()
    low.compile()
    t_comp = time.monotonic() - t0
    print(f"{name:36s} lower {t_low:6.1f}s  compile {t_comp:6.1f}s",
          flush=True)


def data(n, seed=0):
    rng = np.random.default_rng(seed)
    k = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    xyz = [jnp.asarray(rng.normal(size=n), jnp.float32) for _ in range(3)]
    return k, xyz


def main():
    want = set(sys.argv[1:])
    cases = {}

    for n in (4096, 32768, 131072):
        k, xyz = data(n)
        cases[f"sort4_stable_{n}"] = (
            lambda k, a, b, c: jax.lax.sort((k, a, b, c), num_keys=1,
                                            is_stable=True),
            (k, *xyz))
        cases[f"sort4_unstable_{n}"] = (
            lambda k, a, b, c: jax.lax.sort((k, a, b, c), num_keys=1,
                                            is_stable=False),
            (k, *xyz))

    k, xyz = data(32768)
    k2, xyz2 = data(32768, seed=1)

    def twice_same(k, a, b, c, k2, a2, b2, c2):
        r1 = jax.lax.sort((k, a, b, c), num_keys=1, is_stable=True)
        r2 = jax.lax.sort((k2, a2, b2, c2), num_keys=1, is_stable=True)
        return r1[1] + r2[1]

    cases["sort4_stable_32k_x2_one_module"] = (
        twice_same, (k, *xyz, k2, *xyz2))

    def perm_then_gather(k, a, b, c):
        # 2-operand sort of (key, iota), then one 3-col row gather
        n = k.shape[0]
        iota = jnp.arange(n, dtype=jnp.int32)
        _, perm = jax.lax.sort((k, iota), num_keys=1, is_stable=True)
        pts = jnp.stack([a, b, c], axis=1)
        return pts.at[perm].get(mode="fill", fill_value=0.0)

    cases["sort2_perm_gather_32k"] = (perm_then_gather, (k, *xyz))

    # runtime probe for the same two variants (after the compile clock,
    # cached executables): report median us
    unknown = want - set(cases)
    if unknown:
        sys.exit(f"unknown: {sorted(unknown)}; valid: {sorted(cases)}")
    for name, (fn, args) in cases.items():
        if want and name not in want:
            continue
        clock(name, fn, *args)
        jfn = jax.jit(fn)
        r = jfn(*args)
        jax.block_until_ready(r)
        times = []
        for _ in range(20):
            t0 = time.monotonic()
            jax.block_until_ready(jfn(*args))
            times.append(time.monotonic() - t0)
        print(f"    runtime p50 {sorted(times)[10]*1e6:8.0f} us", flush=True)


if __name__ == "__main__":
    main()
