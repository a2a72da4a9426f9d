"""Fourth-level compile bisection: is the hog the multi-operand stable
sort itself, or its combination with the phase-A hash gather?

    PTUDES_COMPILE_CACHE=off python tools/profile_compile_sort.py [name ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N = 32768
CAP = 1 << 19


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
    keys = jnp.asarray(rng.integers(0, 2, N), jnp.int32)
    f32s = [jnp.asarray(rng.normal(size=N), jnp.float32) for _ in range(3)]
    i32s = [jnp.asarray(rng.integers(0, 1 << 20, N), jnp.int32)
            for _ in range(3)]
    meta = jnp.zeros((CAP, 8), jnp.int32)
    slots = jnp.asarray(rng.integers(0, CAP, N), jnp.int32)

    cases = {
        "sort1_stable_32k": (
            lambda k: jax.lax.sort((k,), num_keys=1, is_stable=True),
            (keys,)),
        "sort4_stable_32k": (
            lambda k, a, b, c: jax.lax.sort(
                (k, a, b, c), num_keys=1, is_stable=True),
            (keys, *f32s)),
        "sort7_stable_32k": (
            lambda k, a, b, c, d, e, f: jax.lax.sort(
                (k, a, b, c, d, e, f), num_keys=1, is_stable=True),
            (keys, *f32s, *i32s)),
        "sort7_unstable_32k": (
            lambda k, a, b, c, d, e, f: jax.lax.sort(
                (k, a, b, c, d, e, f), num_keys=1, is_stable=False),
            (keys, *f32s, *i32s)),
        "sort2keys5_stable_32k": (
            lambda k, a, b, c, d, e, f: jax.lax.sort(
                (k, f, a, b, c, d, e), num_keys=2, is_stable=True),
            (keys, *f32s, *i32s)),
        "gather_then_sort7": (
            lambda m, s, a, b, c, d, e, f: jax.lax.sort(
                ((m.at[s].get(mode="fill", fill_value=0)[:, 0] == 0)
                 .astype(jnp.int32), a, b, c, d, e, f),
                num_keys=1, is_stable=True),
            (meta, slots, *f32s, *i32s)),
        # packed alternative: ONE i32 key+payload pair via bit packing
        "sort2_packedkey_32k": (
            lambda k, f: jax.lax.sort(
                (k, f), num_keys=1, is_stable=True),
            (keys, i32s[0])),
    }
    unknown = want - set(cases)
    if unknown:
        sys.exit(f"unknown: {sorted(unknown)}; valid: {sorted(cases)}")
    for name, (fn, args) in cases.items():
        if want and name not in want:
            continue
        clock(name, fn, *args)


if __name__ == "__main__":
    main()
