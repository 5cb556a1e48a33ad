"""Probe 8: hybrid sort_large vs flat jnp.sort on the real TPU at large N.

sort_large has a host sync between phases, so chained-fori timing doesn't
apply; we time M sequential end-to-end calls, each synced by device_get of a
tiny reduction (the per-call host overhead is part of the product anyway).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cuda.radixsort_tpu.ops.sort import sort_large


def sync(x):
    return jax.device_get(jnp.sum(x[::65536].astype(jnp.uint64)))


def time_calls(fn, x, m=3):
    sync(fn(x))  # warm/compile
    t0 = time.perf_counter()
    acc = 0
    for _ in range(m):
        acc ^= int(sync(fn(x)))
    t1 = time.perf_counter()
    return (t1 - t0) / m, acc


def main():
    key = jax.random.PRNGKey(0)
    # correctness on hardware at 2^24
    x = jax.random.bits(key, (1 << 24,), jnp.uint32)
    for mb in (4, 8):
        got = np.asarray(sort_large(x, msd_bits=mb))
        want = np.sort(np.asarray(x))
        print(f"2^24 msd={mb} correct:", np.array_equal(got, want))

    for logn in (24, 26, 27):
        n = 1 << logn
        x = jax.random.bits(key, (n,), jnp.uint32)
        tf, _ = time_calls(lambda v: jnp.sort(v), x)
        print(f"2^{logn} flat: {tf*1e3:8.1f} ms  {n/tf/1e9:5.2f} G/s")
        for mb in (4, 8):
            th, _ = time_calls(lambda v, mb=mb: sort_large(v, msd_bits=mb), x)
            print(f"2^{logn} hyb{mb}: {th*1e3:8.1f} ms  {n/th/1e9:5.2f} G/s  "
                  f"({tf/th:4.2f}x)")


if __name__ == "__main__":
    main()
