"""Unstable pairs probe (round 4, VERDICT r3 #3).

thrust::sort_by_key does not promise equal-key payload order (THRUST
sort.h smart_sort radix path), so the idx tie-break plane is pure tax for
that entry point. The tie-safe comparator (bitonic.py _cmpex_planes,
negative n_cmp) lets payloads ride under duplicate comparands:

  u32 key + u32 pay: 2 planes n_cmp=-1   (stable path: 3 planes n_cmp=2)
  u64 key + u32 pay: 3 planes n_cmp=-2   (stable path: 4 planes n_cmp=3)

Round-3 per-plane accounting (NOTES): idx COMPARE plane +27.9 ms @2^25,
payload RIDE plane +17.3 ms => projected 2-plane tie-safe ~36 ms = 930 M
pairs/s (stable 3-plane measured 63.8 ms = 526 M/s).

  python experiments/probe_unstable_pairs.py [logn]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cuda.radixsort_tpu.kernels.bitonic import sort_planes_bitonic
from cuda.radixsort_tpu.utils.profiling import timed_chain


def main(logn: int = 25) -> None:
    n = 1 << logn
    key = jax.random.PRNGKey(0)
    x = jax.random.bits(key, (n,), jnp.uint32)

    def rot(y):
        return (y >> jnp.uint32(7)) | (y << jnp.uint32(25))

    def report(name, step, k=2):
        t = timed_chain(step, x, k=k)
        print(json.dumps({
            "config": name, "n": n, "ms": round(t * 1e3, 2),
            "m_pairs_per_s": round(n / t / 1e6, 1),
        }), flush=True)

    def stable_u32(v):
        idx = jnp.arange(n, dtype=jnp.uint32)
        pay = v ^ jnp.uint32(0x9E3779B9)
        a, b, c = sort_planes_bitonic([v, idx, pay], n_cmp=2)
        return rot(a ^ c)

    def unstable_u32(v):
        pay = v ^ jnp.uint32(0x9E3779B9)
        a, c = sort_planes_bitonic([v, pay], n_cmp=-1)
        return rot(a ^ c)

    def stable_u64(v):
        lo = v * jnp.uint32(2654435761)
        idx = jnp.arange(n, dtype=jnp.uint32)
        pay = v ^ jnp.uint32(0x9E3779B9)
        a, b, c, d = sort_planes_bitonic([v, lo, idx, pay], n_cmp=3)
        return rot(a ^ d)

    def unstable_u64(v):
        lo = v * jnp.uint32(2654435761)
        pay = v ^ jnp.uint32(0x9E3779B9)
        a, b, c = sort_planes_bitonic([v, lo, pay], n_cmp=-2)
        return rot(a ^ c)

    report("stable_u32_3pl", stable_u32)
    report("unstable_u32_2pl", unstable_u32)
    report("stable_u64_4pl", stable_u64)
    report("unstable_u64_3pl", unstable_u64)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 25)
