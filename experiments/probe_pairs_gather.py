"""Pairs-path alternatives probe (round 3).

Question: is a 2-plane (key, idx) network + ONE post-hoc payload gather
cheaper than trucking the payload plane through every compare-exchange
(the current 3-plane n_cmp=2 path, 531 M pairs/s @2^25)?

Measures on the attached chip via timed_chain (the only trustworthy
wall-clock through the axon tunnel):
  1. current 3-plane (key, idx, payload) n_cmp=2 @2^25
  2. 2-plane (key, idx) n_cmp=2 @2^25
  3. payload gather pay[idx] with a data-derived permutation @2^25
  4. payload scatter out.at[idx].set(pay) @2^25
2-plane+gather wins iff t2 + t3 < t1.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from cuda.radixsort_tpu.kernels.bitonic import sort_planes_bitonic
from cuda.radixsort_tpu.utils.profiling import timed_chain

N = 1 << 25


def rot(y):
    return (y >> jnp.uint32(7)) | (y << jnp.uint32(25))


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.bits(key, (N,), jnp.uint32)

    def three_plane(v):
        idx = jnp.arange(N, dtype=jnp.uint32)
        pay = v ^ jnp.uint32(0x9E3779B9)
        a, b, c = sort_planes_bitonic([v, idx, pay], n_cmp=2)
        return rot(a ^ c)

    def two_plane(v):
        idx = jnp.arange(N, dtype=jnp.uint32)
        a, b = sort_planes_bitonic([v, idx], n_cmp=2)
        return rot(a ^ b)

    def gather_pay(v):
        # data-derived pseudo-permutation (bit-reversal-ish index mix keeps
        # accesses random without needing a real sort first)
        idx = (v % jnp.uint32(N)).astype(jnp.int32)
        pay = v ^ jnp.uint32(0x9E3779B9)
        return rot(jnp.take(pay, idx, axis=0) ^ v)

    def scatter_pay(v):
        idx = (v % jnp.uint32(N)).astype(jnp.int32)
        pay = v ^ jnp.uint32(0x9E3779B9)
        return rot(jnp.zeros_like(pay).at[idx].set(
            pay, mode="drop", unique_indices=True) ^ v)

    for name, fn, k in [("three_plane_2^25", three_plane, 2),
                        ("two_plane_2^25", two_plane, 2),
                        ("gather_pay_2^25", gather_pay, 3),
                        ("scatter_pay_2^25", scatter_pay, 3)]:
        try:
            t = timed_chain(fn, x, k=k)
            print(f"{name}: {t*1e3:.2f} ms  ({N/t/1e6:.0f} M rows/s)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
