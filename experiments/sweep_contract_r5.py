"""256M u64+payload contract sweep, round 5: log_merge x span width x slots.

r2 noted lm=20 at 3+ planes OOMed scoped VMEM; the r3 span/merge bodies
changed the VMEM picture (lm=22 at 1 plane now compiles), so re-test
lm=20/21 at 4 planes, and the narrower-span-deeper-buffer point (c=4 with
3 slots = 48 MB scratch, under the 64 MiB line).

Usage: PROBE_LM=20 RS_SPAN_CMAX=5 RS_SPAN_SLOTS=2 python sweep_contract_r5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cuda.radixsort_tpu.kernels.bitonic import sort_planes_bitonic  # noqa: E402


def main():
    lm = os.environ.get("PROBE_LM")
    lm = int(lm) if lm else None
    nc = 1 << int(os.environ.get("PROBE_LOGN", 28))
    xc = jax.random.bits(jax.random.PRNGKey(7), (nc,), jnp.uint32)

    def step(v):
        lo = v * jnp.uint32(2654435761)
        idx = jnp.arange(v.shape[0], dtype=jnp.uint32)
        pay = v ^ jnp.uint32(0x9E3779B9)
        a, b, c, d = sort_planes_bitonic([v, lo, idx, pay], n_cmp=3,
                                         log_merge=lm)
        y = a ^ d
        return (y >> jnp.uint32(7)) | (y << jnp.uint32(25))

    @jax.jit
    def run(v, k):
        return jax.lax.fori_loop(0, k, lambda i, v: step(v), v)

    t = time.perf_counter()
    _ = jax.device_get(jnp.sum(run(xc, 1)[:1]))
    print(f"compile+1: {time.perf_counter() - t:.0f}s", flush=True)
    t0 = time.perf_counter()
    _ = jax.device_get(jnp.sum(run(xc, 1)[:1]))
    t1 = time.perf_counter()
    _ = jax.device_get(jnp.sum(run(xc, 3)[:1]))
    t2 = time.perf_counter()
    ms = ((t2 - t1) - (t1 - t0)) / 2 * 1000
    print(f"contract lm={lm} cmax={os.environ.get('RS_SPAN_CMAX', 'def')} "
          f"slots={os.environ.get('RS_SPAN_SLOTS', 'auto')} "
          f"lb={os.environ.get('RS_SPAN_LOG_BLOCK', 'def')}: {ms:.1f} ms "
          f"({nc / ms * 1e3 / 1e6:.0f} M pairs/s)")


if __name__ == "__main__":
    main()
