"""Isolate one grouped-span trip's cost vs the HBM bandwidth floor.

A span trip moves N rows in + N rows out (8 B/elem at 1 plane); at 820 GB/s
the floor for 2^28 elems is 2*4*2^28/820e9 = 2.62 ms. NOTES r3 measured
~2x that (3.3 units/stage * 5 stages vs the ~1.95-unit floor). This probe
times the span pallas_call alone (chained, device_get-forced) across body
variants: flat DMA (g copies/plane/side) vs strided (1 copy/plane/side),
2 vs 3 scratch slots.

Usage: RS_SPAN_DMA=flat|strided RS_SPAN_SLOTS=2|3 python probe_span_dma.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cuda.radixsort_tpu.kernels import bitonic as bk  # noqa: E402

LOGN = int(os.environ.get("PROBE_LOGN", 28))
K = int(os.environ.get("PROBE_K", 8))


def main():
    n = 1 << LOGN
    x = jax.random.bits(jax.random.PRNGKey(0), (n,), jnp.uint32)
    k = LOGN  # top level: strides 2^(k-1)..2^lo
    spans = bk._plan_spans(k, bk.resolve_log_merge(LOGN, 1), 1)
    hi, lo, lb = spans[0]
    c = hi - lo + 1
    print(f"span: strides 2^{hi}..2^{lo}, log_block={lb}, c={c}, "
          f"mode={os.environ.get('RS_SPAN_DMA', 'strided')}, "
          f"slots={os.environ.get('RS_SPAN_SLOTS', 'auto')}")

    @jax.jit
    def trip(v, reps):
        def body(i, v):
            with jax.enable_x64(False):
                out = bk._cross_span_pallas(
                    [v.reshape(n // 128, 128)], k, hi, lo, 1, False,
                    log_block=lb)[0]
            return (out.reshape(-1) >> jnp.uint32(7)) | \
                   (out.reshape(-1) << jnp.uint32(25))
        return jax.lax.fori_loop(0, reps, body, v)

    _ = jax.device_get(jnp.sum(trip(x, 1)[:1]))
    t0 = time.perf_counter()
    _ = jax.device_get(jnp.sum(trip(x, K)[:1]))
    t1 = time.perf_counter()
    _ = jax.device_get(jnp.sum(trip(x, 3 * K)[:1]))
    t2 = time.perf_counter()
    ms = ((t2 - t1) - (t1 - t0)) / (2 * K) * 1000
    floor_ms = 2 * 4 * n / 820e9 * 1000
    print(f"trip: {ms:.3f} ms  (bandwidth floor {floor_ms:.3f} ms, "
          f"{100 * floor_ms / ms:.0f}% of SoL)")


if __name__ == "__main__":
    main()
