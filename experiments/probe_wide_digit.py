"""Price the wide-digit (8-bit, 256-bin) radix stage's binding term.

VERDICT r4 #2 asks for a 256-bin stage with run-DMA scatter targeting
<=300 ops/elem/pass. The run-DMA write needs each tile's rows COMPACTED
by digit in VMEM first (DMA moves contiguous runs; a tile's digit-d rows
are scattered). Compaction is ranking+permutation = at least a sort of
the tile by digit. The cheapest Mosaic-expressible tile compaction we
know is the bitonic tile sort on a PACKED (digit<<idx_bits | idx) plane
(8+16=24 bits at a 2^16 tile — one u32 comparand, unique, no tie planes)
with the key riding. This probe measures exactly that: the tile-sort
pass alone (1 HBM round trip + 136 in-VMEM stages) for 2 planes, i.e.
the LOWER BOUND cost of one 8-bit wide-digit pass before any of the
run-DMA machinery, bucket bases, or boundary handling is added.

Comparators (NOTES r3 ceiling): MXU byte-plane router 4-bit stage
~650 ops/elem/pass; full 1-plane network sort @2^24 = 8.6 ms = ~510
ops/elem total.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cuda.radixsort_tpu.kernels import bitonic as bk  # noqa: E402

LOGN = int(os.environ.get("PROBE_LOGN", 24))
LT = 16


def tile_pass(key_plane, shift):
    """One 8-bit wide-digit tile compaction: pack (digit, idx) -> tile sort
    with the key riding (n_cmp=1: packed plane is unique in-tile)."""
    n = key_plane.shape[0]
    nrows = n // bk.LANES
    rows_per_tile = 1 << (LT - bk.LOG_LANES)
    with jax.enable_x64(False):
        idx = jnp.arange(n, dtype=jnp.uint32) & jnp.uint32((1 << LT) - 1)
        digit = (key_plane >> jnp.uint32(shift)) & jnp.uint32(0xFF)
        packed = (digit << jnp.uint32(LT)) | idx
        xs = [packed.reshape(nrows, bk.LANES),
              key_plane.reshape(nrows, bk.LANES)]
        out = bk._as_list(bk._tile_call(
            functools.partial(bk._tile_sort_body, LT, 2, 1),
            2, nrows, rows_per_tile, False)(*xs))
    return out[1].reshape(-1)


def main():
    n = 1 << LOGN
    x = jax.random.bits(jax.random.PRNGKey(0), (n,), jnp.uint32)

    def step(v):
        y = tile_pass(v, 0)
        return (y >> jnp.uint32(7)) | (y << jnp.uint32(25))

    @jax.jit
    def run(v, k):
        return jax.lax.fori_loop(0, k, lambda i, v: step(v), v)

    _ = jax.device_get(jnp.sum(run(x, 1)[:1]))
    t0 = time.perf_counter()
    _ = jax.device_get(jnp.sum(run(x, 4)[:1]))
    t1 = time.perf_counter()
    _ = jax.device_get(jnp.sum(run(x, 12)[:1]))
    t2 = time.perf_counter()
    ms = ((t2 - t1) - (t1 - t0)) / 8 * 1000
    unit_us = n / (1024 * 0.94e9) * 1e6   # 1 op/elem in us (NOTES r3 UNIT)
    ops = ms * 1000 / unit_us
    print(f"8-bit tile compaction (packed digit|idx + key ride) @2^{LOGN}: "
          f"{ms:.2f} ms = {ops:.0f} ops/elem per pass")
    print(f"  -> u32 LSD needs 4 such passes = {4 * ms:.1f} ms "
          f"(+ run-DMA, bases, boundary) vs full network sort @2^24 8.6 ms")


if __name__ == "__main__":
    main()
