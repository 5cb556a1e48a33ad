"""Bisect the join_1b_dev chunk cost (round 4).

A (100M build + 2^27 probe) inner-join chunk measured ~42 s on chip while
its concat sort alone should be ~1 s. Time each phase: concat sort via
sort_pairs (tag path), the join scans, the xla filter compaction.

  python experiments/probe_join_chunk.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cuda.radixsort_tpu.ops.join import join as _join
from cuda.radixsort_tpu.ops.sort import sort_pairs


def timeit(name, step, x, k=1):
    # chained timing — plain per-call block_until_ready under-measures
    # through the axon tunnel (NOTES r2; this probe's first version read
    # 0.2 ms for a 234M-row sort)
    from cuda.radixsort_tpu.utils.profiling import timed_chain

    dt = timed_chain(step, x, k=k)
    print(json.dumps({"phase": name, "ms": round(dt * 1e3, 1)}), flush=True)


def main():
    nb, npr = 100_000_000, 1 << 27
    bk = jax.random.permutation(
        jax.random.PRNGKey(4), jnp.arange(1 << 27, dtype=jnp.uint32))[:nb]
    bv = bk.astype(jnp.int32)

    @jax.jit
    def gen(seed):
        return (jax.random.bits(jax.random.fold_in(
            jax.random.PRNGKey(7), seed), (npr,), jnp.uint32)
            % jnp.uint32(1 << 27))

    pk = jax.block_until_ready(gen(jnp.uint32(0)))

    ntot = nb + npr

    def rot(y):
        return (y >> jnp.uint32(7)) | (y << jnp.uint32(25))

    def phase_sort(pk_):
        keys = jnp.concatenate([bk, pk_])
        vals = jnp.concatenate([bv, jnp.zeros((npr,), jnp.int32)])
        posflag = jnp.arange(ntot, dtype=jnp.uint32)
        sk, (sp, sv) = sort_pairs(keys, (posflag, vals),
                                  unique_leading_payload=True)
        fold = sk[0] ^ sk[-1] ^ sp[0] ^ sv[-1].astype(jnp.uint32)
        return rot(pk_ ^ fold)

    def phase_join(pk_):
        ok, ov, oi, cnt = _join(bk, bv, pk_, how="inner")
        pos = jnp.arange(ok.shape[0], dtype=jnp.int32)
        live = pos < cnt
        fold = (jnp.sum(jnp.where(live, ok, 0), dtype=jnp.uint32)
                ^ cnt.astype(jnp.uint32))
        return rot(pk_ ^ fold)

    timeit("concat_sort_234M", phase_sort, pk, k=1)
    timeit("full_join_chunk", phase_join, pk, k=1)


if __name__ == "__main__":
    main()
