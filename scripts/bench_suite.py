"""Benchmark the five BASELINE.json configs on the attached chip.

bench.py stays the driver's single-line headline; this script reports the
full contract surface (BASELINE.json:6-12), sized to the single attached
v5e where the stated configs assume a pod (1B-row joins need multi-chip
HBM; the distributed variants are validated on the CPU-8 mesh and
dry-run-compiled by the driver).

Run: python scripts/bench_suite.py  (optionally BENCH_SCALE=small)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cuda.radixsort_tpu as rs
from cuda.radixsort_tpu.ops.join import join as rs_join
from cuda.radixsort_tpu.utils.profiling import timed_chain

SMALL = os.environ.get("BENCH_SCALE") == "small"


def report(name, n_rows, seconds, extra=None):
    rec = {"config": name, "rows": n_rows,
           "ms": round(seconds * 1e3, 2),
           "rows_per_s": round(n_rows / seconds, 0)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec))


def rot32(y):
    return (y >> jnp.uint32(7)) | (y << jnp.uint32(25))


def main():
    key = jax.random.PRNGKey(0)

    # 1. LSD sort of 16M u32 (the reference's own config)
    n = 1 << (20 if SMALL else 24)
    x = jax.random.bits(key, (n,), jnp.uint32)
    t = timed_chain(lambda v: rot32(rs.sort(v)), x, k=4)
    report("sort_u32_16M", n, t)

    # 2. u64-key + u32-payload stable pairs (contract: 256M; chip fits 64M
    #    through the limb pipeline with double buffering)
    n = 1 << (20 if SMALL else 25)
    hi = jax.random.bits(key, (n,), jnp.uint32)
    lo = jax.random.bits(jax.random.PRNGKey(1), (n,), jnp.uint32)
    pay = jnp.arange(n, dtype=jnp.int32)

    def pairs_step(v):
        # u64 key expressed as (hi, lo) struct columns (x64-free)
        (ohi, olo), op = rs.sort_struct((v, lo), pay)
        return rot32(ohi ^ olo ^ op.astype(jnp.uint32))

    t = timed_chain(pairs_step, hi, k=2)
    report("sort_pairs_u64", n, t)

    # 3. hash join (FK shape), single-chip slice of the 1B x 100M contract
    npr, nb = 1 << (18 if SMALL else 24), 1 << (15 if SMALL else 21)
    bk = jax.random.bits(key, (nb,), jnp.uint32)
    bv = jnp.arange(nb, dtype=jnp.int32)
    pk = jnp.take(bk, jax.random.randint(key, (npr,), 0, nb))

    def join_step(p):
        ok, ov, oi, cnt = rs_join(bk, bv, p, how="inner")
        fold = (jnp.sum(oi.astype(jnp.uint32)) ^ cnt.astype(jnp.uint32))
        return rot32(p ^ fold)

    t = timed_chain(join_step, pk, k=2)
    report("hash_join_fk", npr, t, {"build_rows": nb})

    # 4. group-by sum over Zipf-skewed keys
    n = 1 << (18 if SMALL else 24)
    u = jax.random.uniform(key, (n,))
    zipf = jnp.where(u < 0.5, 0, (u * 100000).astype(jnp.uint32))
    vals = jax.random.randint(key, (n,), -100, 100, jnp.int32)

    def gb_step(k_):
        gk, gv, cnt = rs.groupby(k_, vals, agg="sum")
        fold = jnp.sum(gv.astype(jnp.uint32)) ^ cnt.astype(jnp.uint32)
        return rot32(k_ ^ fold)

    t = timed_chain(gb_step, zipf, k=2)
    report("groupby_zipf", n, t)

    # 5. filter -> sort -> join pipelined query (single-chip; the N-host
    #    variant runs in tests/test_query.py on the CPU-8 mesh)
    from cuda.radixsort_tpu.pipeline.query import filter_sort_join

    n = 1 << (18 if SMALL else 24)
    probe = jnp.take(bk, jax.random.randint(key, (n,), 0, nb))
    pvals = jax.random.randint(key, (n,), 0, 1 << 20, jnp.int32)

    def q_step(p):
        k2, pv2, bv2, cnt2, stats = filter_sort_join(
            p, pvals, bk, bv, jnp.int32(1 << 19))
        return rot32(p ^ cnt2.astype(jnp.uint32))

    try:
        t = timed_chain(q_step, probe, k=2)
        report("pipelined_query", n, t)
    except Exception as e:
        print(json.dumps({"config": "pipelined_query", "error": str(e)[:120]}))


if __name__ == "__main__":
    main()
