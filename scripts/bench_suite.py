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

    # NOTE: every step derives its other inputs from the carried array —
    # closed-over device arrays are inlined as dense MLIR constants and
    # blow the remote-compile request limit (HTTP 413).
    def pairs_step(v):
        # u64 key expressed as (hi, lo) struct columns (x64-free)
        lo = v * jnp.uint32(2654435761)
        pay = jnp.arange(v.shape[0], dtype=jnp.int32)
        (ohi, olo), op = rs.sort_struct((v, lo), pay)
        return rot32(ohi ^ olo ^ op.astype(jnp.uint32))

    try:
        t = timed_chain(pairs_step, hi, k=2)
        report("sort_pairs_u64", n, t)
    except Exception as e:
        print(json.dumps({"config": "sort_pairs_u64", "error": str(e)[:120]}))

    # 3. hash join (FK shape), single-chip slice of the 1B x 100M contract
    npr, nb = 1 << (18 if SMALL else 22), 1 << (15 if SMALL else 19)
    pk0 = jax.random.bits(key, (npr,), jnp.uint32) % jnp.uint32(nb)

    def join_step(p):
        b = jnp.arange(nb, dtype=jnp.uint32)  # build keys 0..nb-1
        bvals = b.astype(jnp.int32)
        ok, ov, oi, cnt = rs_join(b, bvals, p % jnp.uint32(nb), how="inner")
        fold = (jnp.sum(oi.astype(jnp.uint32)) ^ cnt.astype(jnp.uint32))
        return rot32(p ^ fold)

    try:
        t = timed_chain(join_step, pk0, k=2)
        report("hash_join_fk", npr, t, {"build_rows": nb})
    except Exception as e:
        print(json.dumps({"config": "hash_join_fk", "error": str(e)[:120]}))

    # 4. group-by sum over Zipf-skewed keys
    n = 1 << (18 if SMALL else 22)
    u = jax.random.uniform(key, (n,))
    zipf = jnp.where(u < 0.5, 0, (u * 100000).astype(jnp.uint32))

    def gb_step(k_):
        vals = (k_ % jnp.uint32(199)).astype(jnp.int32) - 100
        gk, gv, cnt = rs.groupby(k_, vals, agg="sum")
        fold = jnp.sum(gv.astype(jnp.uint32)) ^ cnt.astype(jnp.uint32)
        return rot32(k_ ^ fold)

    try:
        t = timed_chain(gb_step, zipf, k=2)
        report("groupby_zipf", n, t)
    except Exception as e:
        print(json.dumps({"config": "groupby_zipf", "error": str(e)[:120]}))

    # 5. filter -> sort -> join pipelined query (single-chip; the N-host
    #    variant runs in tests/test_query.py on the CPU-8 mesh)
    from cuda.radixsort_tpu.pipeline.query import filter_sort_join

    n = 1 << (18 if SMALL else 22)
    probe = jax.random.bits(key, (n,), jnp.uint32) % jnp.uint32(nb)

    def q_step(p):
        b = jnp.arange(nb, dtype=jnp.uint32)
        bvals = b.astype(jnp.int32)
        pvals = (p % jnp.uint32(1 << 20)).astype(jnp.int32)
        k2, pv2, bv2, cnt2, stats = filter_sort_join(
            p % jnp.uint32(nb), pvals, b, bvals, jnp.int32(1 << 19))
        return rot32(p ^ cnt2.astype(jnp.uint32))

    try:
        t = timed_chain(q_step, probe, k=2)
        report("pipelined_query", n, t)
    except Exception as e:
        print(json.dumps({"config": "pipelined_query", "error": str(e)[:120]}))


if __name__ == "__main__":
    main()
