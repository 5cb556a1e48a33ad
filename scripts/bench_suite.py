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
from cuda.radixsort_tpu.utils.profiling import (DEFAULT_HBM,
                                                bitonic_sort_bytes,
                                                timed_chain, timed_calls)

SMALL = os.environ.get("BENCH_SCALE") == "small"
ONLY = os.environ.get("BENCH_ONLY")  # comma-separated config substrings

# Why two timing methods exist (VERDICT r3 weak #3): timed_chain (K
# data-dependent iterations inside ONE jit, differenced) is the trustworthy
# series through the axon tunnel, but a chained-fori wrapper around graphs
# that embed several Pallas sub-kernels (join/groupby/query) measured
# >30 min to compile remotely (NOTES r2). Those configs use timed_calls
# (per-call device_get sync, no-op sync overhead measured and SUBTRACTED)
# and say so in their output record via "method".
CHAIN = {"method": "timed_chain"}
CALLS = {"method": "timed_calls",
         "method_note": "chained-fori compile >30min through the remote-"
                        "compile tunnel for multi-Pallas-kernel graphs "
                        "(NOTES r2); no-op sync overhead subtracted"}


def wanted(name: str) -> bool:
    return ONLY is None or any(t in name for t in ONLY.split(","))


def report(name, n_rows, seconds, extra=None, ideal_bytes=None,
           actual_bytes=None):
    """One JSON line per config. ideal_bytes: the op's MINIMUM HBM traffic
    (inputs once in, outputs once out) -> sol_pct, the reference-style
    '% of speed-of-light' number (tuning_radix_sort.cuh:379 publishes the
    same per config). actual_bytes: traffic of the shipped pass structure
    -> hbm_frac, fraction of HBM bandwidth actually sustained
    (VERDICT r3 #5)."""
    rec = {"config": name, "rows": n_rows,
           "ms": round(seconds * 1e3, 2),
           "rows_per_s": round(n_rows / seconds, 0)}
    if ideal_bytes is not None:
        rec["sol_pct"] = round(100.0 * ideal_bytes / seconds / DEFAULT_HBM, 2)
    if actual_bytes is not None:
        rec["hbm_frac"] = round(actual_bytes / seconds / DEFAULT_HBM, 3)
    if extra:
        rec.update(extra)
    print(json.dumps(rec))


def _pad2(n: int) -> int:
    return 1 << max((n - 1).bit_length(), 1)


def join_bytes(nb: int, npr: int, n_cols: int = 3):
    """(ideal, actual) HBM bytes of the sort-coalesce join. Ideal: both
    sides in once, (key, val, idx) out once. Actual: the concat sort's
    pass structure over n_cols planes + ~10 scan/fill/compaction passes
    over one i32 column (cumsums, boundary compares, segmented fill,
    filter's scan + gathers — each a read+write)."""
    ntot = nb + npr
    ideal = 8 * (nb + npr) + 12 * npr
    actual = bitonic_sort_bytes(ntot, n_cols) + 10 * 8 * _pad2(ntot)
    return ideal, actual


def rot32(y):
    return (y >> jnp.uint32(7)) | (y << jnp.uint32(25))


def main():
    key = jax.random.PRNGKey(0)

    # 1. LSD sort of 16M u32 (the reference's own config)
    if wanted("sort_u32"):
        n = 1 << (20 if SMALL else 24)
        x = jax.random.bits(key, (n,), jnp.uint32)
        t = timed_chain(lambda v: rot32(rs.sort(v)), x, k=4)
        report("sort_u32_16M", n, t, CHAIN,
               ideal_bytes=8 * n, actual_bytes=bitonic_sort_bytes(n, 1))

    # 1b. trivial-pass skip on the radix engine (VERDICT r4 #4): 8-bit-
    #     entropy keys leave 6 of 8 stage histograms single-bucket; the
    #     lax.cond short-circuit takes the identity branch (CUB downsweep
    #     :672-741 parity). Measured r5: 106.2 -> 26.9 ms @2^24 (4.0x, entropy-preserving chain).
    if wanted("sort_low_entropy"):
        n = 1 << (20 if SMALL else 24)
        pal = rs.SortConfig(engine="pallas")
        xle = jax.random.bits(key, (n,), jnp.uint32) >> jnp.uint32(24)
        xfe = jax.random.bits(key, (n,), jnp.uint32)
        def low_entropy_step(v):
            # keep 8-bit entropy across chain iterations: remix the sorted
            # bytes through a multiplicative hash and take the top byte (a
            # plain rot32 collapses 8-bit values to ~1 bit and the chain
            # degenerates to the all-stages-skip extreme)
            y = rs.sort(v, config=pal)
            return (y * jnp.uint32(0x9E3779B1)) >> jnp.uint32(24)

        try:
            t_full = timed_chain(lambda v: rot32(rs.sort(v, config=pal)),
                                 xfe, k=2)
            t_low = timed_chain(low_entropy_step, xle, k=2)
            report("sort_low_entropy_8bit_radix", n, t_low, dict(
                CHAIN, full_entropy_ms=round(t_full * 1e3, 1),
                skip_speedup=round(t_full / t_low, 2)))
            del xle, xfe
        except Exception as e:
            print(json.dumps({"config": "sort_low_entropy_8bit_radix",
                              "error": str(e)[:120]}))

    # 2. u64-key + u32-payload stable pairs (contract: 256M; chip fits 64M
    #    through the limb pipeline with double buffering)
    n = 1 << (20 if SMALL else 25)
    hi = jax.random.bits(key, (n,), jnp.uint32)
    if not wanted("sort_pairs_u64"):
        hi = None

    # NOTE: every step derives its other inputs from the carried array —
    # closed-over device arrays are inlined as dense MLIR constants and
    # blow the remote-compile request limit (HTTP 413).
    def pairs_step(v):
        # u64 key expressed as (hi, lo) struct columns (x64-free)
        lo = v * jnp.uint32(2654435761)
        pay = jnp.arange(v.shape[0], dtype=jnp.int32)
        (ohi, olo), op = rs.sort_struct((v, lo), pay)
        return rot32(ohi ^ olo ^ op.astype(jnp.uint32))

    if hi is not None:
        try:
            t = timed_chain(pairs_step, hi, k=2)
            # sort_struct((hi, lo), pay) rides 4 planes (2 key limbs +
            # stability index + payload)
            report("sort_pairs_u64", n, t, CHAIN, ideal_bytes=32 * n,
                   actual_bytes=bitonic_sort_bytes(n, 4))
        except Exception as e:
            print(json.dumps({"config": "sort_pairs_u64", "error": str(e)[:120]}))

    # 2b. u32-key + u32-payload stable pairs at the largest count that fits
    #     one chip comfortably (2^27 = 134M pairs; 3-plane network)
    if wanted("sort_pairs_u32"):
        np_pairs = 1 << (20 if SMALL else 27)
        xp = jax.random.bits(key, (np_pairs,), jnp.uint32)

        def pairs32_step(v):
            pay = v * jnp.uint32(2654435761)
            ok_, ov_ = rs.sort_pairs(v, pay)
            return rot32(ok_ ^ ov_)

        try:
            t = timed_chain(pairs32_step, xp, k=2)
            report("sort_pairs_u32_134M", np_pairs, t, CHAIN,
                   ideal_bytes=16 * np_pairs,
                   actual_bytes=bitonic_sort_bytes(np_pairs, 3))
        except Exception as e:
            print(json.dumps({"config": "sort_pairs_u32_134M",
                              "error": str(e)[:120]}))

    # 2b2. thrust::sort_by_key parity (UNSTABLE — smart_sort's radix path
    #      does not promise equal-key payload order): the tie-safe 2-plane
    #      network, no idx tie-break plane (VERDICT r3 #3, NOTES r4)
    if wanted("sort_pairs_unstable"):
        npu = 1 << (20 if SMALL else 27)
        xu = jax.random.bits(key, (npu,), jnp.uint32)

        def pairs32_unstable_step(v):
            pay = v * jnp.uint32(2654435761)
            ok_, ov_ = rs.sort_pairs(v, pay, stable=False)
            return rot32(ok_ ^ ov_)

        try:
            t = timed_chain(pairs32_unstable_step, xu, k=2)
            report("sort_pairs_u32_unstable_134M", npu, t, CHAIN,
                   ideal_bytes=16 * npu,
                   actual_bytes=bitonic_sort_bytes(npu, 2))
        except Exception as e:
            print(json.dumps({"config": "sort_pairs_u32_unstable_134M",
                              "error": str(e)[:120]}))

    # 2c. the CONTRACT pairs size: 256M u64+payload pairs (BASELINE.json:8).
    #     4 u32 planes x 2^28 = 4 GB; in-place network passes make it fit.
    if wanted("sort_pairs_contract") and not SMALL:
        from cuda.radixsort_tpu.kernels.bitonic import sort_planes_bitonic

        nc = 1 << 28

        def pairs_contract_step(v):
            lo = v * jnp.uint32(2654435761)
            idx = jnp.arange(v.shape[0], dtype=jnp.uint32)
            pay = v ^ jnp.uint32(0x9E3779B9)
            a, b, c, d = sort_planes_bitonic([v, lo, idx, pay], n_cmp=3)
            return rot32(a ^ d)

        try:
            xc = jax.random.bits(key, (nc,), jnp.uint32)
            t = timed_chain(pairs_contract_step, xc, k=1)
            report("sort_pairs_u64_256M_contract", nc, t, CHAIN,
                   ideal_bytes=32 * nc,
                   actual_bytes=bitonic_sort_bytes(nc, 4))
            del xc
        except Exception as e:
            print(json.dumps({"config": "sort_pairs_u64_256M_contract",
                              "error": str(e)[:160]}))

    # 3. hash join (FK shape), single-chip slice of the 1B x 100M contract
    npr, nb = 1 << (18 if SMALL else 24), 1 << (15 if SMALL else 21)
    pk0 = jax.random.bits(key, (npr,), jnp.uint32) % jnp.uint32(nb)

    def join_step(p):
        b = jnp.arange(nb, dtype=jnp.uint32)  # build keys 0..nb-1
        bvals = b.astype(jnp.int32)
        ok, ov, oi, cnt = rs_join(b, bvals, p % jnp.uint32(nb), how="inner")
        fold = (jnp.sum(oi.astype(jnp.uint32)) ^ cnt.astype(jnp.uint32))
        return rot32(p ^ fold)

    if wanted("hash_join"):
        try:
            def join_fn(p):
                b = jnp.arange(nb, dtype=jnp.uint32)
                ok, ov, oi, cnt = rs_join(b, b.astype(jnp.int32),
                                          p % jnp.uint32(nb), how="inner")
                # fold over the outputs so the compaction MATERIALIZES —
                # returning cnt alone lets XLA elide it (r5 join_1b lesson)
                return (cnt.astype(jnp.uint32)
                        ^ jnp.sum(ok) ^ jnp.sum(ov.astype(jnp.uint32)))
            r = timed_calls(join_fn, (pk0,), m=4)
            ideal, actual = join_bytes(nb, npr)
            report("hash_join_fk", npr, r["seconds"],
                   {"build_rows": nb, **CALLS},
                   ideal_bytes=ideal, actual_bytes=actual)
        except Exception as e:
            print(json.dumps({"config": "hash_join_fk", "error": str(e)[:120]}))

    # 3b. the biggest single-chip join slice of the 1B x 100M contract
    #     (VERDICT r3 #4a): 2^27 probe x 2^24 build — the concat sort pads
    #     to 2^28 x 3 planes (3 GB), in-place passes keep it resident.
    if wanted("hash_join_big") and not SMALL:
        nbig_p, nbig_b = 1 << 27, 1 << 24
        try:
            pbig = jax.random.bits(jax.random.PRNGKey(3), (nbig_p,),
                                   jnp.uint32)

            def join_big_fn(p):
                b = jnp.arange(nbig_b, dtype=jnp.uint32)
                ok, ov, oi, cnt = rs_join(b, b.astype(jnp.int32),
                                          p % jnp.uint32(nbig_b),
                                          how="inner")
                return (cnt.astype(jnp.uint32)
                        ^ jnp.sum(ok) ^ jnp.sum(ov.astype(jnp.uint32)))
            r = timed_calls(join_big_fn, (pbig,), m=2)
            ideal, actual = join_bytes(nbig_b, nbig_p)
            report("hash_join_big_134Mx16M", nbig_p, r["seconds"],
                   {"build_rows": nbig_b, **CALLS},
                   ideal_bytes=ideal, actual_bytes=actual)
            del pbig
        except Exception as e:
            print(json.dumps({"config": "hash_join_big_134Mx16M",
                              "error": str(e)[:160]}))

    # 3c. the FULL contract shape (BASELINE.json:9): 1B probe x 100M build,
    #     out-of-core probe-chunked join (ops/external.py::join_external,
    #     build device-resident, probe streamed in 2^27 slices). Heavy
    #     (~10 min incl. compile) — run with BENCH_ONLY=join_1b.
    if ONLY is not None and wanted("join_1b") and not SMALL:
        from cuda.radixsort_tpu.ops.external import join_external

        nb1, np1 = 100_000_000, 1 << 30
        try:
            rng = np.random.default_rng(7)
            bk1 = rng.permutation(
                np.arange(1 << 27, dtype=np.uint32))[:nb1]
            bv1 = bk1.astype(np.int32)
            pk1 = rng.integers(0, 1 << 27, size=np1, dtype=np.int64).astype(
                np.uint32)
            t0 = time.perf_counter()
            total, chk = join_external(bk1, bv1, pk1, chunk=1 << 27,
                                       materialize=False)
            dt = time.perf_counter() - t0
            # ideal: inputs once in, count out. actual: per chunk, the
            # (100M + 2^27)-row concat sort (pads to 2^28 x 3 planes) +
            # scan/compaction passes — build re-sorted every chunk by
            # design (portioning trade).
            ideal = 8 * (nb1 + np1)
            nchunks = (np1 + (1 << 27) - 1) >> 27
            actual = nchunks * (bitonic_sort_bytes(1 << 28, 3)
                                + 10 * 8 * (1 << 28))
            report("join_1b_contract_1Bx100M", np1, dt,
                   {"build_rows": nb1, "matched": int(total),
                    "checksum": int(chk),
                    "method": "wall_clock_end_to_end",
                    "method_note": "8 probe chunks of 2^27; count+checksum "
                                   "returned per chunk (no result "
                                   "materialization)"},
                   ideal_bytes=ideal, actual_bytes=actual)
        except Exception as e:
            print(json.dumps({"config": "join_1b_contract_1Bx100M",
                              "error": str(e)[:160]}))

    # 3c2. the same contract shape with the 1B probe DEVICE-RESIDENT:
    #      join_1b above streams host numpy through the axon tunnel, whose
    #      ~7 MB/s H2D link dominates wall time (measured 662 s for a join
    #      whose compute is seconds — hbm_frac 0.003). On pod hardware the
    #      probe arrives over ICI/DCN, not a dev-tunnel; this config prices
    #      the chip-side compute path: same join_external code, same 8x2^27
    #      chunk loop, probe generated in HBM (4 GB, fits v5e's 16 GB).
    if ONLY is not None and wanted("join_1b_dev") and not SMALL:
        from cuda.radixsort_tpu.ops.join import join as _join_op

        nb1, np1, chunk1 = 100_000_000, 1 << 30, 1 << 27
        try:
            bk1 = jax.random.permutation(
                jax.random.PRNGKey(4),
                jnp.arange(1 << 27, dtype=jnp.uint32))[:nb1]
            bv1 = bk1.astype(jnp.int32)

            @jax.jit
            def join_chunk(bk_, bv_, seed):
                # probe chunk generated in HBM (a resident 4 GB probe +
                # the chunk working set OOMs the 16 GB chip)
                pk_ = (jax.random.bits(jax.random.fold_in(
                    jax.random.PRNGKey(7), seed), (chunk1,), jnp.uint32)
                    % jnp.uint32(1 << 27))
                ok, ov, oi, cnt = _join_op(bk_, bv_, pk_, how="inner")
                pos = jnp.arange(ok.shape[0], dtype=jnp.int32)
                live = pos < cnt
                fold = (jnp.sum(jnp.where(live, ok, 0), dtype=jnp.uint32)
                        ^ jnp.sum(jnp.where(live, ov, 0),
                                  dtype=jnp.int32).astype(jnp.uint32))
                return cnt, fold
            w0, w1 = join_chunk(bk1, bv1, jnp.uint32(99))
            int(w0), int(w1)  # warm via scalar fetch — NOT
            # jax.block_until_ready: through the axon tunnel that call
            # costs ~8.5 s of pure sync overhead per invocation (measured
            # r5: 9.58 s/chunk with it, 1.08 s without; NOTES), and it
            # does not even guarantee completion — device_get of the
            # values does.
            nchunks = np1 // chunk1
            total = 0
            chk = np.uint32(0)
            t0 = time.perf_counter()
            for s in range(nchunks):
                cnt, fold = join_chunk(bk1, bv1, jnp.uint32(s))
                total += int(cnt)
                chk ^= np.uint32(int(fold))
            dt = time.perf_counter() - t0
            ideal = 8 * (nb1 + np1)
            actual = nchunks * (bitonic_sort_bytes(1 << 28, 3)
                                + 10 * 8 * (1 << 28))
            report("join_1b_device_1Bx100M", np1, dt,
                   {"build_rows": nb1, "matched": int(total),
                    "checksum": int(chk),
                    "method": "wall_clock_end_to_end",
                    "method_note": "8 device-generated probe chunks of "
                                   "2^27 vs the resident build; count+"
                                   "checksum per chunk (the join_1b config "
                                   "streams host numpy instead and is "
                                   "bound by the dev-tunnel's ~7 MB/s H2D "
                                   "link, not the chip)"},
                   ideal_bytes=ideal, actual_bytes=actual)
            del bk1, bv1
        except Exception as e:
            print(json.dumps({"config": "join_1b_device_1Bx100M",
                              "error": str(e)[:160]}))

    # 3d. pow2-total join: build 2^24 + probe (2^27 - 2^24) concat to EXACTLY
    #     2^27 rows — zero padding, so the sort takes the bitonic 3-plane
    #     path with posflag as the tie-break comparand (r4: join gives
    #     sort_pairs unique_leading_payload=True; no idx plane). The
    #     padding-ratio gate sends ratio>=1.6 shapes (join_big's 1.78) to
    #     lax.sort instead — this config shows the network join ceiling.
    if wanted("hash_join_pow2") and not SMALL:
        nb2 = 1 << 24
        np2 = (1 << 27) - nb2
        try:
            pb2 = jax.random.bits(jax.random.PRNGKey(5), (np2,), jnp.uint32)

            def join_pow2_fn(p):
                b = jnp.arange(nb2, dtype=jnp.uint32)
                ok, ov, oi, cnt = rs_join(b, b.astype(jnp.int32),
                                          p % jnp.uint32(nb2), how="inner")
                return (cnt.astype(jnp.uint32)
                        ^ jnp.sum(ok) ^ jnp.sum(ov.astype(jnp.uint32)))
            r = timed_calls(join_pow2_fn, (pb2,), m=2)
            ideal, actual = join_bytes(nb2, np2)
            report("hash_join_pow2_118Mx16M", np2, r["seconds"],
                   {"build_rows": nb2, **CALLS},
                   ideal_bytes=ideal, actual_bytes=actual)
            del pb2
        except Exception as e:
            print(json.dumps({"config": "hash_join_pow2_118Mx16M",
                              "error": str(e)[:160]}))

    # 4b. pow2 groupby: 2^24 rows, no padding — the grouping sort takes the
    #     UNSTABLE tie-safe 2-plane network (aggregations are order-
    #     independent within groups; r4)
    if wanted("groupby_pow2") and not SMALL:
        n24 = 1 << 24
        try:
            k24 = jax.random.bits(jax.random.PRNGKey(6), (n24,),
                                  jnp.uint32) % jnp.uint32(100000)

            def gb24_fn(k_):
                vals = (k_ % jnp.uint32(199)).astype(jnp.int32) - 100
                return rs.groupby(k_, vals, agg="sum")[1]
            r = timed_calls(gb24_fn, (k24,), m=2)
            report("groupby_pow2_16M", n24, r["seconds"], CALLS,
                   ideal_bytes=8 * n24,
                   actual_bytes=bitonic_sort_bytes(n24, 2) + 6 * 8 * n24)
            del k24
        except Exception as e:
            print(json.dumps({"config": "groupby_pow2_16M",
                              "error": str(e)[:160]}))

    # 4. group-by sum over Zipf-skewed keys
    n = 1 << (18 if SMALL else 22)
    u = jax.random.uniform(key, (n,))
    zipf = jnp.where(u < 0.5, 0, (u * 100000).astype(jnp.uint32))

    def gb_step(k_):
        vals = (k_ % jnp.uint32(199)).astype(jnp.int32) - 100
        gk, gv, cnt = rs.groupby(k_, vals, agg="sum")
        fold = jnp.sum(gv.astype(jnp.uint32)) ^ cnt.astype(jnp.uint32)
        return rot32(k_ ^ fold)

    if wanted("groupby"):
        try:
            def gb_fn(k_):
                vals = (k_ % jnp.uint32(199)).astype(jnp.int32) - 100
                return rs.groupby(k_, vals, agg="sum")[1]
            r = timed_calls(gb_fn, (zipf,), m=4)
            report("groupby_zipf", n, r["seconds"], CALLS,
                   ideal_bytes=8 * n,
                   actual_bytes=bitonic_sort_bytes(n, 3) + 6 * 8 * n)
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

    if wanted("pipelined"):
        try:
            def q_fn(p):
                b = jnp.arange(nb, dtype=jnp.uint32)
                pvals = (p % jnp.uint32(1 << 20)).astype(jnp.int32)
                k2, pv2, bv2, cnt2, _st = filter_sort_join(
                    p % jnp.uint32(nb), pvals, b, b.astype(jnp.int32),
                    jnp.int32(1 << 19))
                # fold so the result columns MATERIALIZE (count-only
                # returns let XLA elide the final compaction)
                return (cnt2.astype(jnp.uint32) ^ jnp.sum(k2)
                        ^ jnp.sum(pv2.astype(jnp.uint32))
                        ^ jnp.sum(bv2.astype(jnp.uint32)))
            r = timed_calls(q_fn, (probe,), m=4)
            ideal, actual = join_bytes(nb, n)
            report("pipelined_query", n, r["seconds"], CALLS,
                   ideal_bytes=ideal + 8 * n,  # + the filter stage
                   actual_bytes=actual + 3 * 8 * n)
        except Exception as e:
            print(json.dumps({"config": "pipelined_query", "error": str(e)[:120]}))

    # 6. distributed operator stats (SURVEY §5 observability): run the
    #    exchange ops over whatever mesh exists (ndev==1 on the single chip;
    #    the CPU-8 harness exercises the real balance numbers) and print
    #    each op's ExchangeStats line.
    if wanted("dist_stats"):
        from cuda.radixsort_tpu.parallel import dsort, shuffle
        from cuda.radixsort_tpu.parallel.stats import describe

        ndev = len(jax.devices())
        mesh = dsort.make_mesh(ndev)
        n = ndev * (1 << (14 if SMALL else 18))
        rng = np.random.default_rng(2)
        keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
        keys[: n // 3] = 0xABCD1234  # skewed
        t0 = time.time()
        out, counts, st = dsort.sort_distributed(jnp.asarray(keys), mesh=mesh)
        int(jnp.sum(counts))  # force (block_until_ready: ~8.5 s tunnel tax)
        report("dist_sort_skewed", n, time.time() - t0,
               {"ndev": ndev, "stats": describe(st),
                "method_note": "observability demo on a mesh of ndev — the "
                               "wall time INCLUDES the cold remote compile "
                               "(not a throughput row; scaling numbers live "
                               "in the CPU-8 harness / --scaling)"})

        gk_, gv_, cnt_, cap_, gst = shuffle.groupby_distributed_sized(
            jnp.asarray(keys),
            jnp.asarray(rng.integers(-99, 99, size=n).astype(np.int32)),
            mesh=mesh, agg="sum")
        int(jnp.sum(cnt_))  # force
        report("dist_groupby_sized", n, 1e-9,
               {"ndev": ndev, "stats": describe(gst)})

        nb_, npr_ = ndev * 4096, n
        bk_ = rng.permutation(np.arange(2 * nb_, dtype=np.uint32))[:nb_]
        ok, ov, oi, jcnt, caps, jst = shuffle.join_distributed_sized(
            jnp.asarray(bk_),
            jnp.asarray(rng.integers(0, 2**31, size=nb_).astype(np.int32)),
            jnp.asarray(rng.choice(np.arange(2 * nb_, dtype=np.uint32),
                                   size=npr_)),
            mesh=mesh)
        int(jnp.sum(jcnt))  # force
        report("dist_join_hash_sized", npr_, 1e-9,
               {"ndev": ndev, "caps": list(caps), "stats": describe(jst)})

    # 7. session-5 operator surfaces: scan-by-key, window, outer join,
    #    group quantiles — chained-differential timings on the chip.
    if wanted("scan_by_key"):
        from cuda.radixsort_tpu.ops.scan import scan_by_key

        n = 1 << (20 if SMALL else 24)
        sk_keys = (jax.random.bits(key, (n,), jnp.uint32)
                   % jnp.uint32(1 << 12))
        try:
            def sbk_step(k_):
                v = (k_ % jnp.uint32(97)).astype(jnp.int32)
                return rot32(k_ ^ scan_by_key(k_, v).astype(jnp.uint32))
            t = timed_chain(sbk_step, sk_keys, k=4)
            # the kernel reads (key-run flags fused) vals once, writes once
            report("scan_by_key_16M", n, t, CHAIN, ideal_bytes=12 * n,
                   actual_bytes=16 * n)
        except Exception as e:
            print(json.dumps({"config": "scan_by_key_16M",
                              "error": str(e)[:120]}))

    if wanted("window"):
        from cuda.radixsort_tpu.ops.window import window as window_op

        n = 1 << (18 if SMALL else 22)
        wkeys = jax.random.bits(key, (n,), jnp.uint32)
        try:
            def w_step(k_):
                p = k_ % jnp.uint32(1 << 10)
                o = k_ % jnp.uint32(1 << 20)
                v = (k_ % jnp.uint32(99)).astype(jnp.int32)
                sp, so, sv, wc, cnt = window_op(
                    p, o, {"v": v},
                    (("rn", None, "row_number"), ("cs", "v", "cumsum")))
                return rot32(k_ ^ wc["rn"].astype(jnp.uint32))

            # per-stage split (VERDICT r3 #9): the same struct sort ALONE,
            # so the scan/rank share is visible — post-scan-kernel it
            # should be near zero (the sort is the remaining cost)
            def w_sort_only(k_):
                from cuda.radixsort_tpu.ops.sort import sort_struct
                p = k_ % jnp.uint32(1 << 10)
                o = k_ % jnp.uint32(1 << 20)
                v = (k_ % jnp.uint32(99)).astype(jnp.int32)
                flag = jnp.zeros((k_.shape[0],), jnp.uint8)
                (sf, sp, so), sv = sort_struct((flag, p, o), {"v": v})
                return rot32(k_ ^ sp)
            t = timed_chain(w_step, wkeys, k=4)
            t_sort = timed_chain(w_sort_only, wkeys, k=4)
            report("window_rn_cumsum_4M", n, t,
                   {"sort_ms": round(t_sort * 1e3, 2),
                    "scan_rank_ms": round((t - t_sort) * 1e3, 2), **CHAIN},
                   ideal_bytes=20 * n)
        except Exception as e:
            print(json.dumps({"config": "window_rn_cumsum_4M",
                              "error": str(e)[:120]}))

    if wanted("outer_join"):
        n = 1 << (18 if SMALL else 22)
        nb2 = 1 << (14 if SMALL else 20)
        pk2 = jax.random.bits(key, (n,), jnp.uint32) % jnp.uint32(2 * nb2)
        try:
            def oj_step(p):
                b = jnp.arange(nb2, dtype=jnp.uint32)
                ok_, ov_, oi_, cnt_, om_ = rs_join(
                    b, b.astype(jnp.int32), p % jnp.uint32(2 * nb2),
                    how="full")
                fold = (cnt_.astype(jnp.uint32) ^ jnp.sum(ok_)
                        ^ jnp.sum(ov_.astype(jnp.uint32))
                        ^ jnp.sum(om_.astype(jnp.uint32)))
                return rot32(p ^ fold)
            t = timed_chain(oj_step, pk2, k=4)
            ideal, actual = join_bytes(nb2, n)
            report("full_outer_join_4Mx1M", n, t, CHAIN,
                   ideal_bytes=ideal, actual_bytes=actual + 4 * 8 * n)
        except Exception as e:
            print(json.dumps({"config": "full_outer_join_4Mx1M",
                              "error": str(e)[:120]}))

    if wanted("quantile"):
        from cuda.radixsort_tpu.ops.aggregate import groupby_quantile

        n = 1 << (18 if SMALL else 22)
        qk2 = jax.random.bits(key, (n,), jnp.uint32) % jnp.uint32(1 << 12)
        try:
            def quant_step(k_):
                v = (k_ * jnp.uint32(2654435761)).astype(jnp.int32)
                gk_, qs_, cnt_ = groupby_quantile(k_, v, (0.25, 0.5, 0.9))
                fold = cnt_.astype(jnp.uint32) ^ jnp.sum(gk_)
                for q_ in jax.tree_util.tree_leaves(qs_):
                    fold = fold ^ jnp.sum(q_.astype(jnp.uint32))
                return rot32(k_ ^ fold)
            t = timed_chain(quant_step, qk2, k=4)
            # histogram-refinement path: ~5 passes over (key, val)
            report("groupby_quantile_4M", n, t, CHAIN,
                   ideal_bytes=8 * n, actual_bytes=5 * 8 * n)
        except Exception as e:
            print(json.dumps({"config": "groupby_quantile_4M",
                              "error": str(e)[:120]}))


def scaling():
    """Scaling-efficiency harness (BASELINE.json:5: >=80% rows/s scaling
    1 chip -> 1 host -> N hosts). WEAK scaling: per-device rows fixed, the
    flagship distributed pipeline (filter->sort->join) and the distributed
    sort run at mesh sizes {1, device_count}; efficiency =
    rate(N) / (N * rate(1)).

    On the CPU-8 virtual mesh this is a harness smoke test (virtual
    devices share one socket — numbers are meaningless); on a pod slice it
    is the contract measurement. Pod invocation (README):
        python scripts/bench_suite.py --scaling
    """
    from cuda.radixsort_tpu.parallel.dsort import make_mesh, sort_distributed
    from cuda.radixsort_tpu.pipeline.query import (
        filter_sort_join_distributed,
    )

    ndev_max = len(jax.devices())
    rows_per_dev = 1 << (14 if (SMALL or ndev_max == 1
                                or jax.default_backend() != "tpu") else 22)
    nb = 1 << 10  # small build: broadcast route; probe side scales
    meshes = sorted({1, ndev_max})
    rng = np.random.default_rng(0)
    base_rate = {}
    for ndev in meshes:
        mesh = make_mesh(ndev)
        n = ndev * rows_per_dev
        pk = jnp.asarray(rng.integers(0, 2 * nb, size=n).astype(np.uint32))
        pv = jnp.asarray(rng.integers(0, 1000, size=n).astype(np.int32))
        bk = jnp.asarray(np.arange(nb, dtype=np.uint32))
        bv = jnp.asarray(rng.integers(0, 50, size=nb).astype(np.int32))

        def run_pipeline():
            out = filter_sort_join_distributed(
                pk, pv, bk, bv, jnp.int32(500), mesh=mesh)
            jax.block_until_ready(out)

        def run_sort():
            out = sort_distributed(pk, mesh=mesh)
            jax.block_until_ready(out)

        for name, fn in (("pipeline", run_pipeline), ("sort", run_sort)):
            fn()  # compile
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                fn()
            dt = (time.perf_counter() - t0) / reps
            rate = n / dt
            eff = (rate / (ndev * base_rate[name])
                   if ndev > 1 and name in base_rate else 1.0)
            if ndev == 1:
                base_rate[name] = rate
            print(json.dumps({
                "config": f"scaling_{name}", "ndev": ndev, "rows": n,
                "ms": round(dt * 1e3, 2), "rows_per_s": round(rate, 0),
                "efficiency_vs_1chip": round(eff, 3), "bar": 0.8,
                "meets_bar": bool(eff >= 0.8) if ndev > 1 else None,
            }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
