"""Hardware verification battery — runs every check even when one fails.

Each check is a self-contained function returning True/False (or raising);
the runner catches per-check exceptions, prints a one-line verdict per
check, a final ``PASS k/n`` summary, and exits nonzero on any failure
(VERDICT r2 Next #8: a forced failure must produce a red summary line and
exit != 0, instead of a green-looking log with a buried traceback).
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cuda.radixsort_tpu as rs
from cuda.radixsort_tpu.utils.profiling import timed_chain

rng = np.random.default_rng(0)
P = rs.SortConfig(engine="pallas")

CHECKS = []


def check(fn):
    CHECKS.append((fn.__name__, fn))
    return fn


@check
def pallas_sort_small():
    n = 100_000
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    t0 = time.perf_counter()
    got = np.asarray(rs.sort(jnp.asarray(keys), config=P))
    print(f"  compile+run 100K: {time.perf_counter()-t0:.0f}s", flush=True)
    return np.array_equal(got, np.sort(keys))


@check
def pallas_pairs_small():
    n = 100_000
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    vals = np.arange(n, dtype=np.int32)
    gk, gv = rs.sort_pairs(jnp.asarray(keys), jnp.asarray(vals), config=P)
    perm = np.argsort(keys, kind="stable")
    return (np.array_equal(np.asarray(gk), keys[perm])
            and np.array_equal(np.asarray(gv), vals[perm]))


@check
def pallas_sort_16m_speed():
    n = 1 << 24
    keys = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    f = jax.jit(lambda x: rs.sort(x, config=P))
    dt = timed_chain(lambda x: f(x) ^ jnp.uint32(1), keys, k=4)
    print(f"  pallas full u32 sort @16M: {dt*1e3:.1f} ms  "
          f"{n/dt/1e9:.3f} Gkeys/s", flush=True)
    return True


@check
def bitonic_default_sort_16m():
    n = 1 << 24
    keys_h = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    keys = jnp.asarray(keys_h)
    got = np.asarray(rs.sort(keys))
    ok = np.array_equal(got, np.sort(keys_h))

    def _rot_sorted(v):
        y = rs.sort(v)
        return (y >> jnp.uint32(7)) | (y << jnp.uint32(25))

    dt = timed_chain(_rot_sorted, keys, k=4)
    print(f"  bitonic full u32 sort @16M: {dt*1e3:.1f} ms  "
          f"{n/dt/1e9:.3f} Gkeys/s", flush=True)

    perm = np.asarray(rs.argsort(keys[: 1 << 22]))
    ok &= np.array_equal(perm, np.argsort(keys_h[: 1 << 22], kind="stable"))
    return ok


@check
def filter_default():
    keys_h = rng.integers(0, 2**32, size=1 << 22, dtype=np.uint32)
    keys = jnp.asarray(keys_h)
    (fout,), cnt = rs.filter_columns(keys > jnp.uint32(1 << 31), (keys,))
    return np.array_equal(np.asarray(fout)[: int(cnt)],
                          keys_h[keys_h > (1 << 31)])


@check
def pairs_3plane_network_stable():
    n = 1 << 20
    k3 = rng.integers(0, 1 << 8, size=n).astype(np.uint32)  # dup-heavy
    v3 = np.arange(n, dtype=np.int32)
    gk, gv = rs.sort_pairs(jnp.asarray(k3), jnp.asarray(v3))
    perm = np.argsort(k3, kind="stable")
    return (np.array_equal(np.asarray(gk), k3[perm])
            and np.array_equal(np.asarray(gv), v3[perm]))


@check
def pairs_unstable_tie_safe():
    # r4: stable=False drops the idx plane (tie-safe comparator, negative
    # n_cmp). u32 = the k==1 neq shortcut; u64 = the k>=2 lex chain whose
    # interpret twin is a CPU-compile cliff — THIS is its bit-level check.
    n = 1 << 20
    ku = rng.integers(0, 1 << 6, size=n).astype(np.uint32)  # dup-heavy
    vu = np.arange(n, dtype=np.uint32)
    gk, gv = rs.sort_pairs(jnp.asarray(ku), jnp.asarray(vu), stable=False)
    gkn, gvn = np.asarray(gk), np.asarray(gv)
    ok_u32 = ((gkn[:-1] <= gkn[1:]).all()
              and np.array_equal(np.sort(gvn), vu)
              and np.array_equal(ku[gvn], gkn))
    # the k>=2 lex chain via explicit (hi, lo) planes — this environment
    # traces with x64 OFF, so jnp.asarray(np.uint64) would silently
    # truncate to u32 (the first version of this check did exactly that
    # and compared a u32 sort against a u64 oracle)
    from cuda.radixsort_tpu.kernels.bitonic import sort_planes_bitonic

    lo = rng.integers(0, 4, size=n).astype(np.uint32)
    ghi, glo, gpay = sort_planes_bitonic(
        [jnp.asarray(ku), jnp.asarray(lo), jnp.asarray(vu)], n_cmp=-2)
    hn, ln, pn = np.asarray(ghi), np.asarray(glo), np.asarray(gpay)
    key2 = (hn.astype(np.uint64) << np.uint64(32)) | ln
    want = (ku.astype(np.uint64) << np.uint64(32)) | lo
    ok_u64 = ((key2[:-1] <= key2[1:]).all()
              and np.array_equal(np.sort(pn), vu)
              and np.array_equal(want[pn], key2))
    return bool(ok_u32 and ok_u64)


@check
def filter_2bit_stage():
    from cuda.radixsort_tpu.ops.filter import filter_columns
    x = rng.integers(0, 2**32, size=1 << 20, dtype=np.uint32)
    (out_,), cnt_ = filter_columns(jnp.asarray(x) > jnp.uint32(1 << 31),
                                   (jnp.asarray(x),))
    return (int(cnt_) == int((x > (1 << 31)).sum())
            and np.array_equal(np.asarray(out_)[: int(cnt_)],
                               x[x > (1 << 31)]))


@check
def segmented_pairs():
    offs = jnp.asarray(np.linspace(0, 1 << 18, 65).astype(np.int32))
    ks = rng.integers(0, 2**32, size=1 << 18, dtype=np.uint32)
    vs = np.arange(1 << 18, dtype=np.int32)
    ok_, ov_ = rs.segmented_sort(jnp.asarray(ks), offs, jnp.asarray(vs))
    want_k = np.sort(ks.reshape(64, -1), axis=1).reshape(-1)
    return np.array_equal(np.asarray(ok_), want_k)


@check
def table_filter_groupby():
    t = rs.table(
        k=jnp.asarray(rng.integers(0, 1000, size=1 << 18).astype(np.uint32)),
        v=jnp.asarray(rng.integers(-99, 99, size=1 << 18).astype(np.int32)))
    f, fcnt = t.filter(t["v"] > 0)
    g, gcnt = t.groupby("k", "v", agg="sum")
    kk, vv = np.asarray(t["k"]), np.asarray(t["v"])
    return (int(fcnt) == int((vv > 0).sum())
            and int(gcnt) == len(np.unique(kk)))


@check
def comparator_network_struct():
    a4 = rng.integers(0, 6, size=1 << 14).astype(np.int32)
    b4 = rng.integers(0, 500, size=1 << 14).astype(np.int32)
    out4 = rs.comparator_sort(
        {"a": jnp.asarray(a4), "b": jnp.asarray(b4)},
        lambda x, y: (x["a"] > y["a"]) | ((x["a"] == y["a"])
                                          & (x["b"] < y["b"])))
    o4 = np.lexsort((b4, -a4))
    return (np.array_equal(np.asarray(out4["a"]), a4[o4])
            and np.array_equal(np.asarray(out4["b"]), b4[o4]))


@check
def thrust_sort_greater():
    from cuda.radixsort_tpu import thrust_compat as thrust
    x5 = rng.integers(0, 2**32, size=1 << 20, dtype=np.uint32)
    s5 = np.asarray(thrust.sort(jnp.asarray(x5), comp=thrust.greater))
    return np.array_equal(s5, np.sort(x5)[::-1])


@check
def bitonic_merge_level():
    am = np.sort(rng.integers(0, 2**32, size=1 << 21, dtype=np.uint32))
    bm = np.sort(rng.integers(0, 2**32, size=1 << 21, dtype=np.uint32))
    mm = np.asarray(rs.merge_sorted(jnp.asarray(am), jnp.asarray(bm)))
    return np.array_equal(mm, np.sort(np.concatenate([am, bm])))


@check
def run_length_encode():
    xr = np.repeat(rng.integers(0, 1000, size=4096).astype(np.uint32),
                   rng.integers(1, 9, size=4096))
    ukh, lenh, nrh = rs.run_length_encode(jnp.asarray(xr))
    starts_h = np.flatnonzero(np.concatenate([[True], xr[1:] != xr[:-1]]))
    return (int(nrh) == starts_h.shape[0]
            and np.array_equal(np.asarray(ukh)[: int(nrh)], xr[starts_h]))


@check
def query_plan_end_to_end():
    bld = rs.table(k=jnp.asarray(np.arange(64, dtype=np.uint32)),
                   p=jnp.asarray(rng.integers(0, 50, 64).astype(np.int32)))
    qk6 = rng.integers(0, 80, size=1 << 18, dtype=np.uint32)
    qv6 = rng.integers(0, 1000, size=1 << 18).astype(np.int32)
    out6, cnt6, _st6 = (rs.Query(rs.table(k=jnp.asarray(qk6),
                                          v=jnp.asarray(qv6)))
                        .where(lambda t: t["v"] > 400)
                        .join(bld, on="k", value="p")
                        .groupby("k", "v", agg="sum")
                        .order_by("v", descending=True)
                        .limit(5)).run()
    sel6 = qv6 > 400
    m6 = qk6 < 64
    agg6 = {}
    for kk6, vv6 in zip(qk6[sel6 & m6], qv6[sel6 & m6]):
        agg6[int(kk6)] = agg6.get(int(kk6), 0) + int(vv6)
    want6 = sorted(sorted(agg6.items()), key=lambda kv: -kv[1])[:5]
    got6 = list(zip(np.asarray(out6["k"])[: int(cnt6)].tolist(),
                    np.asarray(out6["v"])[: int(cnt6)].tolist()))
    return got6 == want6


@check
def device_topk():
    from cuda.radixsort_tpu.cub_compat import DeviceTopK
    x7 = rng.integers(0, 2**32, size=1 << 20, dtype=np.uint32)
    mx7 = np.asarray(DeviceTopK.MaxKeys(jnp.asarray(x7), 32))
    return np.array_equal(mx7, np.sort(x7)[::-1][:32])


@check
def scan_by_key_correct():
    from cuda.radixsort_tpu.ops.scan import scan_by_key
    k8 = np.sort(rng.integers(0, 500, size=1 << 20)).astype(np.uint32)
    v8 = rng.integers(-9, 9, size=1 << 20).astype(np.int32)
    s8 = np.asarray(scan_by_key(jnp.asarray(k8), jnp.asarray(v8)))
    starts8 = np.concatenate([[True], k8[1:] != k8[:-1]])
    seg8 = np.cumsum(starts8) - 1
    want8 = np.concatenate([np.cumsum(v8[seg8 == i])
                            for i in range(seg8[-1] + 1)])
    return np.array_equal(s8, want8)


@check
def window_row_number():
    p9 = rng.integers(0, 64, size=1 << 18).astype(np.uint32)
    o9 = rng.integers(0, 1000, size=1 << 18).astype(np.uint32)
    v9 = rng.integers(0, 9, size=1 << 18).astype(np.int32)
    t9 = rs.table(p=jnp.asarray(p9), o=jnp.asarray(o9), v=jnp.asarray(v9))
    t9w = t9.window("p", "o", {"rn": "row_number", "cs": ("v", "cumsum")})
    p9s, rn9 = np.asarray(t9w["p"]), np.asarray(t9w["rn"])
    ends9 = np.concatenate([p9s[1:] != p9s[:-1], [True]])
    sizes9 = rn9[ends9]
    want_sizes9 = np.bincount(p9, minlength=64)
    return np.array_equal(np.sort(sizes9),
                          np.sort(want_sizes9[want_sizes9 > 0]))


@check
def groupby_mean():
    from cuda.radixsort_tpu.ops.aggregate import groupby as _gb
    mk = rng.integers(0, 33, size=1 << 18).astype(np.uint32)
    mv = rng.integers(0, 1000, size=1 << 18).astype(np.int32)
    gmk, gmv, gmc = _gb(jnp.asarray(mk), jnp.asarray(mv), agg="mean")
    umk = np.unique(mk)
    wantm = np.array([mv[mk == u].mean() for u in umk], np.float32)
    return (int(gmc) == umk.shape[0]
            and np.allclose(np.asarray(gmv)[: int(gmc)], wantm, rtol=1e-6))


@check
def full_outer_join():
    from cuda.radixsort_tpu.ops.join import join as _join
    bk10 = np.arange(1 << 16, dtype=np.uint32) * np.uint32(2)
    bv10 = (bk10 // 2).astype(np.int32)
    pk10 = rng.integers(0, 1 << 18, size=1 << 20).astype(np.uint32)
    okA, ovA, oiA, cntA, omA = _join(jnp.asarray(bk10), jnp.asarray(bv10),
                                     jnp.asarray(pk10), how="full")
    want10 = pk10.shape[0] + int((~np.isin(bk10, pk10)).sum())
    return int(cntA) == want10


@check
def composite_key_join():
    from cuda.radixsort_tpu.ops.join import join as _join
    b1c = rng.integers(0, 64, size=4096).astype(np.uint32)
    b2c = rng.integers(0, 64, size=4096).astype(np.uint32)
    seenc = {}
    for i in range(4096):
        seenc[(int(b1c[i]), int(b2c[i]))] = i
    keepc = sorted(seenc.values())
    b1c, b2c = b1c[keepc], b2c[keepc]
    bvc = rng.integers(0, 100, size=len(keepc)).astype(np.int32)
    p1c = rng.integers(0, 64, size=1 << 18).astype(np.uint32)
    p2c = rng.integers(0, 64, size=1 << 18).astype(np.uint32)
    (okc1, okc2), ovc, oic, cntc = _join(
        (jnp.asarray(b1c), jnp.asarray(b2c)), jnp.asarray(bvc),
        (jnp.asarray(p1c), jnp.asarray(p2c)), how="inner")
    lutc = {(int(a), int(b)): int(v) for a, b, v in zip(b1c, b2c, bvc)}
    wantc = sum((int(a), int(b)) in lutc for a, b in zip(p1c, p2c))
    return int(cntc) == wantc


@check
def groupby_quantile():
    from cuda.radixsort_tpu.ops.aggregate import groupby_quantile as _gq
    qk10 = rng.integers(0, 100, size=1 << 20).astype(np.uint32)
    qv10 = rng.integers(0, 10000, size=1 << 20).astype(np.int32)
    gkq, (q25, q50), cq = _gq(jnp.asarray(qk10), jnp.asarray(qv10),
                              (0.25, 0.5))
    u0 = int(np.asarray(gkq)[0])
    w25 = np.quantile(qv10[qk10 == u0], 0.25)
    return abs(float(np.asarray(q25)[0]) - w25) < 1e-3


@check
def pallas_segmented_scan_kernel():
    """The fixed (8, lanes) kernel — the r2 hardware crash site."""
    from cuda.radixsort_tpu.kernels.scan import segmented_scan_pallas
    from cuda.radixsort_tpu.ops.scan import segmented_scan as _ss_xla
    n11 = 1 << 22
    v11 = rng.integers(-99, 99, size=n11).astype(np.int32)
    f11 = rng.random(n11) < 0.01
    g11 = np.asarray(segmented_scan_pallas(jnp.asarray(v11),
                                           jnp.asarray(f11)))
    w11 = np.asarray(_ss_xla(jnp.asarray(v11), jnp.asarray(f11)))
    ok = np.array_equal(g11, w11)
    vj = jnp.asarray(v11)
    fj = jnp.asarray(f11)
    dtp = timed_chain(lambda x: segmented_scan_pallas(x, fj) ^ jnp.int32(1),
                      vj, k=4)
    dtx = timed_chain(lambda x: _ss_xla(x, fj, "min") ^ jnp.int32(1), vj, k=4)
    print(f"  sscan @4M: pallas {dtp*1e3:.2f} ms  xla-doubling(min) "
          f"{dtx*1e3:.2f} ms", flush=True)
    # also the larger size VERDICT asks for (>= 2^24)
    n12 = 1 << 24
    v12 = rng.integers(-99, 99, size=n12).astype(np.int32)
    f12 = rng.random(n12) < 0.001
    g12 = np.asarray(segmented_scan_pallas(jnp.asarray(v12),
                                           jnp.asarray(f12)))
    w12 = np.asarray(_ss_xla(jnp.asarray(v12), jnp.asarray(f12)))
    ok &= np.array_equal(g12, w12)
    dtp = timed_chain(
        lambda x: segmented_scan_pallas(x, jnp.asarray(f12)) ^ jnp.int32(1),
        jnp.asarray(v12), k=4)
    print(f"  sscan @16M: pallas {dtp*1e3:.2f} ms "
          f"({n12/dtp/1e9:.2f} G rows/s)", flush=True)
    return ok


@check
def split_sort_merge_on_chip():
    """r5: heavily padded sorts take the split-sort-merge route (sort
    2^(logn-1) + remainder + one merge level). Keys and stable pairs at a
    size where the route engages (2^25 + 2^22)."""
    from cuda.radixsort_tpu.ops.sort import _split_sort_engages

    n = (1 << 25) + (1 << 22)
    assert _split_sort_engages(n, (n - 1).bit_length())
    k = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    ok = np.array_equal(np.asarray(rs.sort(jnp.asarray(k))), np.sort(k))
    kd = rng.integers(0, 1000, size=n).astype(np.uint32)
    v = np.arange(n, dtype=np.int32)
    sk, sv = rs.sort_pairs(jnp.asarray(kd), jnp.asarray(v))
    o = np.argsort(kd, kind="stable")
    ok &= np.array_equal(np.asarray(sk), kd[o])
    ok &= np.array_equal(np.asarray(sv), v[o])
    return bool(ok)


@check
def bool_payload_widen_filter():
    """r5: sub-4-byte payloads widen to u32 planes — a bool column must
    ride the Pallas filter instead of dragging everything to the gather
    route, bit-exactly."""
    from cuda.radixsort_tpu.ops.filter import filter_columns
    from cuda.radixsort_tpu import config as config_lib

    n = 1 << 21
    p = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64)
                    .astype(np.uint32))
    mask = p > jnp.uint32(1 << 30)
    pcfg = config_lib.resolve(None).replace(engine="pallas")
    (a, b), cnt = filter_columns(
        mask, (p, (p & 1).astype(jnp.bool_)), config=pcfg)
    mh, ph, c = np.asarray(mask), np.asarray(p), int(cnt)
    return (c == mh.sum()
            and np.array_equal(np.asarray(a)[:c], ph[mh])
            and np.array_equal(np.asarray(b)[:c], (ph[mh] & 1).astype(bool)))


@check
def full_outer_join_on_chip():
    """r5: the outer join at a size using the widened bool matched column
    + Pallas compaction, against a numpy oracle."""
    from cuda.radixsort_tpu.ops.join import join as join_op

    n, nb = 1 << 21, 1 << 19
    pk = rng.integers(0, 2 * nb, size=n).astype(np.uint32)
    bk = np.arange(nb, dtype=np.uint32)
    bv = rng.integers(-100, 100, size=nb).astype(np.int32)
    ok_, ov, oi, cnt, om = join_op(jnp.asarray(bk), jnp.asarray(bv),
                                   jnp.asarray(pk), how="full")
    c = int(cnt)
    ok_, ov, oi, om = (np.asarray(x)[:c] for x in (ok_, ov, oi, om))
    matched_mask = pk < nb
    n_expected = n + (nb - len(np.unique(pk[matched_mask])))
    good = c == n_expected
    mm = om & (oi >= 0)
    good &= np.array_equal(ov[mm], bv[ok_[mm]])
    good &= bool((ok_[(~om) & (oi >= 0)] >= nb).all())
    good &= not np.isin(ok_[oi < 0], np.unique(pk)).any()
    return bool(good)


def main() -> int:
    only = os.environ.get("TPU_CHECK_ONLY")
    names = set(only.split(",")) if only else None
    failures = []
    ran = 0
    for name, fn in CHECKS:
        if names and name not in names:
            continue
        ran += 1
        t0 = time.perf_counter()
        try:
            ok = fn()
            verdict = "ok" if ok else "FAIL"
        except Exception:
            ok = False
            verdict = "ERROR"
            traceback.print_exc()
        if not ok:
            failures.append(name)
        print(f"[{verdict}] {name} ({time.perf_counter()-t0:.0f}s)",
              flush=True)
    npass = ran - len(failures)
    print(f"tpu_check: PASS {npass}/{ran}"
          + (f"  FAILED: {', '.join(failures)}" if failures else ""),
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
