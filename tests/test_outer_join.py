"""Right / full outer joins: ops.join and Query.join (single + mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cuda.radixsort_tpu.ops.join import join
from cuda.radixsort_tpu.parallel import dsort
from cuda.radixsort_tpu.pipeline.plan import Query
from cuda.radixsort_tpu.table import table


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="module")
def mesh():
    return dsort.make_mesh()


def test_right_join(rng):
    bk = np.array([2, 5, 9, 13, 21], np.uint32)
    bv = np.array([20, 50, 90, 130, 210], np.int32)
    pk = np.array([5, 5, 9, 7, 2], np.uint32)
    ok, ov, oi, cnt, om = join(jnp.asarray(bk), jnp.asarray(bv),
                               jnp.asarray(pk), how="right")
    cnt = int(cnt)
    # inner matches: probe rows 5,5,9,2 + unmatched build rows 13,21
    assert cnt == 4 + 2
    got = sorted(zip(np.asarray(ok)[:cnt].tolist(),
                     np.asarray(ov)[:cnt].tolist(),
                     np.asarray(oi)[:cnt].tolist(),
                     np.asarray(om)[:cnt].tolist()))
    want = sorted([(2, 20, 4, True), (5, 50, 0, True), (5, 50, 1, True),
                   (9, 90, 2, True), (13, 130, -1, False),
                   (21, 210, -1, False)])
    assert got == want


def test_full_join(rng):
    bk = np.array([2, 5, 9], np.uint32)
    bv = np.array([20, 50, 90], np.int32)
    pk = np.array([5, 7, 2], np.uint32)
    ok, ov, oi, cnt, om = join(jnp.asarray(bk), jnp.asarray(bv),
                               jnp.asarray(pk), how="full")
    cnt = int(cnt)
    # all 3 probe rows + unmatched build row 9
    assert cnt == 4
    got = sorted(zip(np.asarray(ok)[:cnt].tolist(),
                     np.asarray(oi)[:cnt].tolist(),
                     np.asarray(om)[:cnt].tolist()))
    want = sorted([(2, 2, True), (5, 0, True), (7, 1, False),
                   (9, -1, False)])
    assert got == want


def test_full_join_duplicate_build_keys(rng):
    # every unmatched duplicate emits (multiset semantics)
    bk = np.array([4, 4, 8], np.uint32)
    bv = np.array([1, 2, 3], np.int32)
    pk = np.array([8, 8], np.uint32)
    ok, ov, oi, cnt, om = join(jnp.asarray(bk), jnp.asarray(bv),
                               jnp.asarray(pk), how="full")
    cnt = int(cnt)
    assert cnt == 2 + 2  # two probe matches of 8 + two unmatched 4-rows
    vals = sorted(zip(np.asarray(ok)[:cnt].tolist(),
                      np.asarray(ov)[:cnt].tolist()))
    assert vals == [(4, 1), (4, 2), (8, 3), (8, 3)]


def test_outer_join_validity_masks(rng):
    # invalid rows on either side neither match nor emit
    bk = np.array([1, 2, 3], np.uint32)
    bv = np.array([10, 20, 30], np.int32)
    pk = np.array([1, 2, 9], np.uint32)
    bvalid = jnp.asarray(np.array([True, False, True]))
    pvalid = jnp.asarray(np.array([True, True, False]))
    ok, ov, oi, cnt, om = join(jnp.asarray(bk), jnp.asarray(bv),
                               jnp.asarray(pk), how="full",
                               build_valid=bvalid, probe_valid=pvalid)
    cnt = int(cnt)
    # probe 1 matches, probe 2 unmatched (build 2 invalid), probe 9 invalid;
    # build 3 unmatched emits, build 2 invalid does not
    got = sorted(zip(np.asarray(ok)[:cnt].tolist(),
                     np.asarray(om)[:cnt].tolist()))
    assert got == [(1, True), (2, False), (3, False)]
    assert cnt == 3


def test_outer_join_random_oracle(rng):
    nb, npr = 300, 1200
    bk = rng.permutation(np.arange(600, dtype=np.uint32))[:nb]
    bv = rng.integers(0, 1000, size=nb).astype(np.int32)
    pk = rng.integers(0, 700, size=npr).astype(np.uint32)
    for how in ("right", "full"):
        ok, ov, oi, cnt, om = join(jnp.asarray(bk), jnp.asarray(bv),
                                   jnp.asarray(pk), how=how)
        cnt = int(cnt)
        inb = np.isin(pk, bk)
        unmatched_b = ~np.isin(bk, pk)
        want_cnt = (int(inb.sum()) if how == "right"
                    else npr) + int(unmatched_b.sum())
        assert cnt == want_cnt
        okn, oin, omn = (np.asarray(ok)[:cnt], np.asarray(oi)[:cnt],
                         np.asarray(om)[:cnt])
        bonly = oin == -1
        np.testing.assert_array_equal(np.sort(okn[bonly]),
                                      np.sort(bk[unmatched_b]))
        assert not omn[bonly].any()
        lut = dict(zip(bk.tolist(), bv.tolist()))
        ovn = np.asarray(ov)[:cnt]
        for i in np.flatnonzero(omn)[:50]:
            assert ovn[i] == lut[int(okn[i])]


def test_query_full_join_single_and_distributed(mesh, rng):
    n = 8 * 512 + 3
    bk = rng.permutation(np.arange(200, dtype=np.uint32))[:120]
    bv = rng.integers(0, 100, size=120).astype(np.int32)
    pk = rng.integers(0, 260, size=n, dtype=np.uint32)
    pv = rng.integers(0, 50, size=n).astype(np.int32)
    build = table(k=jnp.asarray(bk), price=jnp.asarray(bv))
    t = table(k=jnp.asarray(pk), v=jnp.asarray(pv))

    def plan(t):
        return Query(t).join(build, on="k", value="price", how="full")

    def collect(out, counts):
        rows = []
        if np.ndim(counts) == 0:
            counts = np.array([int(counts)])
            shard = np.asarray(out["k"]).shape[0]
        else:
            counts = np.asarray(counts)
            shard = np.asarray(out["k"]).shape[0] // counts.shape[0]
        kk, pp, mm, vv = (np.asarray(out["k"]), np.asarray(out["price"]),
                          np.asarray(out["matched"]), np.asarray(out["v"]))
        for d in range(counts.shape[0]):
            for i in range(d * shard, d * shard + counts[d]):
                rows.append((int(kk[i]), int(pp[i]) if mm[i] else -1,
                             bool(mm[i]), int(vv[i])))
        return sorted(rows)

    so, sc, _ = plan(t).run()
    do, dc, _ = plan(t).run(mesh=mesh)
    s_rows = collect(so, sc)
    d_rows = collect(do, dc)
    assert s_rows == d_rows
    # sanity vs oracle counts
    want = int(np.isin(pk, bk).sum()) + int((~np.isin(pk, bk)).sum()) \
        + int((~np.isin(bk, pk)).sum())
    assert len(s_rows) == want


def test_query_right_join_distributed(mesh, rng):
    n = 8 * 256
    bk = np.arange(64, dtype=np.uint32)
    bv = (bk * 2).astype(np.int32)
    pk = rng.integers(0, 96, size=n, dtype=np.uint32)
    build = table(k=jnp.asarray(bk), w=jnp.asarray(bv))
    t = table(k=jnp.asarray(pk))

    q = Query(t).join(build, on="k", value="w", how="right")
    out, counts, _ = q.run(mesh=mesh)
    counts = np.asarray(counts)
    shard = np.asarray(out["k"]).shape[0] // counts.shape[0]
    kk, mm = np.asarray(out["k"]), np.asarray(out["matched"])
    got_unmatched = []
    nmatch = 0
    for d in range(counts.shape[0]):
        for i in range(d * shard, d * shard + counts[d]):
            if mm[i]:
                nmatch += 1
            else:
                got_unmatched.append(int(kk[i]))
    present = np.isin(bk, pk)
    assert sorted(got_unmatched) == sorted(bk[~present].tolist())
    assert nmatch == int(np.isin(pk, bk).sum())


def test_full_join_unmatched_probe_value_zero_filled():
    """Review fix: an unmatched probe row must not carry the carried
    build value of an unrelated smaller key."""
    bk = np.array([1], np.uint32)
    bv = np.array([10], np.int32)
    pk = np.array([2], np.uint32)
    ok, ov, oi, cnt, om = join(jnp.asarray(bk), jnp.asarray(bv),
                               jnp.asarray(pk), how="full")
    cnt = int(cnt)
    assert cnt == 2
    rows = {int(k): (int(v), bool(m))
            for k, v, m in zip(np.asarray(ok)[:cnt], np.asarray(ov)[:cnt],
                               np.asarray(om)[:cnt])}
    assert rows[2] == (0, False)     # unmatched probe: zero value
    assert rows[1] == (10, False)    # unmatched build keeps its own value


def test_composite_key_join_inner(rng):
    nb, npr = 200, 900
    b1 = rng.integers(0, 20, size=nb).astype(np.uint32)
    b2 = rng.integers(0, 20, size=nb).astype(np.uint32)
    # dedupe build pairs (FK build shape)
    seen = {}
    for i in range(nb):
        seen[(int(b1[i]), int(b2[i]))] = i
    keep = sorted(seen.values())
    b1, b2 = b1[keep], b2[keep]
    bv = rng.integers(0, 1000, size=len(keep)).astype(np.int32)
    p1 = rng.integers(0, 25, size=npr).astype(np.uint32)
    p2 = rng.integers(0, 25, size=npr).astype(np.uint32)
    (ok1, ok2), ov, oi, cnt = join(
        (jnp.asarray(b1), jnp.asarray(b2)), jnp.asarray(bv),
        (jnp.asarray(p1), jnp.asarray(p2)), how="inner")
    cnt = int(cnt)
    lut = {(int(a), int(b)): int(v) for a, b, v in zip(b1, b2, bv)}
    want_cnt = sum((int(a), int(b)) in lut for a, b in zip(p1, p2))
    assert cnt == want_cnt
    o1, o2, ovn, oin = (np.asarray(ok1)[:cnt], np.asarray(ok2)[:cnt],
                        np.asarray(ov)[:cnt], np.asarray(oi)[:cnt])
    for i in range(cnt):
        assert ovn[i] == lut[(int(o1[i]), int(o2[i]))]
        assert (int(p1[oin[i]]), int(p2[oin[i]])) == (int(o1[i]),
                                                      int(o2[i]))


def test_composite_key_join_full(rng):
    b1 = np.array([1, 1, 2], np.uint32)
    b2 = np.array([5, 6, 5], np.uint32)
    bv = np.array([10, 20, 30], np.int32)
    p1 = np.array([1, 2, 9], np.uint32)
    p2 = np.array([6, 5, 9], np.uint32)
    (ok1, ok2), ov, oi, cnt, om = join(
        (jnp.asarray(b1), jnp.asarray(b2)), jnp.asarray(bv),
        (jnp.asarray(p1), jnp.asarray(p2)), how="full")
    cnt = int(cnt)
    # probes (1,6)->20, (2,5)->30, (9,9) unmatched; build (1,5) unmatched
    assert cnt == 4
    got = sorted(zip(np.asarray(ok1)[:cnt].tolist(),
                     np.asarray(ok2)[:cnt].tolist(),
                     np.asarray(ov)[:cnt].tolist(),
                     np.asarray(om)[:cnt].tolist()))
    want = sorted([(1, 6, 20, True), (2, 5, 30, True), (9, 9, 0, False),
                   (1, 5, 10, False)])
    assert got == want


def test_query_composite_join_single_and_distributed(mesh, rng):
    n = 8 * 300 + 1
    ba = np.repeat(np.arange(8, dtype=np.uint32), 8)
    bb = np.tile(np.arange(8, dtype=np.uint32), 8)
    bv = (ba * 100 + bb).astype(np.int32)
    pa = rng.integers(0, 10, size=n).astype(np.uint32)
    pb = rng.integers(0, 10, size=n).astype(np.uint32)
    build = table(a=jnp.asarray(ba), b=jnp.asarray(bb), w=jnp.asarray(bv))
    t = table(a=jnp.asarray(pa), b=jnp.asarray(pb))

    def plan(t):
        return Query(t).join(build, on=("a", "b"), value="w", how="inner")

    so, sc, _ = plan(t).run()
    sc = int(sc)
    want_cnt = int(((pa < 8) & (pb < 8)).sum())
    assert sc == want_cnt
    for i in range(0, sc, max(1, sc // 50)):
        a_, b_, w_ = (int(so["a"][i]), int(so["b"][i]), int(so["w"][i]))
        assert w_ == a_ * 100 + b_

    do, dc, _ = plan(t).run(mesh=mesh)
    dc = np.asarray(dc)
    assert int(dc.sum()) == want_cnt
    # full outer composite, distributed: every unmatched build pair once
    q2 = Query(t).join(build, on=("a", "b"), value="w", how="full")
    do2, dc2, _ = q2.run(mesh=mesh)
    dc2 = np.asarray(dc2)
    present = set(zip(pa.tolist(), pb.tolist()))
    n_unmatched_build = sum((int(a), int(b)) not in present
                            for a, b in zip(ba, bb))
    assert int(dc2.sum()) == n + n_unmatched_build
