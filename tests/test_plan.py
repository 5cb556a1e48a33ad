"""Query-plan layer (pipeline/plan.py) + groupby validity protocol."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuda.radixsort_tpu.ops.aggregate import groupby
from cuda.radixsort_tpu.pipeline.plan import Query
from cuda.radixsort_tpu.table import table


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(123)


def test_groupby_valid_mask(rng):
    k = rng.integers(0, 20, size=1000, dtype=np.uint32)
    v = rng.integers(0, 100, size=1000).astype(np.int32)
    valid = rng.random(1000) < 0.6
    gk, gv, cnt = groupby(jnp.asarray(k), jnp.asarray(v),
                          valid=jnp.asarray(valid))
    cnt = int(cnt)
    uk = np.unique(k[valid])
    assert cnt == uk.shape[0]
    np.testing.assert_array_equal(np.asarray(gk)[:cnt], uk)
    oracle = np.array([v[valid & (k == key)].sum() for key in uk])
    np.testing.assert_array_equal(np.asarray(gv)[:cnt], oracle)


def test_groupby_valid_none_unchanged(rng):
    k = rng.integers(0, 9, size=500, dtype=np.uint32)
    v = rng.integers(0, 10, size=500).astype(np.int32)
    gk, gv, cnt = groupby(jnp.asarray(k), jnp.asarray(v), agg="min")
    uk = np.unique(k)
    assert int(cnt) == uk.shape[0]
    np.testing.assert_array_equal(
        np.asarray(gv)[: int(cnt)],
        np.array([v[k == key].min() for key in uk]))


def _oracle_pipeline(pk, pv, bk, bv, thresh, topn):
    """numpy oracle of the full plan used in the tests below."""
    sel = pv > thresh
    fk, fv = pk[sel], pv[sel]
    bmap = dict(zip(bk.tolist(), bv.tolist()))
    rows = [(k_, v_, bmap[k_]) for k_, v_ in zip(fk, fv) if k_ in bmap]
    agg: dict = {}
    for k_, v_, _ in rows:
        agg[k_] = agg.get(k_, 0) + v_
    # order_by value desc is a STABLE sort on key-ascending groupby output
    out = sorted(agg.items(), key=lambda kv: kv[0])
    out = sorted(out, key=lambda kv: -kv[1])
    return out[:topn]


def test_query_full_pipeline(rng):
    n, nb = 4096, 100
    pk = rng.integers(0, 150, size=n, dtype=np.uint32)
    pv = rng.integers(0, 1000, size=n).astype(np.int32)
    bk = np.arange(nb, dtype=np.uint32)  # build keys 0..99 (some miss)
    bv = rng.integers(0, 50, size=nb).astype(np.int32)

    q = (Query(table(k=jnp.asarray(pk), v=jnp.asarray(pv)))
         .where(lambda t: t["v"] > 500)
         .join(table(k=jnp.asarray(bk), p=jnp.asarray(bv)),
               on="k", value="p")
         .groupby("k", "v", agg="sum")
         .order_by("v", descending=True)
         .limit(10))
    out, cnt, stats = q.run()
    cnt = int(cnt)
    oracle = _oracle_pipeline(pk, pv, bk, bv, 500, 10)
    assert cnt == len(oracle)
    got = list(zip(np.asarray(out["k"])[:cnt].tolist(),
                   np.asarray(out["v"])[:cnt].tolist()))
    # value order must match; key ties in value may order differently only
    # if the oracle has ties (stable key-ascending both sides)
    assert got == oracle
    # stats thread every stage
    assert set(stats) == {"0:where", "1:join", "2:groupby", "3:order_by",
                          "4:limit"}
    assert int(stats["4:limit"]) == cnt


def test_query_where_select_with_column(rng):
    x = rng.integers(0, 100, size=777).astype(np.int32)
    q = (Query(table(x=jnp.asarray(x)))
         .with_column("y", lambda t: t["x"] * 2)
         .where(lambda t: t["y"] > 100)
         .select("y"))
    out, cnt, _ = q.run()
    cnt = int(cnt)
    assert out.column_names == ("y",)
    np.testing.assert_array_equal(np.asarray(out["y"])[:cnt],
                                  (x * 2)[x * 2 > 100])


def test_query_chained_where_respects_validity(rng):
    # second where must not resurrect rows dropped by the first (the tail
    # rows are real data, not sentinels)
    x = rng.integers(0, 100, size=512).astype(np.int32)
    q = (Query(table(x=jnp.asarray(x)))
         .where(lambda t: t["x"] >= 50)
         .where(lambda t: t["x"] < 70))
    out, cnt, _ = q.run()
    np.testing.assert_array_equal(np.asarray(out["x"])[: int(cnt)],
                                  x[(x >= 50) & (x < 70)])


def test_query_order_by_keeps_invalid_last(rng):
    x = rng.integers(0, 1000, size=300).astype(np.int32)
    q = (Query(table(x=jnp.asarray(x)))
         .where(lambda t: t["x"] % 2 == 0)
         .order_by("x"))
    out, cnt, _ = q.run()
    cnt = int(cnt)
    np.testing.assert_array_equal(np.asarray(out["x"])[:cnt],
                                  np.sort(x[x % 2 == 0]))
    # ascending with invalid tail: valid prefix only
    q2 = (Query(table(x=jnp.asarray(x)))
          .where(lambda t: t["x"] % 2 == 0)
          .order_by("x", descending=True))
    out2, cnt2, _ = q2.run()
    np.testing.assert_array_equal(np.asarray(out2["x"])[: int(cnt2)],
                                  np.sort(x[x % 2 == 0])[::-1])


def test_query_join_with_compacted_build(rng):
    # build side itself the output of a prior plan (valid prefix only)
    bk = np.array([1, 2, 3, 4, 5, 99, 98, 97], np.uint32)
    bv = np.arange(8, dtype=np.int32) * 10
    pk = np.array([1, 99, 3, 98, 7], np.uint32)
    build = table(k=jnp.asarray(bk), p=jnp.asarray(bv))
    # declare only first 5 build rows valid -> 99/98 can't match
    q = (Query(table(k=jnp.asarray(pk)))
         .join(build, on="k", value="p", build_count=5))
    out, cnt, _ = q.run()
    cnt = int(cnt)
    got = dict(zip(np.asarray(out["k"])[:cnt].tolist(),
                   np.asarray(out["p"])[:cnt].tolist()))
    assert got == {1: 0, 3: 20}


def test_query_explain():
    t = table(x=jnp.arange(4))
    s = (Query(t).where(lambda t: t["x"] > 0).groupby("x", "x", agg="count")
         .limit(2).explain())
    assert "where" in s and "groupby" in s and "limit 2" in s


def test_query_jits_end_to_end(rng):
    x = rng.integers(0, 50, size=256).astype(np.int32)

    @jax.jit
    def run(xs):
        out, cnt, _ = (Query(table(x=xs))
                       .where(lambda t: t["x"] > 10)
                       .groupby("x", "x", agg="count").run())
        return out["x"], out["count"], cnt

    ks, cs, cnt = run(jnp.asarray(x))
    uk, uc = np.unique(x[x > 10], return_counts=True)
    assert int(cnt) == uk.shape[0]
    np.testing.assert_array_equal(np.asarray(ks)[: int(cnt)], uk)
    np.testing.assert_array_equal(np.asarray(cs)[: int(cnt)], uc)


def test_query_join_variants(rng):
    bk = np.array([1, 2, 3], np.uint32)
    bv = np.array([10, 20, 30], np.int32)
    pk = np.array([2, 5, 1, 2, 9], np.uint32)
    pv = np.arange(5, dtype=np.int32)
    build = table(k=jnp.asarray(bk), p=jnp.asarray(bv))
    src = table(k=jnp.asarray(pk), v=jnp.asarray(pv))
    # semi: probe rows with a match
    out, cnt, _ = Query(src).join(build, on="k", how="semi").run()
    cnt = int(cnt)
    assert sorted(np.asarray(out["k"])[:cnt].tolist()) == [1, 2, 2]
    assert sorted(np.asarray(out["v"])[:cnt].tolist()) == [0, 2, 3]
    # anti: probe rows without a match
    out, cnt, _ = Query(src).join(build, on="k", how="anti").run()
    cnt = int(cnt)
    assert sorted(np.asarray(out["k"])[:cnt].tolist()) == [5, 9]
    # left: all rows + matched mask
    out, cnt, _ = (Query(src)
                   .join(build, on="k", value="p", how="left").run())
    cnt = int(cnt)
    assert cnt == 5
    got = {int(v): (int(k), bool(m)) for k, v, m in zip(
        np.asarray(out["k"])[:cnt], np.asarray(out["v"])[:cnt],
        np.asarray(out["matched"])[:cnt])}
    assert got == {0: (2, True), 1: (5, False), 2: (1, True),
                   3: (2, True), 4: (9, False)}
    mp = {int(v): int(p) for v, p, m in zip(
        np.asarray(out["v"])[:cnt], np.asarray(out["p"])[:cnt],
        np.asarray(out["matched"])[:cnt]) if m}
    assert mp == {0: 20, 2: 10, 3: 20}
    # how validation
    with pytest.raises(ValueError):
        Query(src).join(build, on="k", how="outer")
    with pytest.raises(ValueError):
        Query(src).join(build, on="k", how="inner")  # needs value=


def test_query_join_semi_distributed(rng):
    from cuda.radixsort_tpu.parallel import dsort

    mesh = dsort.make_mesh()
    pk = rng.integers(0, 100, size=8 * 200 + 3, dtype=np.uint32)
    build = table(k=jnp.asarray(np.arange(0, 100, 2, dtype=np.uint32)),
                  p=jnp.asarray(np.zeros(50, np.int32)))
    q = Query(table(k=jnp.asarray(pk))).join(build, on="k", how="anti")
    out, counts, _ = q.run(mesh=mesh)
    counts = np.asarray(counts)
    rows = np.asarray(out["k"]).shape[0] // counts.shape[0]
    got = np.concatenate([np.asarray(out["k"]).reshape(-1, rows)[d, : counts[d]]
                          for d in range(counts.shape[0])])
    assert got.shape[0] == int((pk % 2 == 1).sum())
    np.testing.assert_array_equal(np.sort(got), np.sort(pk[pk % 2 == 1]))


def test_query_distinct_single_and_distributed(rng):
    from cuda.radixsort_tpu.parallel import dsort

    mesh = dsort.make_mesh()
    n = 8 * 300 + 7
    a = rng.integers(0, 6, size=n).astype(np.uint32)
    b = rng.integers(0, 4, size=n).astype(np.uint32)
    v = rng.integers(0, 100, size=n).astype(np.int32)
    t = table(a=jnp.asarray(a), b=jnp.asarray(b), v=jnp.asarray(v))

    def plan(t):
        return (Query(t).where(lambda t: t["v"] > 20)
                .distinct("a", "b"))

    so, sc, _ = plan(t).run()
    sc = int(sc)
    mask = v > 20
    want = sorted(set(zip(a[mask].tolist(), b[mask].tolist())))
    got = sorted(zip(np.asarray(so["a"])[:sc].tolist(),
                     np.asarray(so["b"])[:sc].tolist()))
    assert got == want

    do, dc, _ = plan(t).run(mesh=mesh)
    dc = np.asarray(dc)
    rows = np.asarray(do["a"]).shape[0] // dc.shape[0]
    da, db = np.asarray(do["a"]), np.asarray(do["b"])
    dgot = []
    for d in range(dc.shape[0]):
        for i in range(d * rows, d * rows + dc[d]):
            dgot.append((int(da[i]), int(db[i])))
    assert sorted(dgot) == want
    assert len(dgot) == len(set(dgot))  # no cross-shard duplicates


def test_table_distinct(rng):
    a = np.array([3, 1, 3, 2, 1], np.uint32)
    t = table(a=jnp.asarray(a))
    out, cnt = t.distinct()
    assert int(cnt) == 3
    np.testing.assert_array_equal(np.asarray(out["a"])[:3], [1, 2, 3])


def test_order_by_multi_column(rng):
    n = 1000
    a = rng.integers(0, 5, size=n).astype(np.uint32)
    b = rng.integers(0, 100, size=n).astype(np.int32)
    t = table(a=jnp.asarray(a), b=jnp.asarray(b))
    out, cnt, _ = Query(t).order_by("a", "b").run()
    order = np.lexsort((b, a))
    np.testing.assert_array_equal(np.asarray(out["a"]), a[order])
    np.testing.assert_array_equal(np.asarray(out["b"]), b[order])
    out2, _, _ = Query(t).order_by("a", "b", descending=True).run()
    np.testing.assert_array_equal(np.asarray(out2["a"]), a[order][::-1])
    np.testing.assert_array_equal(np.asarray(out2["b"]), b[order][::-1])


def test_order_by_keyword_compat(rng):
    t = table(a=jnp.asarray(np.array([3, 1, 2], np.int32)))
    out, _, _ = Query(t).order_by(key="a").run()
    np.testing.assert_array_equal(np.asarray(out["a"]), [1, 2, 3])


def test_run_timed_stats(rng):
    t = table(k=jnp.asarray(np.arange(100, dtype=np.uint32)),
              v=jnp.asarray(np.arange(100, dtype=np.int32)))
    out, cnt, stats = (Query(t).where(lambda t: t["v"] > 50)
                       .groupby("k", "v", agg="sum").run(timed=True))
    assert "0:where:ms" in stats and "1:groupby:ms" in stats
    assert stats["0:where:ms"] >= 0
    assert int(stats["0:where"]) == 49
