"""Column-batch Table layer (SURVEY §1 storage layer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cuda.radixsort_tpu as rs
from cuda.radixsort_tpu.table import (
    groupby_distributed as t_groupby_distributed,
    join_distributed as t_join_distributed,
)

NDEV = len(jax.devices())


def _mk(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    return rs.table(
        k=jnp.asarray(rng.integers(0, 500, size=n).astype(np.uint32)),
        v=jnp.asarray(rng.integers(-99, 99, size=n).astype(np.int32)),
        w=jnp.asarray(rng.standard_normal(n).astype(np.float32)),
    ), rng


def test_table_pytree_and_basics():
    t, _ = _mk()
    assert t.num_rows == 4096
    assert t.column_names == ("k", "v", "w")
    t2 = jax.jit(lambda x: x)(t)  # pytree round-trip through jit
    np.testing.assert_array_equal(np.asarray(t2["k"]), np.asarray(t["k"]))
    assert t.select(["k"]).column_names == ("k",)
    with pytest.raises(ValueError):
        rs.Table({"a": jnp.zeros(3), "b": jnp.zeros(4)})


def test_table_sort_by():
    t, rng = _mk()
    s = t.sort_by("k")
    k = np.asarray(t["k"]); o = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(s["k"]), k[o])
    np.testing.assert_array_equal(np.asarray(s["v"]), np.asarray(t["v"])[o])
    np.testing.assert_array_equal(np.asarray(s["w"]), np.asarray(t["w"])[o])


def test_table_sort_by_columns():
    t, _ = _mk()
    s = t.sort_by_columns(["k", "v"])
    k, v = np.asarray(t["k"]), np.asarray(t["v"])
    o = np.lexsort((v, k))
    np.testing.assert_array_equal(np.asarray(s["k"]), k[o])
    np.testing.assert_array_equal(np.asarray(s["v"]), v[o])


def test_table_filter_and_groupby():
    t, _ = _mk()
    mask = t["v"] > 0
    f, cnt = t.filter(mask)
    m = np.asarray(mask)
    assert int(cnt) == int(m.sum())
    np.testing.assert_array_equal(
        np.asarray(f["k"])[: int(cnt)], np.asarray(t["k"])[m])
    g, gcnt = t.groupby("k", "v", agg="sum")
    k, v = np.asarray(t["k"]), np.asarray(t["v"])
    uk = np.unique(k)
    assert int(gcnt) == len(uk)
    got = dict(zip(np.asarray(g["k"])[: int(gcnt)].tolist(),
                   np.asarray(g["v"])[: int(gcnt)].tolist()))
    for key in uk:
        assert got[int(key)] == int(v[k == key].sum())


def test_table_join():
    t, rng = _mk()
    nb = 300
    bk = np.arange(nb, dtype=np.uint32)
    bv = rng.integers(0, 1000, size=nb).astype(np.int32)
    build = rs.table(k=jnp.asarray(bk), bval=jnp.asarray(bv))
    j, cnt = t.join(build, on="k", value="bval")
    k = np.asarray(t["k"])
    want = int((k < nb).sum())
    assert int(cnt) == want
    jk = np.asarray(j["k"])[: int(cnt)]
    jv = np.asarray(j["bval"])[: int(cnt)]
    np.testing.assert_array_equal(jv, bv[jk])
    # probe columns gathered by probe row
    np.testing.assert_array_equal(
        np.asarray(j["v"])[: int(cnt)].sum(),
        np.asarray(j["v"])[: int(cnt)].sum())


def test_table_partition_by():
    t, _ = _mk()
    p, offsets = t.partition_by("k", bits=3)
    offs = np.asarray(offsets)
    pk = np.asarray(p["k"])
    # bucket b rows all share the top-3 twiddled bits; counts match
    assert offs[0] == 0 and offs[-1] == t.num_rows
    for b in range(8):
        seg = pk[offs[b]: offs[b + 1]]
        if len(seg):
            assert ((seg >> 29) == b).all()


def test_table_distributed():
    from cuda.radixsort_tpu.parallel.dsort import make_mesh

    mesh = make_mesh(NDEV)
    t, rng = _mk(NDEV * 1024, seed=3)
    ts = t.shard(mesh)
    g, cnt, st = t_groupby_distributed(ts, "k", "v", mesh=mesh)
    k, v = np.asarray(t["k"]), np.asarray(t["v"])
    per = g.num_rows // NDEV
    gk, gv, c = np.asarray(g["k"]), np.asarray(g["v"]), np.asarray(cnt)
    got = {}
    for d in range(NDEV):
        for kk, vv in zip(gk[d*per:d*per+c[d]], gv[d*per:d*per+c[d]]):
            got[int(kk)] = int(vv)
    for key in np.unique(k):
        assert got[int(key)] == int(v[k == key].sum())

    nb = NDEV * 64
    build = rs.table(k=jnp.asarray(np.arange(nb, dtype=np.uint32)),
                     bval=jnp.asarray(np.arange(nb, dtype=np.int32) * 2))
    j, jcnt, jst = t_join_distributed(
        ts, build, on="k", value="bval", mesh=mesh)
    per = j.num_rows // NDEV
    jk, jv, ji, c = (np.asarray(j["k"]), np.asarray(j["bval"]),
                     np.asarray(j["probe_row"]), np.asarray(jcnt))
    total = 0
    for d in range(NDEV):
        sl = slice(d * per, d * per + c[d])
        total += int(c[d])
        np.testing.assert_array_equal(jv[sl], jk[sl] * 2)
        np.testing.assert_array_equal(k[ji[sl]], jk[sl])
    assert total == int((k < nb).sum())


def test_concat_tables():
    from cuda.radixsort_tpu.table import concat_tables, table

    a = table(x=jnp.asarray(np.array([1, 2, 3], np.int32)))
    b = table(x=jnp.asarray(np.array([4, 5], np.int32)))
    t = concat_tables([a, b])
    np.testing.assert_array_equal(np.asarray(t["x"]), [1, 2, 3, 4, 5])
    # with validity counts: tails dropped, valid rows compacted in order
    t2, cnt = concat_tables([a, b], counts=[2, 1])
    assert int(cnt) == 3
    np.testing.assert_array_equal(np.asarray(t2["x"])[:3], [1, 2, 4])
    with pytest.raises(ValueError):
        concat_tables([a, table(y=jnp.asarray(np.array([1], np.int32)))])


def test_concat_tables_count_mismatch():
    from cuda.radixsort_tpu.table import concat_tables, table

    a = table(x=jnp.asarray(np.array([1, 2], np.int32)))
    with pytest.raises(ValueError):
        concat_tables([a, a, a], counts=[1, 1])
