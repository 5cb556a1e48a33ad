"""Operator oracle tests: partition, filter, join, groupby (numpy ground truth)."""

import jax.numpy as jnp
import numpy as np
import pytest

import cuda.radixsort_tpu as rs

CFG = rs.SortConfig(engine="xla")  # engine-agnostic semantics; fast on CPU


def test_partition_range():
    rng = np.random.default_rng(0)
    n = 50_000
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    vals = np.arange(n, dtype=np.int32)
    ko, vo, off = rs.partition(jnp.asarray(keys), jnp.asarray(vals), bits=4,
                               config=CFG)
    ko, vo, off = np.asarray(ko), np.asarray(vo), np.asarray(off)
    assert off[0] == 0 and off[-1] == n
    b = keys >> 28
    order = np.argsort(b, kind="stable")
    np.testing.assert_array_equal(vo, vals[order])
    np.testing.assert_array_equal(ko, keys[order])
    for bb in range(16):
        np.testing.assert_array_equal(off[bb], np.sum(b < bb))


def test_partition_hash_offsets():
    rng = np.random.default_rng(1)
    n = 30_000
    keys = rng.integers(0, 1000, size=n, dtype=np.uint32)  # duplicates
    ko, _, off = rs.partition(jnp.asarray(keys), bits=6, by_hash=True,
                              config=CFG)
    off = np.asarray(off)
    # same key -> same bucket; bucket sizes sum to n
    assert off[-1] == n
    ids = np.asarray(rs.bucket_ids(jnp.asarray(keys), bits=6, by_hash=True))
    counts = np.bincount(ids, minlength=64)
    np.testing.assert_array_equal(np.diff(off), counts)


def test_selection_vector_and_filter():
    rng = np.random.default_rng(2)
    n = 20_000
    x = rng.standard_normal(n).astype(np.float32)
    mask = x > 0.3
    sel, cnt = rs.selection_vector(jnp.asarray(mask), config=CFG)
    sel, cnt = np.asarray(sel), int(cnt)
    assert cnt == mask.sum()
    np.testing.assert_array_equal(sel[:cnt], np.nonzero(mask)[0])

    (xo,), cnt2 = rs.filter_columns(jnp.asarray(mask), (jnp.asarray(x),),
                                    config=CFG)
    assert int(cnt2) == cnt
    np.testing.assert_array_equal(np.asarray(xo)[:cnt], x[mask])


@pytest.mark.parametrize("how", ["inner", "left"])
def test_join_fk(how):
    rng = np.random.default_rng(3)
    nb, npr = 1000, 20_000
    bk = rng.permutation(np.arange(5000, dtype=np.uint32))[:nb]  # unique keys
    bv = rng.integers(0, 2**31, size=nb).astype(np.int32)
    pk = rng.choice(np.arange(5000, dtype=np.uint32), size=npr)  # ~20% hit rate
    lut = dict(zip(bk.tolist(), bv.tolist()))

    out = rs.join(jnp.asarray(bk), jnp.asarray(bv), jnp.asarray(pk), how=how,
                  config=CFG)
    if how == "inner":
        ok, ov, oi, cnt = [np.asarray(o) for o in out]
        cnt = int(cnt)
        want = [(k, lut[k], i) for i, k in enumerate(pk.tolist()) if k in lut]
        assert cnt == len(want)
        got = sorted(zip(ok[:cnt].tolist(), ov[:cnt].tolist(), oi[:cnt].tolist()))
        assert got == sorted(want)
    else:
        ok, ov, oi, cnt, om = [np.asarray(o) for o in out]
        cnt = int(cnt)
        assert cnt == npr
        for k, v, i, m in zip(ok[:cnt], ov[:cnt], oi[:cnt], om[:cnt]):
            assert k == pk[i]
            if k in lut:
                assert m and v == lut[k]
            else:
                assert not m


@pytest.mark.parametrize("agg", ["sum", "count", "min", "max"])
def test_groupby(agg):
    rng = np.random.default_rng(4)
    n = 30_000
    # Zipf-ish skew: heavy hitters + long tail
    keys = np.where(rng.random(n) < 0.5, 7,
                    rng.integers(0, 500, size=n)).astype(np.uint32)
    vals = rng.integers(-1000, 1000, size=n).astype(np.int32)
    gk, gv, cnt = rs.groupby(jnp.asarray(keys), jnp.asarray(vals), agg=agg,
                             config=CFG)
    gk, gv, cnt = np.asarray(gk), np.asarray(gv), int(cnt)
    uniq = np.unique(keys)
    assert cnt == len(uniq)
    np.testing.assert_array_equal(gk[:cnt], uniq)
    for i, k in enumerate(uniq):
        sel = vals[keys == k]
        want = {"sum": sel.sum(), "count": len(sel),
                "min": sel.min(), "max": sel.max()}[agg]
        assert gv[i] == want, (agg, k, gv[i], want)


def test_sort_struct_lexicographic():
    # decomposer protocol: mixed-dtype struct key (i32 major, f32 minor)
    import cuda.radixsort_tpu as rs
    rng = np.random.default_rng(17)
    a = rng.integers(-50, 50, 2000).astype(np.int32)
    b = rng.standard_normal(2000).astype(np.float32)
    pay = np.arange(2000, dtype=np.int32)
    (oa, ob), op = rs.sort_struct((jnp.asarray(a), jnp.asarray(b)),
                                  jnp.asarray(pay))
    perm = np.lexsort((b, a))  # numpy: last key is primary
    np.testing.assert_array_equal(np.asarray(oa), a[perm])
    np.testing.assert_array_equal(np.asarray(ob), b[perm])
    np.testing.assert_array_equal(np.asarray(op), pay[perm])


def test_sort_struct_u64_major_descending():
    import cuda.radixsort_tpu as rs
    rng = np.random.default_rng(18)
    a = rng.integers(0, 2**64, 1500, dtype=np.uint64)
    a[: 300] = a[0]  # duplicates exercise the minor column
    c = rng.integers(0, 2**32, 1500, dtype=np.uint32)
    oa, oc = rs.sort_struct((jnp.asarray(a), jnp.asarray(c)), descending=True)
    perm = np.lexsort((-c.astype(np.int64) & 0xFFFFFFFF, ~a))  # desc both
    np.testing.assert_array_equal(np.asarray(oa), a[perm])
    np.testing.assert_array_equal(np.asarray(oc), c[perm])
