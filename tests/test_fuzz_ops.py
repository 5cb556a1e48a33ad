"""Randomized property sweep over the operator surface — many small random
configurations (sizes, dtypes, duplicate densities) against numpy oracles.
Catches shape-edge and dtype-edge interactions the targeted tests miss."""

import numpy as np
import pytest

import jax.numpy as jnp

import cuda.radixsort_tpu as rs
from cuda.radixsort_tpu.ops.join import join
from cuda.radixsort_tpu.ops.scan import scan_by_key

SIZES = [1, 2, 3, 7, 127, 128, 129, 1000, 4097]
DTYPES = [np.uint32, np.int32, np.float32, np.uint16, np.int16, np.uint8]


def _rand(rng, n, dt):
    if np.issubdtype(dt, np.floating):
        x = rng.standard_normal(n).astype(dt) * 100
        return x
    info = np.iinfo(dt)
    return rng.integers(info.min, int(info.max) + 1, size=n).astype(dt)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sort_all_dtypes(seed):
    rng = np.random.default_rng(seed)
    for n in SIZES:
        dt = DTYPES[(seed + n) % len(DTYPES)]
        x = _rand(rng, n, dt)
        got = np.asarray(rs.sort(jnp.asarray(x)))
        np.testing.assert_array_equal(got, np.sort(x),
                                      err_msg=f"n={n} dt={dt}")


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sort_pairs_stability(seed):
    rng = np.random.default_rng(100 + seed)
    for n in SIZES:
        # heavy duplicates stress stability
        k = rng.integers(0, max(1, n // 8) + 1, size=n).astype(np.uint32)
        v = np.arange(n, dtype=np.int32)
        gk, gv = rs.sort_pairs(jnp.asarray(k), jnp.asarray(v))
        o = np.argsort(k, kind="stable")
        np.testing.assert_array_equal(np.asarray(gk), k[o], f"n={n}")
        np.testing.assert_array_equal(np.asarray(gv), v[o], f"n={n}")


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_scan_by_key(seed):
    rng = np.random.default_rng(200 + seed)
    for n in SIZES:
        for op in ("sum", "min", "max"):
            k = np.sort(rng.integers(0, max(1, n // 3) + 1, size=n)
                        ).astype(np.uint32)
            v = rng.integers(-50, 50, size=n).astype(np.int32)
            got = np.asarray(scan_by_key(jnp.asarray(k), jnp.asarray(v),
                                         op))
            want = np.empty_like(v)
            f = {"sum": lambda a, b: a + b, "min": min, "max": max}[op]
            s = 0
            for i in range(n):
                if i > 0 and k[i] == k[i - 1]:
                    want[i] = f(want[i - 1], v[i])
                else:
                    want[i] = v[i]
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"n={n} op={op}")


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_groupby_all_aggs(seed):
    rng = np.random.default_rng(300 + seed)
    for n in [1, 7, 129, 1000]:
        k = rng.integers(0, max(1, n // 4) + 1, size=n).astype(np.uint32)
        v = rng.integers(-99, 99, size=n).astype(np.int32)
        uk = np.unique(k)
        for agg in ("sum", "count", "min", "max", "mean", "var", "std",
                    "median"):
            gk, gv, cnt = rs.groupby(jnp.asarray(k), jnp.asarray(v),
                                     agg=agg)
            assert int(cnt) == uk.shape[0], f"n={n} agg={agg}"
            gvn = np.asarray(gv)[: int(cnt)]
            for i, u in enumerate(uk):
                grp = v[k == u].astype(np.float64)
                want = {"sum": grp.sum(), "count": grp.size,
                        "min": grp.min(), "max": grp.max(),
                        "mean": grp.mean(), "var": grp.var(),
                        "std": grp.std(),
                        "median": np.median(grp)}[agg]
                np.testing.assert_allclose(
                    float(gvn[i]), want, rtol=2e-4, atol=2e-4,
                    err_msg=f"n={n} agg={agg} key={u}")


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_joins(seed):
    rng = np.random.default_rng(400 + seed)
    for nb, npr in [(1, 1), (3, 17), (50, 200), (257, 1000)]:
        bk = rng.permutation(np.arange(4 * nb, dtype=np.uint32))[:nb]
        bv = rng.integers(0, 1000, size=nb).astype(np.int32)
        pk = rng.integers(0, 4 * nb + 1, size=npr).astype(np.uint32)
        lut = dict(zip(bk.tolist(), bv.tolist()))
        inb = np.isin(pk, bk)
        for how, want_cnt in (
                ("inner", int(inb.sum())),
                ("left", npr),
                ("semi", int(inb.sum())),
                ("anti", int((~inb).sum())),
                ("right", int(inb.sum()) + int((~np.isin(bk, pk)).sum())),
                ("full", npr + int((~np.isin(bk, pk)).sum()))):
            out = join(jnp.asarray(bk), jnp.asarray(bv), jnp.asarray(pk),
                       how=how)
            cnt = int(out[-1 if how in ("semi", "anti", "inner")
                          else -2])
            assert cnt == want_cnt, f"how={how} nb={nb} npr={npr}"
        # spot-check inner values
        ok, ov, oi, cnt = join(jnp.asarray(bk), jnp.asarray(bv),
                               jnp.asarray(pk), how="inner")
        cnt = int(cnt)
        okn, ovn = np.asarray(ok)[:cnt], np.asarray(ov)[:cnt]
        for i in range(0, cnt, max(1, cnt // 20)):
            assert ovn[i] == lut[int(okn[i])]


@pytest.mark.parametrize("seed", range(2))
def test_fuzz_filter_unique_topk(seed):
    rng = np.random.default_rng(500 + seed)
    for n in [1, 129, 1000, 4097]:
        x = rng.integers(0, max(2, n // 2), size=n).astype(np.uint32)
        mask = (x % 3) == 0
        (out,), cnt = rs.filter_columns(jnp.asarray(mask), (jnp.asarray(x),))
        np.testing.assert_array_equal(np.asarray(out)[: int(cnt)], x[mask])
        sx = np.sort(x)
        uk, ucnt = rs.unique(jnp.asarray(sx))
        np.testing.assert_array_equal(np.asarray(uk)[: int(ucnt)],
                                      np.unique(x))
        k = min(7, n)
        tv, ti = rs.top_k(jnp.asarray(x), k)
        np.testing.assert_array_equal(np.asarray(tv), np.sort(x)[::-1][:k])
