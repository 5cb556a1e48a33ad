"""Window functions: ops/window.py + Query.window (single-chip and mesh)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cuda.radixsort_tpu.ops.window import window
from cuda.radixsort_tpu.parallel import dsort
from cuda.radixsort_tpu.pipeline.plan import Query
from cuda.radixsort_tpu.table import table


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(99)


@pytest.fixture(scope="module")
def mesh():
    return dsort.make_mesh()


def _oracle(part, order, vals, mask=None, descending=False):
    """Per-row dict of window results keyed by (part, row order position)."""
    n = len(part)
    if mask is None:
        mask = np.ones(n, bool)
    out = {}
    for p in np.unique(part[mask]):
        idx = np.flatnonzero(mask & (part == p))
        key = order[idx].astype(np.int64)
        perm = np.argsort(-key if descending else key, kind="stable")
        idx = idx[perm]
        rows = []
        rank = dense = 0
        csum = 0
        cmin, cmax = None, None
        prev_order = None
        for j, i in enumerate(idx):
            rn = j + 1
            if prev_order is None or order[i] != prev_order:
                rank = rn
                dense += 1
                prev_order = order[i]
            v = int(vals[i])
            csum += v
            cmin = v if cmin is None else min(cmin, v)
            cmax = v if cmax is None else max(cmax, v)
            lag = int(vals[idx[j - 1]]) if j > 0 else 0
            lead = int(vals[idx[j + 1]]) if j + 1 < len(idx) else 0
            rows.append((int(order[i]), rn, rank, dense, csum, cmin, cmax,
                         lag, lead, v))
        out[int(p)] = rows
    return out


OUTS = (("rn", None, "row_number"), ("rk", None, "rank"),
        ("dr", None, "dense_rank"), ("cs", "v", "cumsum"),
        ("cmn", "v", "cummin"), ("cmx", "v", "cummax"),
        ("lg", "v", "lag"), ("ld", "v", "lead"))


def _check_rows(part_s, wd, oracle, count):
    """Walk the sorted output rows and compare against the oracle rows."""
    got = {}
    for i in range(count):
        got.setdefault(int(part_s[i]), []).append(
            (int(wd["o"][i]), int(wd["rn"][i]), int(wd["rk"][i]),
             int(wd["dr"][i]), int(wd["cs"][i]), int(wd["cmn"][i]),
             int(wd["cmx"][i]), int(wd["lg"][i]), int(wd["ld"][i]),
             int(wd["v"][i])))
    assert set(got) == set(oracle)
    for p in oracle:
        assert got[p] == oracle[p], f"partition {p}"


def test_window_all_fns(rng):
    n = 4000
    part = rng.integers(0, 13, size=n).astype(np.uint32)
    order = rng.integers(0, 50, size=n).astype(np.uint32)  # ties exist
    vals = rng.integers(-20, 20, size=n).astype(np.int32)
    sp, so, sv, wc, cnt = window(
        jnp.asarray(part), jnp.asarray(order), {"v": jnp.asarray(vals)},
        OUTS)
    cnt = int(cnt)
    assert cnt == n
    oracle = _oracle(part, order, vals)
    wd = {k: np.asarray(v) for k, v in {**wc, "v": sv["v"],
                                        "o": so}.items()}
    _check_rows(np.asarray(sp), wd, oracle, cnt)


def test_window_valid_mask_and_descending(rng):
    n = 2000
    part = rng.integers(0, 7, size=n).astype(np.uint32)
    order = rng.integers(0, 30, size=n).astype(np.uint32)
    vals = rng.integers(0, 100, size=n).astype(np.int32)
    mask = rng.random(n) < 0.6
    sp, so, sv, wc, cnt = window(
        jnp.asarray(part), jnp.asarray(order), {"v": jnp.asarray(vals)},
        OUTS, valid=jnp.asarray(mask), descending=True)
    cnt = int(cnt)
    assert cnt == mask.sum()
    oracle = _oracle(part, order, vals, mask, descending=True)
    wd = {k: np.asarray(v) for k, v in {**wc, "v": sv["v"],
                                        "o": so}.items()}
    _check_rows(np.asarray(sp), wd, oracle, cnt)


def test_window_stability_ties(rng):
    """Equal (part, order) rows keep input order (stable struct sort):
    cumsum over a tie run must follow original positions."""
    part = np.zeros(6, np.uint32)
    order = np.array([5, 5, 5, 2, 2, 9], np.uint32)
    vals = np.array([1, 2, 3, 4, 5, 6], np.int32)
    sp, so, sv, wc, cnt = window(
        jnp.asarray(part), jnp.asarray(order), {"v": jnp.asarray(vals)},
        (("cs", "v", "cumsum"), ("rk", None, "rank")))
    np.testing.assert_array_equal(np.asarray(sv["v"]), [4, 5, 1, 2, 3, 6])
    np.testing.assert_array_equal(np.asarray(wc["cs"]),
                                  [4, 9, 10, 12, 15, 21])
    np.testing.assert_array_equal(np.asarray(wc["rk"]), [1, 1, 3, 3, 3, 6])


def test_query_window_single(rng):
    n = 1500
    part = rng.integers(0, 9, size=n).astype(np.uint32)
    order = rng.integers(0, 40, size=n).astype(np.uint32)
    vals = rng.integers(0, 50, size=n).astype(np.int32)
    t = table(p=jnp.asarray(part), o=jnp.asarray(order),
              v=jnp.asarray(vals))
    q = (Query(t)
         .where(lambda t: t["v"] > 10)
         .window("p", "o", {"rn": "row_number", "cs": ("v", "cumsum")}))
    out, cnt, stats = q.run()
    cnt = int(cnt)
    mask = vals > 10
    assert cnt == mask.sum()
    oracle = _oracle(part, order, vals, mask)
    for i in range(cnt):
        p = int(out["p"][i])
        row = [r for r in oracle[p]
               if r[1] == int(out["rn"][i])][0]
        assert row[4] == int(out["cs"][i])
    assert "window" in q.explain()


def test_query_window_distributed_matches_single(mesh, rng):
    n = 8 * 300 + 5
    part = rng.integers(0, 17, size=n).astype(np.uint32)
    order = rng.integers(0, 25, size=n).astype(np.uint32)
    vals = rng.integers(0, 9, size=n).astype(np.int32)
    t = table(p=jnp.asarray(part), o=jnp.asarray(order),
              v=jnp.asarray(vals))

    def plan(t):
        return Query(t).window(
            "p", "o", {"rn": "row_number", "rk": "rank",
                       "cs": ("v", "cumsum"), "lg": ("v", "lag")})

    so_, sc, _ = plan(t).run()
    sc = int(sc)
    single = {}
    for i in range(sc):
        single.setdefault(int(so_["p"][i]), []).append(
            (int(so_["o"][i]), int(so_["v"][i]), int(so_["rn"][i]),
             int(so_["rk"][i]), int(so_["cs"][i]), int(so_["lg"][i])))

    do, dcounts, _ = plan(t).run(mesh=mesh)
    dcounts = np.asarray(dcounts)
    dn = {k: np.asarray(do[k]) for k in ("p", "o", "v", "rn", "rk",
                                         "cs", "lg")}
    rows = dn["p"].shape[0] // dcounts.shape[0]
    dist = {}
    for d in range(dcounts.shape[0]):
        for i in range(d * rows, d * rows + dcounts[d]):
            dist.setdefault(int(dn["p"][i]), []).append(
                (int(dn["o"][i]), int(dn["v"][i]), int(dn["rn"][i]),
                 int(dn["rk"][i]), int(dn["cs"][i]), int(dn["lg"][i])))
    assert dist == single


def test_window_empty_and_single_row():
    e = jnp.zeros((0,), jnp.uint32)
    sp, so, sv, wc, cnt = window(e, e, {"v": jnp.zeros((0,), jnp.int32)},
                                 (("rn", None, "row_number"),))
    assert int(cnt) == 0 and wc["rn"].shape == (0,)
    one = jnp.asarray(np.array([3], np.uint32))
    v1 = jnp.asarray(np.array([7], np.int32))
    sp, so, sv, wc, cnt = window(one, one, {"v": v1}, OUTS)
    assert int(cnt) == 1
    assert int(wc["rn"][0]) == 1 and int(wc["cs"][0]) == 7
    assert int(wc["lg"][0]) == 0 and int(wc["ld"][0]) == 0


def test_table_window(rng):
    n = 800
    part = rng.integers(0, 5, size=n).astype(np.uint32)
    order = rng.integers(0, 100, size=n).astype(np.uint32)
    vals = rng.integers(0, 10, size=n).astype(np.int32)
    t = table(p=jnp.asarray(part), o=jnp.asarray(order),
              v=jnp.asarray(vals))
    t2 = t.window("p", "o", {"rn": "row_number", "cs": ("v", "cumsum")})
    assert set(t2.column_names) == {"p", "o", "v", "rn", "cs"}
    oracle = _oracle(part, order, vals)
    pn = np.asarray(t2["p"])
    for i in (0, n // 2, n - 1):
        row = [r for r in oracle[int(pn[i])]
               if r[1] == int(t2["rn"][i])][0]
        assert row[4] == int(t2["cs"][i])
    with pytest.raises(ValueError):
        t.window("p", "o", {"v": "row_number"})


def test_window_source_is_order_column(rng):
    """Running total over the column you ordered by (review fix): the
    order/partition columns are valid window sources."""
    part = np.array([1, 1, 1, 2, 2], np.uint32)
    amt = np.array([5, 3, 9, 2, 8], np.uint32)
    t = table(p=jnp.asarray(part), amt=jnp.asarray(amt))
    t2 = t.window("p", "amt", {"running": ("amt", "cumsum"),
                               "prevp": ("p", "lag")})
    np.testing.assert_array_equal(np.asarray(t2["amt"]), [3, 5, 9, 2, 8])
    np.testing.assert_array_equal(np.asarray(t2["running"]),
                                  [3, 8, 17, 2, 10])
    np.testing.assert_array_equal(np.asarray(t2["prevp"]), [0, 1, 1, 0, 2])
    # and through the Query plan
    out, cnt, _ = (Query(t)
                   .window("p", "amt", {"run2": ("amt", "cumsum")})
                   .run())
    np.testing.assert_array_equal(np.asarray(out["run2"]),
                                  [3, 8, 17, 2, 10])
