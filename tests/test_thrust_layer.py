"""L5 surface: thrust_compat container API, comparator sort, DeviceMergeSort.

Oracle strategy (SURVEY §4): numpy stable sorts / lexsort / searchsorted as
ground truth; struct keys via lexsort on negated columns for mixed orders.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cuda.radixsort_tpu import thrust_compat as thrust
from cuda.radixsort_tpu.cub_compat import DeviceMergeSort
from cuda.radixsort_tpu.ops.comparator_sort import (
    comparator_argsort,
    comparator_sort,
    greater,
    less,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(20260817)


# ---------------------------------------------------------------------------
# comparator network
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [2, 3, 257, 1001, 4096])
def test_comparator_sort_matches_numpy(rng, n):
    x = rng.integers(0, 97, size=n, dtype=np.uint32)  # heavy duplicates
    out = comparator_sort(jnp.asarray(x), less)
    np.testing.assert_array_equal(np.asarray(out), np.sort(x))


def test_comparator_sort_stability(rng):
    x = rng.integers(0, 13, size=1500, dtype=np.int32)
    ok, ov = comparator_sort(jnp.asarray(x), less,
                             values=jnp.arange(1500, dtype=jnp.int32))
    ok, ov = np.asarray(ok), np.asarray(ov)
    np.testing.assert_array_equal(ok, np.sort(x))
    for k in np.unique(x):
        assert np.all(np.diff(ov[ok == k]) > 0), "equal keys reordered"


def test_comparator_sort_struct_key_mixed_order(rng):
    a = rng.integers(0, 6, size=913).astype(np.int32)
    b = rng.integers(0, 500, size=913).astype(np.int32)

    def comp(x, y):  # a descending, then b ascending
        return (x["a"] > y["a"]) | ((x["a"] == y["a"]) & (x["b"] < y["b"]))

    out = comparator_sort({"a": jnp.asarray(a), "b": jnp.asarray(b)}, comp)
    order = np.lexsort((b, -a))
    np.testing.assert_array_equal(np.asarray(out["a"]), a[order])
    np.testing.assert_array_equal(np.asarray(out["b"]), b[order])


def test_comparator_sort_float_custom_order(rng):
    # order by |x| — a genuinely non-radix order
    x = rng.normal(size=777).astype(np.float32)
    out = comparator_sort(jnp.asarray(x), lambda a, b: jnp.abs(a) < jnp.abs(b))
    np.testing.assert_array_equal(
        np.abs(np.asarray(out)), np.sort(np.abs(x)))


def test_comparator_sort_2d_payload_jit(rng):
    k = jnp.asarray(rng.integers(0, 2**32, size=512, dtype=np.uint32))
    v = jnp.arange(1024, dtype=jnp.float32).reshape(512, 2)
    ok, ov = jax.jit(
        lambda kk, vv: comparator_sort(kk, less, values=vv))(k, v)
    o = np.argsort(np.asarray(k), kind="stable")
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(k)[o])
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(v)[o])


def test_comparator_argsort(rng):
    x = rng.integers(0, 40, size=640, dtype=np.uint32)
    perm = comparator_argsort(jnp.asarray(x), less)
    np.testing.assert_array_equal(
        np.asarray(perm), np.argsort(x, kind="stable"))


# ---------------------------------------------------------------------------
# DeviceMergeSort
# ---------------------------------------------------------------------------


def test_device_merge_sort_primitive_routes(rng):
    x = rng.integers(0, 2**32, size=2048, dtype=np.uint32)
    np.testing.assert_array_equal(
        np.asarray(DeviceMergeSort.SortKeys(jnp.asarray(x))), np.sort(x))
    np.testing.assert_array_equal(
        np.asarray(DeviceMergeSort.SortKeys(jnp.asarray(x),
                                            compare_op=greater)),
        np.sort(x)[::-1])


def test_device_merge_sort_custom_comparator(rng):
    x = rng.integers(0, 1000, size=700).astype(np.int32)
    out = DeviceMergeSort.StableSortKeys(
        jnp.asarray(x), compare_op=lambda a, b: (a % 10) < (b % 10))
    got = np.asarray(out)
    oracle = x[np.argsort(x % 10, kind="stable")]
    np.testing.assert_array_equal(got, oracle)


def test_device_merge_sort_stable_pairs(rng):
    x = rng.integers(0, 7, size=900).astype(np.uint32)
    ok, ov = DeviceMergeSort.StableSortPairs(
        jnp.asarray(x), jnp.arange(900, dtype=jnp.int32),
        compare_op=lambda a, b: a < b)
    o = np.argsort(x, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok), x[o])
    np.testing.assert_array_equal(np.asarray(ov), o)


# ---------------------------------------------------------------------------
# thrust layer
# ---------------------------------------------------------------------------


def test_thrust_sort_routing(rng):
    x = rng.integers(0, 2**32, size=3000, dtype=np.uint32)
    np.testing.assert_array_equal(np.asarray(thrust.sort(jnp.asarray(x))),
                                  np.sort(x))
    np.testing.assert_array_equal(
        np.asarray(thrust.sort(jnp.asarray(x), comp=greater)),
        np.sort(x)[::-1])
    # custom comparator goes through the network
    got = thrust.stable_sort(jnp.asarray(x),
                             comp=lambda a, b: (a & 0xFF) < (b & 0xFF))
    np.testing.assert_array_equal(np.asarray(got) & 0xFF,
                                  np.sort(x & 0xFF))


def test_thrust_sort_by_key_variants(rng):
    k = rng.integers(0, 50, size=1200, dtype=np.uint32)
    v = rng.integers(0, 2**31, size=1200).astype(np.int32)
    ok, ov = thrust.stable_sort_by_key(jnp.asarray(k), jnp.asarray(v))
    o = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok), k[o])
    np.testing.assert_array_equal(np.asarray(ov), v[o])
    # pytree payload (zip_iterator analogue)
    ok, ovt = thrust.sort_by_key(
        jnp.asarray(k), {"v": jnp.asarray(v),
                         "w": jnp.asarray(v.astype(np.float32))})
    np.testing.assert_array_equal(np.asarray(ovt["v"]), v[o])
    np.testing.assert_array_equal(np.asarray(ovt["w"]),
                                  v.astype(np.float32)[o])


def test_thrust_sort_by_key_2d_values(rng):
    """2-D value leaves: narrow 4-byte columns ((N, 3) points) split into
    per-column planes and ride the sort; wide (N, 16) leaves take the
    argsort + take(axis=0) fallback (r5). Keys are a permutation —
    strictly unique — so stable and unstable orders coincide and the
    asserts are exact by contract, not by luck."""
    n = 700
    k = rng.permutation(np.arange(1000, dtype=np.uint32))[:n]
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    o = np.argsort(k, kind="stable")
    ok, opts = thrust.sort_by_key(jnp.asarray(k), jnp.asarray(pts))
    np.testing.assert_array_equal(np.asarray(ok), k[o])
    np.testing.assert_array_equal(np.asarray(opts), pts[o])
    # mixed pytree: one flat leaf, one 2-D leaf (split-plane route)
    v = rng.integers(0, 2**31, size=n).astype(np.int32)
    ok, ovt = thrust.stable_sort_by_key(
        jnp.asarray(k), {"v": jnp.asarray(v), "pts": jnp.asarray(pts)})
    np.testing.assert_array_equal(np.asarray(ovt["v"]), v[o])
    np.testing.assert_array_equal(np.asarray(ovt["pts"]), pts[o])
    # wide leaf (N, 16) exceeds the split cap -> argsort+take fallback
    wide = rng.standard_normal((n, 16)).astype(np.float32)
    ok, ow = thrust.sort_by_key(jnp.asarray(k), jnp.asarray(wide))
    np.testing.assert_array_equal(np.asarray(ok), k[o])
    np.testing.assert_array_equal(np.asarray(ow), wide[o])
    # 8-byte 2-D leaf also falls back
    w64 = rng.integers(-2**60, 2**60, size=(n, 2), dtype=np.int64)
    ok, o64 = thrust.sort_by_key(jnp.asarray(k), jnp.asarray(w64))
    np.testing.assert_array_equal(np.asarray(o64), w64[o])


def test_thrust_is_sorted(rng):
    x = np.sort(rng.integers(0, 100, size=500, dtype=np.uint32))
    assert bool(thrust.is_sorted(jnp.asarray(x)))
    y = x.copy()
    y[123] = 0xFFFFFFFF
    assert not bool(thrust.is_sorted(jnp.asarray(y)))
    assert int(thrust.is_sorted_until(jnp.asarray(y))) == 124
    assert int(thrust.is_sorted_until(jnp.asarray(x))) == 500


def test_thrust_merge_and_unique(rng):
    a = np.sort(rng.integers(0, 1000, size=300, dtype=np.uint32))
    b = np.sort(rng.integers(0, 1000, size=170, dtype=np.uint32))
    m = thrust.merge(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(m),
                                  np.sort(np.concatenate([a, b]),
                                          kind="stable"))
    uk, cnt = thrust.unique(jnp.asarray(np.sort(a)))
    u = np.unique(a)
    assert int(cnt) == u.shape[0]
    np.testing.assert_array_equal(np.asarray(uk)[: int(cnt)], u)
    assert int(thrust.unique_count(jnp.asarray(np.sort(a)))) == u.shape[0]


def test_thrust_partition_family(rng):
    x = rng.integers(0, 1000, size=803, dtype=np.int32)
    pred = lambda v: v % 3 == 0  # noqa: E731
    out, cnt = thrust.stable_partition(jnp.asarray(x), pred)
    cnt = int(cnt)
    mask = x % 3 == 0
    np.testing.assert_array_equal(np.asarray(out)[:cnt], x[mask])
    np.testing.assert_array_equal(np.asarray(out)[cnt:], x[~mask])
    kept, kc = thrust.copy_if(jnp.asarray(x), pred)
    np.testing.assert_array_equal(np.asarray(kept)[: int(kc)], x[mask])
    rem, rc = thrust.remove_if(jnp.asarray(x), pred)
    np.testing.assert_array_equal(np.asarray(rem)[: int(rc)], x[~mask])
    t, f, c = thrust.partition_copy(jnp.asarray(x), pred)
    np.testing.assert_array_equal(np.asarray(t)[: int(c)], x[mask])
    assert int(thrust.partition_point(jnp.asarray(np.asarray(out)), pred)) \
        == cnt


def test_thrust_reduce_scan_count(rng):
    x = rng.integers(0, 100, size=611).astype(np.int64)
    assert int(thrust.reduce(jnp.asarray(x))) == int(x.sum())
    assert int(thrust.reduce(jnp.asarray(x), init=5,
                             binary_op=jnp.maximum)) == max(5, int(x.max()))
    np.testing.assert_array_equal(np.asarray(thrust.inclusive_scan(
        jnp.asarray(x))), np.cumsum(x))
    np.testing.assert_array_equal(
        np.asarray(thrust.exclusive_scan(jnp.asarray(x), init=7)),
        np.cumsum(x) - x + 7)
    assert int(thrust.count(jnp.asarray(x), 42)) == int((x == 42).sum())
    assert int(thrust.count_if(jnp.asarray(x), lambda v: v > 50)) == \
        int((x > 50).sum())


def test_thrust_reduce_by_key(rng):
    k = np.repeat(np.array([3, 3, 7, 1, 1, 1, 9], dtype=np.uint32),
                  rng.integers(1, 5, size=7))
    v = rng.integers(0, 100, size=k.shape[0]).astype(np.int32)
    uk, red, cnt = thrust.reduce_by_key(jnp.asarray(k), jnp.asarray(v))
    cnt = int(cnt)
    # numpy oracle: run-based reduction
    starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
    ends = np.concatenate([starts[1:], [k.shape[0]]])
    np.testing.assert_array_equal(np.asarray(uk)[:cnt], k[starts])
    np.testing.assert_array_equal(
        np.asarray(red)[:cnt],
        np.array([v[s:e].sum() for s, e in zip(starts, ends)]))
    _, mn, _ = thrust.reduce_by_key(jnp.asarray(k), jnp.asarray(v),
                                    binary_op="min")
    np.testing.assert_array_equal(
        np.asarray(mn)[:cnt],
        np.array([v[s:e].min() for s, e in zip(starts, ends)]))


def test_thrust_gather_scatter_sequence_bounds(rng):
    src = rng.integers(0, 1000, size=64).astype(np.int32)
    perm = rng.permutation(64).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(thrust.gather(jnp.asarray(perm), jnp.asarray(src))),
        src[perm])
    sc = thrust.scatter(jnp.asarray(src), jnp.asarray(perm), 64)
    oracle = np.zeros(64, np.int32)
    oracle[perm] = src
    np.testing.assert_array_equal(np.asarray(sc), oracle)
    np.testing.assert_array_equal(np.asarray(thrust.sequence(5, 3, 2)),
                                  np.array([3, 5, 7, 9, 11]))
    s = np.sort(rng.integers(0, 50, size=200, dtype=np.uint32))
    q = rng.integers(0, 50, size=37, dtype=np.uint32)
    np.testing.assert_array_equal(
        np.asarray(thrust.lower_bound(jnp.asarray(s), jnp.asarray(q))),
        np.searchsorted(s, q, side="left"))
    np.testing.assert_array_equal(
        np.asarray(thrust.upper_bound(jnp.asarray(s), jnp.asarray(q))),
        np.searchsorted(s, q, side="right"))
    np.testing.assert_array_equal(
        np.asarray(thrust.binary_search(jnp.asarray(s), jnp.asarray(q))),
        np.isin(q, s))
    # descending bounds
    sd = s[::-1].copy()
    got = np.asarray(thrust.lower_bound(jnp.asarray(sd), jnp.asarray(q),
                                        comp=thrust.greater))
    ora = np.array([np.searchsorted(-sd.astype(np.int64),
                                    -np.int64(x), side="left")
                    for x in q])
    np.testing.assert_array_equal(got, ora)


def test_thrust_extrema(rng):
    x = rng.integers(0, 30, size=400).astype(np.int32)
    assert int(thrust.min_element(jnp.asarray(x))) == int(np.argmin(x))
    assert int(thrust.max_element(jnp.asarray(x))) == int(np.argmax(x))
    comp = lambda a, b: (a % 7) < (b % 7)  # noqa: E731
    mod = x % 7
    assert int(thrust.min_element(jnp.asarray(x), comp)) == \
        int(np.argmin(mod))
    assert int(thrust.max_element(jnp.asarray(x), comp)) == \
        int(np.argmax(mod))
