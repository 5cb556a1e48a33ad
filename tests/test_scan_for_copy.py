"""scan-by-key (ops/scan.py), DeviceScan *ByKey, DeviceReduce.ReduceByKey/
TransformReduce, DevicePartition.ThreeWay, DeviceCopy/DeviceMemcpy.Batched,
DeviceFor, thrust transform/scan-by-key/predicate family — numpy oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from cuda.radixsort_tpu import cub_compat as cub
from cuda.radixsort_tpu import thrust_compat as thrust
from cuda.radixsort_tpu.ops.scan import scan_by_key, segmented_scan


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(77)


def _runs(keys):
    """Yield (start, end) of each run of consecutive equal keys."""
    n = len(keys)
    s = 0
    for i in range(1, n + 1):
        if i == n or keys[i] != keys[i - 1]:
            yield s, i
            s = i


def _oracle_scan_by_key(keys, values, op, exclusive=False, init=0):
    out = np.zeros_like(values)
    for s, e in _runs(keys):
        seg = values[s:e]
        if exclusive:
            acc = init
            for j in range(s, e):
                out[j] = acc
                acc = op(acc, values[j])
        else:
            acc = seg[0]
            out[s] = acc
            for j in range(s + 1, e):
                acc = op(acc, values[j])
                out[j] = acc
    return out


def test_inclusive_sum_by_key(rng):
    n = 5000
    keys = np.sort(rng.integers(0, 200, size=n)).astype(np.int32)
    vals = rng.integers(-50, 50, size=n).astype(np.int32)
    got = np.asarray(scan_by_key(jnp.asarray(keys), jnp.asarray(vals)))
    want = _oracle_scan_by_key(keys, vals, lambda a, b: a + b)
    np.testing.assert_array_equal(got, want)


def test_exclusive_sum_by_key_unsorted_runs(rng):
    # keys need NOT be sorted: segments are runs of consecutive equals
    n = 4000
    keys = rng.integers(0, 5, size=n).astype(np.uint32)
    vals = rng.integers(0, 100, size=n).astype(np.int32)
    got = np.asarray(scan_by_key(jnp.asarray(keys), jnp.asarray(vals),
                                 exclusive=True))
    want = _oracle_scan_by_key(keys, vals, lambda a, b: a + b,
                               exclusive=True, init=0)
    np.testing.assert_array_equal(got, want)


def test_scan_by_key_min_max_prod(rng):
    n = 2000
    keys = rng.integers(0, 40, size=n).astype(np.int32)
    vals = rng.integers(1, 5, size=n).astype(np.int64)
    for op, f in (("min", min), ("max", max), ("prod", lambda a, b: a * b)):
        got = np.asarray(scan_by_key(jnp.asarray(keys),
                                     jnp.asarray(vals), op))
        want = _oracle_scan_by_key(keys, vals, f)
        np.testing.assert_array_equal(got, want, err_msg=op)


def test_scan_by_key_float_and_callable(rng):
    n = 1000
    keys = rng.integers(0, 25, size=n).astype(np.uint32)
    vals = rng.random(n).astype(np.float32)
    got = np.asarray(scan_by_key(jnp.asarray(keys), jnp.asarray(vals),
                                 jnp.add))
    want = _oracle_scan_by_key(keys, vals, lambda a, b: np.float32(a + b))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_exclusive_scan_by_key_init_per_segment(rng):
    n = 1200
    keys = rng.integers(0, 30, size=n).astype(np.int32)
    vals = rng.integers(0, 9, size=n).astype(np.int32)
    got = np.asarray(cub.DeviceScan.ExclusiveScanByKey(
        jnp.asarray(keys), jnp.asarray(vals), "max", 5))
    want = _oracle_scan_by_key(keys, vals, max, exclusive=True, init=5)
    np.testing.assert_array_equal(got, want)


def test_scan_by_key_tuple_keys_and_equality_op(rng):
    n = 800
    a = rng.integers(0, 4, size=n).astype(np.int32)
    b = rng.integers(0, 3, size=n).astype(np.int32)
    vals = rng.integers(0, 10, size=n).astype(np.int32)
    got = np.asarray(scan_by_key((jnp.asarray(a), jnp.asarray(b)),
                                 jnp.asarray(vals)))
    combo = a.astype(np.int64) * 10 + b
    want = _oracle_scan_by_key(combo, vals, lambda x, y: x + y)
    np.testing.assert_array_equal(got, want)
    # custom equality: all keys equal -> one global scan
    got2 = np.asarray(scan_by_key(
        jnp.asarray(a), jnp.asarray(vals),
        equality_op=lambda x, y: jnp.ones_like(x, bool)))
    np.testing.assert_array_equal(got2, np.cumsum(vals))


def test_segmented_scan_head_flags(rng):
    n = 600
    flags = rng.random(n) < 0.1
    vals = rng.integers(0, 10, size=n).astype(np.int32)
    got = np.asarray(segmented_scan(jnp.asarray(vals), jnp.asarray(flags)))
    # oracle via synthetic keys: segment id = cumsum of flags (pos 0 head)
    f = flags.copy()
    f[0] = True
    seg = np.cumsum(f) - 1
    want = _oracle_scan_by_key(seg, vals, lambda a, b: a + b)
    np.testing.assert_array_equal(got, want)


def test_inclusive_scan_init():
    x = jnp.asarray(np.array([3, 1, 4, 1, 5], np.int32))
    got = np.asarray(cub.DeviceScan.InclusiveScanInit(x, jnp.add, 10))
    np.testing.assert_array_equal(got, [13, 14, 18, 19, 24])


def test_device_scan_by_key_entry_points(rng):
    n = 700
    keys = rng.integers(0, 20, size=n).astype(np.uint32)
    vals = rng.integers(0, 50, size=n).astype(np.int32)
    inc = np.asarray(cub.DeviceScan.InclusiveSumByKey(
        jnp.asarray(keys), jnp.asarray(vals)))
    exc = np.asarray(cub.DeviceScan.ExclusiveSumByKey(
        jnp.asarray(keys), jnp.asarray(vals)))
    want_inc = _oracle_scan_by_key(keys, vals, lambda a, b: a + b)
    np.testing.assert_array_equal(inc, want_inc)
    np.testing.assert_array_equal(exc, want_inc - vals)
    mn = np.asarray(cub.DeviceScan.InclusiveScanByKey(
        jnp.asarray(keys), jnp.asarray(vals), "min"))
    np.testing.assert_array_equal(mn, _oracle_scan_by_key(keys, vals, min))


def test_reduce_by_key(rng):
    n = 3000
    keys = np.sort(rng.integers(0, 100, size=n)).astype(np.uint32)
    vals = rng.integers(-9, 9, size=n).astype(np.int32)
    uk, agg, cnt = cub.DeviceReduce.ReduceByKey(
        jnp.asarray(keys), jnp.asarray(vals))
    cnt = int(cnt)
    want = [(keys[s], vals[s:e].sum()) for s, e in _runs(keys)]
    assert cnt == len(want)
    np.testing.assert_array_equal(np.asarray(uk)[:cnt],
                                  [k for k, _ in want])
    np.testing.assert_array_equal(np.asarray(agg)[:cnt],
                                  [v for _, v in want])


def test_reduce_by_key_runs_not_groups(rng):
    # unsorted keys: each RUN reduces separately (thrust/CUB semantics)
    keys = np.array([7, 7, 3, 7, 7, 7, 3], np.uint32)
    vals = np.array([1, 2, 3, 4, 5, 6, 7], np.int32)
    uk, agg, cnt = cub.DeviceReduce.ReduceByKey(
        jnp.asarray(keys), jnp.asarray(vals), jnp.maximum)
    cnt = int(cnt)
    assert cnt == 4
    np.testing.assert_array_equal(np.asarray(uk)[:cnt], [7, 3, 7, 3])
    np.testing.assert_array_equal(np.asarray(agg)[:cnt], [2, 3, 6, 7])


def test_transform_reduce():
    x = jnp.asarray(np.array([1, -2, 3, -4], np.int32))
    got = cub.DeviceReduce.TransformReduce(
        x, jnp.add, lambda v: v * v, 0)
    assert int(got) == 30


def test_three_way_partition(rng):
    n = 5000
    x = rng.integers(0, 90, size=n).astype(np.int32)
    first, second, rest, nsel = cub.DevicePartition.ThreeWay(
        jnp.asarray(x), lambda v: v < 30, lambda v: v < 60)
    n1, n2 = int(nsel[0]), int(nsel[1])
    assert n1 == (x < 30).sum() and n2 == ((x >= 30) & (x < 60)).sum()
    np.testing.assert_array_equal(np.asarray(first)[:n1], x[x < 30])
    np.testing.assert_array_equal(np.asarray(second)[:n2],
                                  x[(x >= 30) & (x < 60)])
    n3 = n - n1 - n2
    np.testing.assert_array_equal(np.asarray(rest)[:n3], x[x >= 60])


def test_three_way_partition_overlapping_predicates(rng):
    # items matching BOTH predicates go to the first part (CUB contract)
    x = np.array([5, 50, 15, 80, 25], np.int32)
    first, second, rest, nsel = cub.DevicePartition.ThreeWay(
        jnp.asarray(x), lambda v: v < 30, lambda v: v < 90)
    assert (int(nsel[0]), int(nsel[1])) == (3, 2)
    np.testing.assert_array_equal(np.asarray(first)[:3], [5, 15, 25])
    np.testing.assert_array_equal(np.asarray(second)[:2], [50, 80])


def test_batched_copy(rng):
    src = rng.integers(0, 1000, size=200).astype(np.int32)
    dst = np.full(100, -1, np.int32)
    # three ragged ranges, given UNSORTED by dst offset
    so = np.array([10, 100, 50], np.int32)
    do = np.array([40, 0, 90], np.int32)
    sz = np.array([20, 30, 10], np.int32)
    out = np.asarray(cub.DeviceCopy.Batched(
        jnp.asarray(src), jnp.asarray(dst), so, do, sz))
    want = dst.copy()
    for s, d, z in zip(so, do, sz):
        want[d:d + z] = src[s:s + z]
    np.testing.assert_array_equal(out, want)
    out2 = np.asarray(cub.DeviceMemcpy.Batched(
        jnp.asarray(src), jnp.asarray(dst), so, do, sz))
    np.testing.assert_array_equal(out2, want)


def test_batched_copy_empty_and_zero_size():
    src = jnp.arange(10, dtype=jnp.int32)
    dst = jnp.zeros(5, jnp.int32)
    out = cub.DeviceCopy.Batched(src, dst, np.zeros(0, np.int32),
                                 np.zeros(0, np.int32), np.zeros(0, np.int32))
    np.testing.assert_array_equal(np.asarray(out), np.zeros(5))
    out2 = cub.DeviceCopy.Batched(src, dst, np.array([3], np.int32),
                                  np.array([1], np.int32),
                                  np.array([0], np.int32))
    np.testing.assert_array_equal(np.asarray(out2), np.zeros(5))


def test_device_for(rng):
    got = np.asarray(cub.DeviceFor.Bulk(6, lambda i: i * i))
    np.testing.assert_array_equal(got, [0, 1, 4, 9, 16, 25])
    x = jnp.asarray(np.arange(5, dtype=np.int32))
    np.testing.assert_array_equal(
        np.asarray(cub.DeviceFor.ForEach(x, lambda v: v + 1)),
        [1, 2, 3, 4, 5])
    np.testing.assert_array_equal(
        np.asarray(cub.DeviceFor.ForEachN(x, 3, lambda v: v * 2)),
        [0, 2, 4])
    grid = np.asarray(cub.DeviceFor.ForEachInExtents(
        (2, 3), lambda i, j: i * 10 + j))
    np.testing.assert_array_equal(grid, [[0, 1, 2], [10, 11, 12]])


def test_thrust_scan_by_key(rng):
    n = 900
    keys = rng.integers(0, 15, size=n).astype(np.int32)
    vals = rng.integers(0, 20, size=n).astype(np.int32)
    inc = np.asarray(thrust.inclusive_scan_by_key(
        jnp.asarray(keys), jnp.asarray(vals)))
    want = _oracle_scan_by_key(keys, vals, lambda a, b: a + b)
    np.testing.assert_array_equal(inc, want)
    exc = np.asarray(thrust.exclusive_scan_by_key(
        jnp.asarray(keys), jnp.asarray(vals), init=7))
    want_exc = _oracle_scan_by_key(keys, vals, lambda a, b: a + b,
                                   exclusive=True, init=7)
    np.testing.assert_array_equal(exc, want_exc)


def test_thrust_transform_family(rng):
    x = jnp.asarray(np.array([1, 2, 3, 4], np.int32))
    y = jnp.asarray(np.array([10, 20, 30, 40], np.int32))
    np.testing.assert_array_equal(
        np.asarray(thrust.transform(lambda a, b: a + b, x, y)),
        [11, 22, 33, 44])
    assert int(thrust.transform_reduce(x, lambda v: v * v, 0, jnp.add)) == 30
    np.testing.assert_array_equal(
        np.asarray(thrust.transform_inclusive_scan(x, lambda v: v * 2,
                                                   jnp.add)),
        [2, 6, 12, 20])
    np.testing.assert_array_equal(
        np.asarray(thrust.transform_exclusive_scan(x, lambda v: v * 2, 100,
                                                   jnp.add)),
        [100, 102, 106, 112])
    np.testing.assert_array_equal(np.asarray(thrust.tabulate(4, lambda i:
                                                             i * 3)),
                                  [0, 3, 6, 9])
    assert int(thrust.inner_product(x, y, 5)) == 305


def test_thrust_elementwise_and_predicates():
    x = jnp.asarray(np.array([3, 0, 5, 0, 7], np.int32))
    np.testing.assert_array_equal(np.asarray(thrust.fill(x, 9)),
                                  [9] * 5)
    np.testing.assert_array_equal(np.asarray(thrust.replace(x, 0, -1)),
                                  [3, -1, 5, -1, 7])
    np.testing.assert_array_equal(
        np.asarray(thrust.replace_if(x, lambda v: v > 4, 0)),
        [3, 0, 0, 0, 0])
    np.testing.assert_array_equal(
        np.asarray(thrust.adjacent_difference(x)), [3, -3, 5, -5, 7])
    np.testing.assert_array_equal(np.asarray(thrust.reverse(x)),
                                  [7, 0, 5, 0, 3])
    assert bool(thrust.any_of(x, lambda v: v == 5))
    assert not bool(thrust.all_of(x, lambda v: v > 0))
    assert bool(thrust.none_of(x, lambda v: v > 10))
    assert int(thrust.find(x, 5)) == 2
    assert int(thrust.find(x, 42)) == 5
    assert int(thrust.find_if(x, lambda v: v > 4)) == 2
    y = jnp.asarray(np.array([3, 0, 5, 1, 7], np.int32))
    assert int(thrust.mismatch(x, y)) == 3
    assert not bool(thrust.equal(x, y))
    assert bool(thrust.equal(x, x))
    np.testing.assert_array_equal(
        np.asarray(thrust.for_each(x, lambda v: v % 2)), [1, 0, 1, 0, 1])


def test_scan_by_key_edge_sizes():
    empty = jnp.zeros((0,), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(scan_by_key(empty, empty)), np.zeros((0,)))
    one = jnp.asarray(np.array([5], np.int32))
    np.testing.assert_array_equal(
        np.asarray(scan_by_key(one, one)), [5])
    np.testing.assert_array_equal(
        np.asarray(scan_by_key(one, one, exclusive=True)), [0])


def test_multi_histogram_even(rng):
    n = 5000
    px = rng.integers(0, 256, size=(n, 4)).astype(np.int32)
    hists = cub.DeviceHistogram.MultiHistogramEven(
        jnp.asarray(px), 17, 0, 256, num_active_channels=3)
    assert len(hists) == 3
    for c in range(3):
        want, _ = np.histogram(px[:, c], bins=16, range=(0, 256))
        np.testing.assert_array_equal(np.asarray(hists[c]), want)
    # flat interleaved input + per-channel levels
    flat = px.reshape(-1)
    hists2 = cub.DeviceHistogram.MultiHistogramEven(
        jnp.asarray(flat), [9, 5, 3], [0, 0, 128], [256, 128, 256],
        num_channels=4, num_active_channels=3)
    want0, _ = np.histogram(px[:, 0], bins=8, range=(0, 256))
    np.testing.assert_array_equal(np.asarray(hists2[0]), want0)
    want1, _ = np.histogram(px[:, 1][px[:, 1] < 128], bins=4,
                            range=(0, 128))
    np.testing.assert_array_equal(np.asarray(hists2[1]), want1)


def test_multi_histogram_range(rng):
    n = 3000
    px = rng.integers(0, 100, size=(n, 2)).astype(np.int32)
    levels = [np.array([0, 10, 50, 100], np.float32),
              np.array([0, 25, 100], np.float32)]
    hists = cub.DeviceHistogram.MultiHistogramRange(
        jnp.asarray(px), [4, 3], levels)
    for c, lv in enumerate(levels):
        want, _ = np.histogram(px[:, c], bins=lv)
        np.testing.assert_array_equal(np.asarray(hists[c]), want)


def test_flagged_if(rng):
    x = jnp.asarray(np.array([10, 20, 30, 40, 50], np.int32))
    flags = jnp.asarray(np.array([3, 0, 7, 2, 9], np.int32))
    out, cnt = cub.DeviceSelect.FlaggedIf(x, flags, lambda f: f > 2)
    cnt = int(cnt)
    assert cnt == 3
    np.testing.assert_array_equal(np.asarray(out)[:cnt], [10, 30, 50])


def test_batched_copy_zero_size_shadowing():
    """A zero-size buffer inside another buffer's dst range must not
    shadow it (review fix)."""
    src = jnp.asarray(np.array([1, 2, 3, 4], np.int32))
    dst = jnp.full((4,), -1, jnp.int32)
    so = np.array([0, 1], np.int32)
    do = np.array([0, 2], np.int32)
    sz = np.array([4, 0], np.int32)
    out = np.asarray(cub.DeviceCopy.Batched(src, dst, so, do, sz))
    np.testing.assert_array_equal(out, [1, 2, 3, 4])


def test_plain_scan_and_reduce_with(rng):
    from cuda.radixsort_tpu.ops.scan import plain_scan, reduce_with

    x = rng.integers(-50, 50, size=1237).astype(np.int64)
    got = np.asarray(plain_scan(jnp.asarray(x), jnp.minimum))
    np.testing.assert_array_equal(got, np.minimum.accumulate(x))
    got2 = np.asarray(plain_scan(jnp.asarray(x), "sum"))
    np.testing.assert_array_equal(got2, np.cumsum(x))
    assert int(reduce_with(jnp.asarray(x), jnp.maximum)) == x.max()
    assert int(reduce_with(jnp.asarray(x), jnp.add, 5)) == x.sum() + 5


def test_segmented_scan_signed_sum_and_doubling(rng):
    """Signed sums through the cumsum+gather path; min via the doubling
    path — both replaced associative_scan (compile-size review fix)."""
    n = 4096
    keys = rng.integers(0, 9, size=n).astype(np.uint32)
    vals = rng.integers(-1000, 1000, size=n).astype(np.int64)
    got = np.asarray(scan_by_key(jnp.asarray(keys), jnp.asarray(vals)))
    want = _oracle_scan_by_key(keys, vals, lambda a, b: a + b)
    np.testing.assert_array_equal(got, want)
    gmin = np.asarray(scan_by_key(jnp.asarray(keys), jnp.asarray(vals),
                                  "min"))
    np.testing.assert_array_equal(gmin, _oracle_scan_by_key(keys, vals,
                                                            min))


def test_decomposer_rejects_bit_window():
    hi = jnp.asarray(np.array([1, 0], np.uint32))
    with pytest.raises(ValueError):
        cub.DeviceRadixSort.SortKeys({"hi": hi}, begin_bit=8,
                                     decomposer=lambda k: (k["hi"],))
    # descending decomposer works
    (s,) = cub.DeviceRadixSort.SortKeysDescending(
        {"hi": hi}, decomposer=lambda k: (k["hi"],))
    np.testing.assert_array_equal(np.asarray(s), [1, 0])
