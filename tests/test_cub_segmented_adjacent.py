"""cub_compat: DeviceSegmentedReduce / DeviceSegmentedSort /
DeviceAdjacentDifference oracle tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from cuda.radixsort_tpu.cub_compat import (
    DeviceAdjacentDifference,
    DeviceSegmentedReduce,
    DeviceSegmentedSort,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(99)


def _contig_offsets(rng, n, ns):
    cuts = np.sort(rng.choice(np.arange(1, n), size=ns - 1, replace=False))
    return np.concatenate([[0], cuts, [n]]).astype(np.int32)


def test_segmented_reduce_contiguous(rng):
    n, ns = 4000, 37
    offs = _contig_offsets(rng, n, ns)
    x = rng.integers(0, 100, size=n).astype(np.int32)
    sums = DeviceSegmentedReduce.Sum(jnp.asarray(x), ns, jnp.asarray(offs))
    mins = DeviceSegmentedReduce.Min(jnp.asarray(x), ns, jnp.asarray(offs))
    maxs = DeviceSegmentedReduce.Max(jnp.asarray(x), ns, jnp.asarray(offs))
    for i in range(ns):
        seg = x[offs[i]: offs[i + 1]]
        assert int(np.asarray(sums)[i]) == int(seg.sum())
        assert int(np.asarray(mins)[i]) == int(seg.min())
        assert int(np.asarray(maxs)[i]) == int(seg.max())


def test_segmented_reduce_gaps_and_empty(rng):
    # CUB-style separate begin/end: gaps between segments and an empty one
    x = rng.integers(0, 50, size=100).astype(np.int32)
    begin = np.array([5, 30, 60, 60], np.int32)
    end = np.array([20, 30, 90, 60], np.int32)  # segment 1 and 3 empty
    sums = np.asarray(DeviceSegmentedReduce.Sum(
        jnp.asarray(x), 4, jnp.asarray(begin), jnp.asarray(end)))
    assert sums[0] == x[5:20].sum()
    assert sums[1] == 0
    assert sums[2] == x[60:90].sum()
    assert sums[3] == 0


def test_segmented_sort_alias(rng):
    n, ns = 2048, 9
    offs = _contig_offsets(rng, n, ns)
    x = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    out = np.asarray(DeviceSegmentedSort.StableSortKeys(
        jnp.asarray(x), num_segments=ns, d_begin_offsets=jnp.asarray(offs)))
    oracle = np.concatenate([np.sort(x[offs[i]: offs[i + 1]])
                             for i in range(ns)])
    np.testing.assert_array_equal(out, oracle)


def test_adjacent_difference(rng):
    x = rng.integers(0, 1000, size=513).astype(np.int32)
    left = np.asarray(DeviceAdjacentDifference.SubtractLeftCopy(
        jnp.asarray(x)))
    np.testing.assert_array_equal(left[0], x[0])
    np.testing.assert_array_equal(left[1:], x[1:] - x[:-1])
    right = np.asarray(DeviceAdjacentDifference.SubtractRightCopy(
        jnp.asarray(x)))
    np.testing.assert_array_equal(right[-1], x[-1])
    np.testing.assert_array_equal(right[:-1], x[:-1] - x[1:])
    # custom difference_op
    m = np.asarray(DeviceAdjacentDifference.SubtractLeftCopy(
        jnp.asarray(x), difference_op=jnp.maximum))
    np.testing.assert_array_equal(m[1:], np.maximum(x[1:], x[:-1]))
