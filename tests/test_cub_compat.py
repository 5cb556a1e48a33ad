"""CUB-shaped API surface (DeviceRadixSort / DeviceSegmentedRadixSort)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda.radixsort_tpu.cub_compat import (
    DeviceRadixSort, DeviceSegmentedRadixSort, DoubleBuffer,
)


def _keys(n=20_000, seed=0, hi=2**32):
    rng = np.random.default_rng(seed)
    return rng.integers(0, hi, size=n, dtype=np.uint64).astype(np.uint32)


def test_sort_keys_and_descending():
    k = _keys()
    out = np.asarray(DeviceRadixSort.SortKeys(jnp.asarray(k)))
    np.testing.assert_array_equal(out, np.sort(k))
    out = np.asarray(DeviceRadixSort.SortKeysDescending(jnp.asarray(k)))
    np.testing.assert_array_equal(out, np.sort(k)[::-1])


def test_sort_pairs_bit_range():
    k = _keys(10_000, 1, hi=2**20)
    v = np.arange(10_000, dtype=np.int32)
    ok, ov = DeviceRadixSort.SortPairs(
        jnp.asarray(k), jnp.asarray(v), begin_bit=4, end_bit=12)
    o = np.argsort((k >> 4) & 0xFF, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok), k[o])
    np.testing.assert_array_equal(np.asarray(ov), v[o])


def test_double_buffer_selector():
    k = _keys(5000, 2)
    buf = DoubleBuffer(jnp.asarray(k))
    out = DeviceRadixSort.SortKeys(buf)
    assert out is buf
    np.testing.assert_array_equal(np.asarray(buf.current()), np.sort(k))
    np.testing.assert_array_equal(np.asarray(buf.alternate()), k)


def test_num_items_mismatch_raises():
    k = _keys(1000, 3)
    with pytest.raises(ValueError):
        DeviceRadixSort.SortKeys(jnp.asarray(k), num_items=999)


def test_segmented_keys_and_pairs():
    rng = np.random.default_rng(4)
    n, nseg = 1 << 14, 16
    k = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    v = np.arange(n, dtype=np.int32)
    offs = np.linspace(0, n, nseg + 1).astype(np.int32)
    out = np.asarray(DeviceSegmentedRadixSort.SortKeys(
        jnp.asarray(k), num_segments=nseg,
        d_begin_offsets=jnp.asarray(offs)))
    want = np.sort(k.reshape(nseg, -1), axis=1).reshape(-1)
    np.testing.assert_array_equal(out, want)

    ok, ov = DeviceSegmentedRadixSort.SortPairs(
        jnp.asarray(k), jnp.asarray(v), num_segments=nseg,
        d_begin_offsets=jnp.asarray(offs))
    np.testing.assert_array_equal(np.asarray(ok), want)
    kk, vv = k.reshape(nseg, -1), v.reshape(nseg, -1)
    want_v = np.concatenate(
        [vv[i][np.argsort(kk[i], kind="stable")] for i in range(nseg)])
    np.testing.assert_array_equal(np.asarray(ov), want_v)


def test_compat_float_keys_and_pairs_buffer():
    rng = np.random.default_rng(6)
    f = rng.standard_normal(8000).astype(np.float32)
    f[:10] = -0.0
    f[10:20] = 0.0
    out = np.asarray(DeviceRadixSort.SortKeys(jnp.asarray(f)))
    np.testing.assert_array_equal(out, np.sort(f))
    v = np.arange(8000, dtype=np.int32)
    kb, vb = DoubleBuffer(jnp.asarray(f)), DoubleBuffer(jnp.asarray(v))
    DeviceRadixSort.SortPairsDescending(kb, vb)
    o = np.argsort(-f, kind="stable")
    np.testing.assert_array_equal(np.asarray(kb.current()), f[o])
    np.testing.assert_array_equal(np.asarray(vb.current()), v[o])
