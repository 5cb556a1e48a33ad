"""Segmented sort tests (CUB DeviceSegmentedRadixSort parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

import cuda.radixsort_tpu as rs

CFG = rs.SortConfig(engine="xla")


def _oracle(keys, offsets, descending=False):
    out = keys.copy()
    for s in range(len(offsets) - 1):
        seg = np.sort(keys[offsets[s]:offsets[s+1]], kind="stable")
        out[offsets[s]:offsets[s+1]] = seg[::-1] if descending else seg
    return out


@pytest.mark.parametrize("dtype", [np.uint32, np.int32, np.float32])
def test_segmented_random(dtype):
    rng = np.random.default_rng(31)
    n, nseg = 30_000, 57
    cuts = np.sort(rng.choice(n, size=nseg - 1, replace=False))
    offsets = np.concatenate([[0], cuts, [n]]).astype(np.int32)
    if dtype == np.float32:
        keys = rng.standard_normal(n).astype(np.float32)
    else:
        keys = rng.integers(0, 2**31, size=n).astype(dtype)
    got = np.asarray(rs.segmented_sort(jnp.asarray(keys), jnp.asarray(offsets),
                                       config=CFG))
    np.testing.assert_array_equal(got, _oracle(keys, offsets))


def test_segmented_pairs_empty_segments():
    rng = np.random.default_rng(32)
    n = 10_000
    # offsets with empty segments and a full-array segment boundary
    offsets = np.array([0, 0, 1000, 1000, 1000, 9999, n, n], dtype=np.int32)
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    vals = np.arange(n, dtype=np.int32)
    gk, gv = rs.segmented_sort(jnp.asarray(keys), jnp.asarray(offsets),
                               jnp.asarray(vals), config=CFG)
    gk, gv = np.asarray(gk), np.asarray(gv)
    np.testing.assert_array_equal(gk, _oracle(keys, offsets))
    for s in range(len(offsets) - 1):
        lo, hi = offsets[s], offsets[s+1]
        order = np.argsort(keys[lo:hi], kind="stable")
        np.testing.assert_array_equal(gv[lo:hi], (vals[lo:hi])[order])


def test_segmented_descending():
    rng = np.random.default_rng(33)
    n = 5000
    offsets = np.array([0, 2000, n], dtype=np.int32)
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    got = np.asarray(rs.segmented_sort(jnp.asarray(keys), jnp.asarray(offsets),
                                       descending=True, config=CFG))
    np.testing.assert_array_equal(got, _oracle(keys, offsets, descending=True))


def test_segmented_sort_bit_range():
    """cub::DeviceSegmentedRadixSort's begin_bit/end_bit (r5): ordering uses
    only the key bit subrange (stable elsewhere); out-of-range bits survive
    untouched. The segment limb always participates fully."""
    import cuda.radixsort_tpu as rs
    from cuda.radixsort_tpu.cub_compat import DeviceSegmentedRadixSort

    rng = np.random.default_rng(21)
    n = 4096
    offs = np.sort(rng.choice(np.arange(1, n), 20, replace=False))
    offsets = np.concatenate([[0], offs, [n]]).astype(np.int32)
    k = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    v = np.arange(n, dtype=np.int32)

    got = np.asarray(rs.segmented_sort(jnp.asarray(k), jnp.asarray(offsets),
                                       end_bit=8))
    want = k.copy()
    for s in range(len(offsets) - 1):
        seg = k[offsets[s]:offsets[s + 1]]
        want[offsets[s]:offsets[s + 1]] = seg[np.argsort(seg & 0xFF,
                                                         kind="stable")]
    np.testing.assert_array_equal(got, want)

    ok, ov = DeviceSegmentedRadixSort.SortPairs(
        jnp.asarray(k), jnp.asarray(v), num_segments=len(offsets) - 1,
        d_begin_offsets=jnp.asarray(offsets), begin_bit=8, end_bit=16)
    wk, wv = k.copy(), v.copy()
    for s in range(len(offsets) - 1):
        seg = k[offsets[s]:offsets[s + 1]]
        o = np.argsort((seg >> 8) & 0xFF, kind="stable")
        wk[offsets[s]:offsets[s + 1]] = seg[o]
        wv[offsets[s]:offsets[s + 1]] = v[offsets[s]:offsets[s + 1]][o]
    np.testing.assert_array_equal(np.asarray(ok), wk)
    np.testing.assert_array_equal(np.asarray(ov), wv)
