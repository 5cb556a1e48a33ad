"""Radix select (kth_value / top_k) vs numpy oracles.

Oracle per SURVEY.md §4: np.sort / np.argsort ground truth; ties resolved by
original position (stability contract of the underlying filter + sort_pairs).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda.radixsort_tpu.ops.select import kth_value, top_k


def _data(dtype, n, rng):
    if dtype == np.float32:
        x = rng.standard_normal(n).astype(np.float32)
        x[:: max(n // 7, 1)] = [0.0, -0.0, np.inf, -np.inf][0]
        return x
    info = np.iinfo(dtype)
    return rng.integers(info.min, info.max, n, dtype=dtype, endpoint=True)


@pytest.mark.parametrize("dtype", [np.uint32, np.int32, np.float32, np.uint64])
@pytest.mark.parametrize("n", [1, 255, 5000])
def test_kth_value(dtype, n):
    rng = np.random.default_rng(7)
    x = _data(dtype, n, rng)
    xs = np.sort(x)
    xj = jnp.asarray(x)
    for k in sorted({0, n // 3, n - 1}):
        assert np.asarray(kth_value(xj, k)) == xs[k]
        assert np.asarray(kth_value(xj, k, largest=True)) == xs[::-1][k]


def test_kth_value_duplicates():
    x = np.full(1000, 42, np.uint32)
    assert np.asarray(kth_value(jnp.asarray(x), 500)) == 42


@pytest.mark.parametrize("dtype", [np.uint32, np.float32])
@pytest.mark.parametrize("largest", [True, False])
def test_top_k(dtype, largest):
    rng = np.random.default_rng(3)
    x = _data(dtype, 4096, rng)
    k = 100
    v, i = top_k(jnp.asarray(x), k, largest=largest)
    order = np.argsort(x, kind="stable")
    if largest:
        # k largest, descending, ties by original position
        want = np.sort(x)[::-1][:k]
    else:
        want = np.sort(x)[:k]
    assert np.array_equal(np.asarray(v), want)
    assert np.array_equal(x[np.asarray(i)], np.asarray(v))
    assert len(set(np.asarray(i).tolist())) == k  # distinct source rows


def test_top_k_ties_fill():
    # more threshold ties than slots: exactly k survivors, earliest positions
    x = np.array([5, 3, 3, 3, 3, 1, 9], np.uint32)
    v, i = top_k(jnp.asarray(x), 4, largest=False)
    assert np.array_equal(np.asarray(v), [1, 3, 3, 3])
    assert np.array_equal(np.asarray(i), [5, 1, 2, 3])
