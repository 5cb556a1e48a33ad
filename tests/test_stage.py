"""Partition-stage kernel correctness (interpret mode on CPU) vs numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda.radixsort_tpu.kernels import histogram as hist_lib
from cuda.radixsort_tpu.kernels import stage as stage_lib

TILE = stage_lib.ROWS * 128


def _run_stage(keys_flat, shift, payload=None):
    n = keys_flat.shape[0]
    nrows = n // 128
    kp = jnp.asarray(keys_flat).reshape(nrows, 128)
    planes = [kp] + ([jnp.asarray(payload).reshape(nrows, 128)] if payload is not None else [])
    d = (keys_flat >> shift) & 15
    hist = np.bincount(d, minlength=16).astype(np.int32)
    gbase = jnp.asarray(np.cumsum(hist) - hist, dtype=jnp.int32)
    out = stage_lib.partition_stage(planes, gbase, shift=shift, interpret=True)
    return [np.asarray(o).reshape(-1) for o in out]


def _oracle(keys, shift, payload=None):
    d = (keys >> shift) & 15
    order = np.argsort(d, kind="stable")
    return keys[order], (payload[order] if payload is not None else None)


@pytest.mark.parametrize("ntiles,shift", [(1, 0), (2, 28)])
def test_partition_uniform(ntiles, shift):
    rng = np.random.default_rng(ntiles * 100 + shift)
    n = ntiles * TILE
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    got = _run_stage(keys, shift)[0]
    want, _ = _oracle(keys, shift)
    np.testing.assert_array_equal(got, want)


def test_partition_with_payload_stability():
    rng = np.random.default_rng(5)
    n = TILE
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    payload = np.arange(n, dtype=np.uint32)  # original index -> proves stability
    gk, gp = _run_stage(keys, 0, payload)
    want_k, want_p = _oracle(keys, 0, payload)
    np.testing.assert_array_equal(gk, want_k)
    np.testing.assert_array_equal(gp, want_p)


@pytest.mark.parametrize("case", ["constant", "two_vals", "skew90", "empty_buckets"])
def test_partition_skew(case):
    rng = np.random.default_rng(hash(case) % 2**31)
    n = TILE
    if case == "constant":
        keys = np.full(n, 0xABCD1234, dtype=np.uint32)
    elif case == "two_vals":
        keys = np.where(rng.random(n) < 0.5, 0x5, 0xF0000005).astype(np.uint32)
    elif case == "skew90":
        keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
        keys[: int(0.9 * n)] = 7
        rng.shuffle(keys)
    else:
        keys = (rng.integers(0, 2, size=n, dtype=np.uint32) * 8) << 0
    got = _run_stage(keys, 0)[0]
    want, _ = _oracle(keys, 0)
    np.testing.assert_array_equal(got, want)


def test_fused_histogram():
    rng = np.random.default_rng(9)
    n = 2 * TILE
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    kp = jnp.asarray(keys).reshape(n // 128, 128)
    got = np.asarray(hist_lib.digit_histograms(kp, interpret=True))
    for s in range(8):
        want = np.bincount((keys >> (4 * s)) & 15, minlength=16)
        np.testing.assert_array_equal(got[s], want, err_msg=f"stage {s}")
