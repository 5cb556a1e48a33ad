"""Pallas segmented-scan kernel (kernels/scan.py) vs the XLA formulation,
interpret mode (CPU CI; hardware numbers via scripts/hw_recheck.sh)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cuda.radixsort_tpu.kernels.scan import segmented_scan_pallas
from cuda.radixsort_tpu.ops.scan import segmented_scan


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("op", ["sum", "min", "max"])
def test_kernel_matches_xla(rng, op):
    for n in (1, 127, 128, 4096, 4097, 3 * 4096 + 5):
        v = rng.integers(-999, 999, size=n).astype(np.int32)
        fl = rng.random(n) < 0.03
        got = np.asarray(segmented_scan_pallas(
            jnp.asarray(v), jnp.asarray(fl), op, interpret=True))
        want = np.asarray(segmented_scan(jnp.asarray(v), jnp.asarray(fl),
                                         op))
        np.testing.assert_array_equal(got, want, err_msg=f"n={n} op={op}")


def test_kernel_float_and_long_runs(rng):
    n = 3 * 4096
    v = rng.standard_normal(n).astype(np.float32)
    # one giant run spanning many tiles: the cross-tile carry chain
    fl = np.zeros(n, bool)
    got = np.asarray(segmented_scan_pallas(
        jnp.asarray(v), jnp.asarray(fl), "sum", interpret=True))
    want = np.asarray(segmented_scan(jnp.asarray(v), jnp.asarray(fl),
                                     "sum"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)
    got2 = np.asarray(segmented_scan_pallas(
        jnp.asarray(v), jnp.asarray(fl), "max", interpret=True))
    np.testing.assert_array_equal(got2, np.maximum.accumulate(v))


def test_kernel_heads_at_tile_boundaries(rng):
    n = 4 * 4096
    v = rng.integers(0, 9, size=n).astype(np.int32)
    fl = np.zeros(n, bool)
    fl[4096::4096] = True  # heads exactly at tile boundaries
    got = np.asarray(segmented_scan_pallas(
        jnp.asarray(v), jnp.asarray(fl), "sum", interpret=True))
    want = np.asarray(segmented_scan(jnp.asarray(v), jnp.asarray(fl),
                                     "sum"))
    np.testing.assert_array_equal(got, want)


def test_kernel_empty():
    e = jnp.zeros((0,), jnp.int32)
    out = segmented_scan_pallas(e, jnp.zeros((0,), bool), interpret=True)
    assert out.shape == (0,)


def test_engine_knob_on_public_op(rng):
    n = 9000
    v = rng.integers(-50, 50, size=n).astype(np.int32)
    fl = rng.random(n) < 0.02
    a = np.asarray(segmented_scan(jnp.asarray(v), jnp.asarray(fl), "sum"))
    b = np.asarray(segmented_scan(jnp.asarray(v), jnp.asarray(fl), "sum",
                                  engine="pallas"))
    np.testing.assert_array_equal(a, b)


def test_window_scan_engine_knob(rng):
    from cuda.radixsort_tpu.ops.window import window

    n = 6000
    part = rng.integers(0, 7, size=n).astype(np.uint32)
    order = rng.integers(0, 1000, size=n).astype(np.uint32)
    v = rng.integers(0, 9, size=n).astype(np.int32)
    spec = (("cs", "v", "cumsum"), ("cmx", "v", "cummax"))
    a = window(jnp.asarray(part), jnp.asarray(order),
               {"v": jnp.asarray(v)}, spec)
    b = window(jnp.asarray(part), jnp.asarray(order),
               {"v": jnp.asarray(v)}, spec, scan_engine="pallas")
    np.testing.assert_array_equal(np.asarray(a[3]["cs"]),
                                  np.asarray(b[3]["cs"]))
    np.testing.assert_array_equal(np.asarray(a[3]["cmx"]),
                                  np.asarray(b[3]["cmx"]))
