"""Distributed scan-by-key (parallel/dscan.py) vs the single-chip op, CPU-8."""

import numpy as np
import pytest

import jax.numpy as jnp

from cuda.radixsort_tpu.ops.scan import scan_by_key
from cuda.radixsort_tpu.parallel import dsort
from cuda.radixsort_tpu.parallel.dscan import scan_by_key_distributed


@pytest.fixture(scope="module")
def mesh():
    return dsort.make_mesh()


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(314)


def _check(keys, vals, mesh, **kw):
    got = np.asarray(scan_by_key_distributed(
        jnp.asarray(keys), jnp.asarray(vals), mesh=mesh, **kw))
    want = np.asarray(scan_by_key(jnp.asarray(keys), jnp.asarray(vals),
                                  kw.get("op", "sum"),
                                  exclusive=kw.get("exclusive", False),
                                  init=kw.get("init"),
                                  identity=kw.get("identity")))
    np.testing.assert_array_equal(got, want)


def test_dscan_sum_random(mesh, rng):
    n = 8 * 1024
    keys = rng.integers(0, 30, size=n).astype(np.uint32)
    vals = rng.integers(-9, 9, size=n).astype(np.int32)
    _check(keys, vals, mesh)


def test_dscan_runs_span_shards(mesh, rng):
    # one run covers shards 2..5 entirely — the carry must chain through
    # multiple whole-run predecessors
    n = 8 * 256
    keys = np.zeros(n, np.uint32)
    keys[: 2 * 256] = 1
    keys[2 * 256: 6 * 256] = 7
    keys[6 * 256:] = 9
    vals = rng.integers(0, 5, size=n).astype(np.int32)
    _check(keys, vals, mesh)
    _check(keys, vals, mesh, exclusive=True)


def test_dscan_single_global_run(mesh, rng):
    n = 8 * 128
    keys = np.full(n, 42, np.uint32)
    vals = rng.integers(0, 3, size=n).astype(np.int32)
    _check(keys, vals, mesh)
    got = np.asarray(scan_by_key_distributed(
        jnp.asarray(keys), jnp.asarray(vals), mesh=mesh))
    np.testing.assert_array_equal(got, np.cumsum(vals))


def test_dscan_boundary_aligned_runs(mesh, rng):
    # run boundaries EXACTLY at shard boundaries: carries must not leak
    n = 8 * 64
    keys = np.repeat(np.arange(8, dtype=np.uint32), 64)
    vals = rng.integers(0, 5, size=n).astype(np.int32)
    _check(keys, vals, mesh)
    _check(keys, vals, mesh, exclusive=True)


def test_dscan_min_max_prod(mesh, rng):
    n = 8 * 512
    keys = rng.integers(0, 12, size=n).astype(np.uint32)
    for op in ("min", "max"):
        vals = rng.integers(-100, 100, size=n).astype(np.int32)
        _check(keys, vals, mesh, op=op)
    vals = rng.integers(1, 3, size=n).astype(np.int64)
    _check(keys, vals, mesh, op="prod")


def test_dscan_exclusive_with_init(mesh, rng):
    n = 8 * 300
    keys = rng.integers(0, 9, size=n).astype(np.uint32)
    vals = rng.integers(0, 7, size=n).astype(np.int32)
    _check(keys, vals, mesh, exclusive=True, init=11)


def test_dscan_non_divisible_n(mesh, rng):
    n = 8 * 200 + 13
    keys = rng.integers(0, 6, size=n).astype(np.uint32)
    vals = rng.integers(0, 7, size=n).astype(np.int32)
    _check(keys, vals, mesh)
    _check(keys, vals, mesh, exclusive=True)


def test_dscan_callable_op(mesh, rng):
    n = 8 * 256
    keys = rng.integers(0, 10, size=n).astype(np.uint32)
    vals = rng.integers(0, 50, size=n).astype(np.int32)
    _check(keys, vals, mesh, op=jnp.maximum,
           identity=np.iinfo(np.int32).min)


def test_dscan_float(mesh, rng):
    n = 8 * 512
    keys = rng.integers(0, 20, size=n).astype(np.uint32)
    vals = rng.random(n).astype(np.float32)
    got = np.asarray(scan_by_key_distributed(
        jnp.asarray(keys), jnp.asarray(vals), mesh=mesh))
    want = np.asarray(scan_by_key(jnp.asarray(keys), jnp.asarray(vals)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dscan_tuple_axis(rng):
    """Multi-host mesh shape: scan over a ("host", "chip") tuple axis."""
    m2 = dsort.make_mesh_2d(2, 4)
    n = 8 * 256
    keys = rng.integers(0, 10, size=n).astype(np.uint32)
    vals = rng.integers(0, 9, size=n).astype(np.int32)
    got = np.asarray(scan_by_key_distributed(
        jnp.asarray(keys), jnp.asarray(vals), mesh=m2,
        axis_name=("host", "chip")))
    want = np.asarray(scan_by_key(jnp.asarray(keys), jnp.asarray(vals)))
    np.testing.assert_array_equal(got, want)
