"""Distributed sort/shuffle tests on the 8-virtual-device CPU mesh (SURVEY §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda.radixsort_tpu.parallel import dsort

NDEV = len(jax.devices())


@pytest.fixture(scope="module")
def mesh():
    return dsort.make_mesh(NDEV)


@pytest.mark.parametrize("n", [NDEV, 1024, 10_000, 1 << 16])
def test_uniform_u32(mesh, n):
    rng = np.random.default_rng(n)
    keys = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    out, counts = dsort.sort_distributed(keys, mesh=mesh)
    assert int(np.asarray(counts).sum()) >= n  # sentinels padded input
    got = dsort.reconstruct_sorted(out, counts, jnp.uint32, n)
    np.testing.assert_array_equal(got, np.sort(np.asarray(keys)))


def test_skewed_heavy_hitter(mesh):
    # 70% of keys identical — splitter balance must not break correctness.
    rng = np.random.default_rng(7)
    n = 1 << 14
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    keys[: int(0.7 * n)] = 0xDEADBEEF
    rng.shuffle(keys)
    out, counts = dsort.sort_distributed(jnp.asarray(keys), mesh=mesh)
    got = dsort.reconstruct_sorted(out, counts, jnp.uint32, n)
    np.testing.assert_array_equal(got, np.sort(keys))


def test_signed_and_float(mesh):
    rng = np.random.default_rng(3)
    n = 4096
    i32 = rng.integers(-(2**31), 2**31 - 1, size=n, dtype=np.int64).astype(np.int32)
    out, counts = dsort.sort_distributed(jnp.asarray(i32), mesh=mesh)
    got = dsort.reconstruct_sorted(out, counts, jnp.int32, n)
    np.testing.assert_array_equal(got, np.sort(i32))

    f32 = rng.standard_normal(n).astype(np.float32)
    out, counts = dsort.sort_distributed(jnp.asarray(f32), mesh=mesh)
    got = dsort.reconstruct_sorted(out, counts, jnp.float32, n)
    np.testing.assert_array_equal(got, np.sort(f32))


def test_descending(mesh):
    rng = np.random.default_rng(5)
    n = 4096
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    out, counts = dsort.sort_distributed(
        jnp.asarray(keys), mesh=mesh, descending=True
    )
    got = dsort.reconstruct_sorted(out, counts, jnp.uint32, n, descending=True)
    np.testing.assert_array_equal(got, np.sort(keys)[::-1])


def test_sized_exchange(mesh):
    # two-phase: cap from the sizing pass is tight and correct
    rng = np.random.default_rng(21)
    n = 1 << 14
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    out, counts, cap = dsort.sort_distributed_sized(jnp.asarray(keys), mesh=mesh)
    got = dsort.reconstruct_sorted(out, counts, jnp.uint32, n)
    np.testing.assert_array_equal(got, np.sort(keys))
    s = n // NDEV
    assert cap < s  # balanced data: sized cap beats the default full-shard cap
    assert cap >= int(np.asarray(counts).max()) // NDEV  # sanity: covers lanes


def test_sized_exchange_skewed(mesh):
    # heavy hitter: one bucket holds 70% of keys -> cap must grow to fit it
    rng = np.random.default_rng(22)
    n = 1 << 13
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    keys[: int(0.7 * n)] = 0xDEADBEEF
    rng.shuffle(keys)
    out, counts, cap = dsort.sort_distributed_sized(jnp.asarray(keys), mesh=mesh)
    got = dsort.reconstruct_sorted(out, counts, jnp.uint32, n)
    np.testing.assert_array_equal(got, np.sort(keys))
