"""1:N expanding join vs a numpy brute-force oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda.radixsort_tpu.ops.join import join_count, join_expand


def _oracle_inner(bk, bv, pk):
    rows = []
    for pi, k in enumerate(pk):
        for j in range(len(bk)):
            if bk[j] == k:
                rows.append((int(k), int(bv[j]), pi))
    return sorted(rows)


def _got_rows(out, count):
    ok, ov, oi, om, total = out
    n = min(int(total), len(np.asarray(ok)))
    assert n == count
    rows = list(
        zip(np.asarray(ok)[:n].tolist(), np.asarray(ov)[:n].tolist(),
            np.asarray(oi)[:n].tolist())
    )
    assert bool(np.all(np.asarray(om)[:n]))
    assert not np.any(np.asarray(om)[n:])
    return sorted(rows)


@pytest.mark.parametrize("seed", [0, 1])
def test_join_expand_inner_duplicates(seed):
    rng = np.random.default_rng(seed)
    bk = rng.integers(0, 20, 64, dtype=np.uint32)  # heavy duplication: 1:N
    bv = rng.integers(0, 1000, 64, dtype=np.int32)
    pk = rng.integers(0, 30, 100, dtype=np.uint32)  # some keys miss
    want = _oracle_inner(bk, bv, pk)
    total = int(join_count(jnp.asarray(bk), jnp.asarray(pk)))
    assert total == len(want)
    out = join_expand(jnp.asarray(bk), jnp.asarray(bv), jnp.asarray(pk),
                      capacity=total + 7)
    assert _got_rows(out, len(want)) == want


def test_join_expand_truncation():
    bk = np.full(8, 5, np.uint32)
    bv = np.arange(8, dtype=np.int32)
    pk = np.full(4, 5, np.uint32)
    out = join_expand(jnp.asarray(bk), jnp.asarray(bv), jnp.asarray(pk),
                      capacity=10)
    ok, ov, oi, om, total = out
    assert int(total) == 32  # true count reported even though truncated
    assert bool(np.all(np.asarray(om)[:10]))
    # first 10 rows are valid join rows of the first probe runs
    assert np.all(np.asarray(ok)[:10] == 5)
    assert set(np.asarray(ov)[:8].tolist()) == set(range(8))


def test_join_expand_left_misses():
    bk = np.array([1, 1, 3], np.uint32)
    bv = np.array([10, 11, 30], np.int32)
    pk = np.array([0, 1, 2, 3], np.uint32)
    ok, ov, oi, om, total = join_expand(
        jnp.asarray(bk), jnp.asarray(bv), jnp.asarray(pk),
        capacity=16, how="left")
    n = int(total)
    assert n == 2 + 1 + 1 + 1  # key1 fans to 2, keys 0/2 miss, key 3 hits
    rows = sorted(zip(np.asarray(ok)[:n].tolist(), np.asarray(ov)[:n].tolist(),
                      np.asarray(oi)[:n].tolist(), np.asarray(om)[:n].tolist()))
    assert rows == [
        (0, 0, 0, False),
        (1, 10, 1, True), (1, 11, 1, True),
        (2, 0, 2, False),
        (3, 30, 3, True),
    ]


def test_join_expand_empty_build():
    bk = np.zeros(0, np.uint32)
    bv = np.zeros(0, np.int32)
    pk = np.array([1, 2, 3], np.uint32)
    assert int(join_count(jnp.asarray(bk), jnp.asarray(pk))) == 0
    *_, om, total = join_expand(jnp.asarray(bk), jnp.asarray(bv),
                                jnp.asarray(pk), capacity=4, how="left")
    assert int(total) == 3 and not np.any(np.asarray(om))
