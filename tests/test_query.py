"""Pipelined query tests: filter -> join, single-chip and distributed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cuda.radixsort_tpu as rs
from cuda.radixsort_tpu.parallel import dsort
from cuda.radixsort_tpu.pipeline import query

NDEV = len(jax.devices())
CFG = rs.SortConfig(engine="xla")


def _data(seed, nb, npr):
    rng = np.random.default_rng(seed)
    bk = rng.permutation(np.arange(4 * nb, dtype=np.uint32))[:nb]
    bv = rng.integers(0, 1000, size=nb).astype(np.int32)
    pk = rng.choice(np.arange(4 * nb, dtype=np.uint32), size=npr)
    pv = rng.integers(-1000, 1000, size=npr).astype(np.int32)
    return bk, bv, pk, pv


def _oracle(bk, bv, pk, pv, thr):
    lut = dict(zip(bk.tolist(), bv.tolist()))
    out = []
    for k, v in zip(pk.tolist(), pv.tolist()):
        if v > thr and k in lut:
            out.append((k, v, lut[k]))
    return sorted(out)


def test_query_single():
    bk, bv, pk, pv = _data(21, 500, 20_000)
    thr = 250
    k, pvv, bvv, cnt, stats = query.filter_sort_join(
        jnp.asarray(pk), jnp.asarray(pv), jnp.asarray(bk), jnp.asarray(bv),
        thr, config=CFG)
    cnt = int(cnt)
    got = sorted(zip(np.asarray(k)[:cnt].tolist(),
                     np.asarray(pvv)[:cnt].tolist(),
                     np.asarray(bvv)[:cnt].tolist()))
    want = _oracle(bk, bv, pk, pv, thr)
    assert got == want
    assert int(stats.rows_in) == 20_000
    assert int(stats.rows_after_filter) == int((pv > thr).sum())
    assert int(stats.rows_joined) == len(want)


def test_query_distributed():
    mesh = dsort.make_mesh(NDEV)
    bk, bv, pk, pv = _data(22, NDEV * 64, NDEV * 4096)
    thr = 0
    k, pvv, bvv, cnt, stats = query.filter_sort_join_distributed(
        jnp.asarray(pk), jnp.asarray(pv), jnp.asarray(bk), jnp.asarray(bv),
        thr, mesh=mesh, config=CFG)
    k, pvv, bvv, cnt = [np.asarray(x) for x in (k, pvv, bvv, cnt)]
    per = k.shape[0] // NDEV
    got = []
    for d in range(NDEV):
        c = cnt[d]
        got.extend(zip(k[d*per:d*per+c].tolist(), pvv[d*per:d*per+c].tolist(),
                       bvv[d*per:d*per+c].tolist()))
    want = _oracle(bk, bv, pk, pv, thr)
    assert sorted(got) == want
    assert int(stats.rows_joined) == len(want)


def test_query_distributed_hash_strategy():
    # hash-exchange join path: both sides partitioned by key hash
    mesh = dsort.make_mesh(NDEV)
    bk, bv, pk, pv = _data(23, NDEV * 64, NDEV * 4096)
    thr = 0
    k, pvv, bvv, cnt, stats = query.filter_sort_join_distributed(
        jnp.asarray(pk), jnp.asarray(pv), jnp.asarray(bk), jnp.asarray(bv),
        thr, mesh=mesh, join_strategy="hash", config=CFG)
    k, pvv, bvv, cnt = [np.asarray(x) for x in (k, pvv, bvv, cnt)]
    per = k.shape[0] // NDEV
    got = []
    for d in range(NDEV):
        c = cnt[d]
        got.extend(zip(k[d*per:d*per+c].tolist(), pvv[d*per:d*per+c].tolist(),
                       bvv[d*per:d*per+c].tolist()))
    want = _oracle(bk, bv, pk, pv, thr)
    assert sorted(got) == want
    assert int(stats.rows_joined) == len(want)
    assert int(stats.rows_after_filter) == int((pv > thr).sum())
