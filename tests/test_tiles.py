"""Tile-math correctness vs numpy, via pallas_call(interpret=True) on CPU."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda.radixsort_tpu.kernels import tiles

R = 32  # rows for tests (any power of two works)


def run_interp(kernel, out_shapes, *args):
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(s, d) for s, d in out_shapes],
        interpret=True,
    )(*args)


def _digits(seed, shape=(R, 128), lo=0, hi=16):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=shape).astype(np.int32)


def test_packed_prefix_and_tables():
    d = _digits(0)

    def kern(d_ref, s0, s1, s2, s3, t0, r0):
        ws = tiles.packed_words(d_ref[:])
        ss = tiles.lane_inclusive_prefix(ws[0])
        tot, rb = tiles.row_tables([tiles.lane_inclusive_prefix(w) for w in ws])
        s0[:], s1[:], s2[:], s3[:] = [tiles.lane_inclusive_prefix(w) for w in ws]
        t0[:] = tot[1]
        r0[:] = rb[2]

    s0, s1, s2, s3, t1, rb2 = run_interp(
        kern,
        [((R, 128), jnp.int32)] * 4 + [((R, 1), jnp.int32)] * 2,
        jnp.asarray(d),
    )
    # oracle: per-row exclusive/inclusive counts
    for r in range(R):
        row = d[r]
        for b in [0, 3, 5, 9, 15]:
            word = [s0, s1, s2, s3][b >> 2]
            inc = (np.asarray(word)[r] >> (8 * (b & 3))) & 255
            want = np.cumsum(row == b)
            np.testing.assert_array_equal(inc, want, err_msg=f"r={r} b={b}")
        # tot word 1 = buckets 4..7
        for b in range(4, 8):
            got = (np.asarray(t1)[r, 0] >> (8 * (b & 3))) & 255
            assert got == np.sum(row == b)
        # rb word 2 = exclusive bases of buckets 8..11
        for b in range(8, 12):
            got = (np.asarray(rb2)[r, 0] >> (8 * (b & 3))) & 255
            assert got == np.sum(row < b)


def test_inrow_sort_random_and_skewed():
    for seed, hi in [(1, 16), (2, 3), (3, 1)]:  # uniform, few buckets, constant
        d = _digits(seed, hi=hi)
        rng = np.random.default_rng(seed + 100)
        vals = rng.integers(0, 2**31, size=(R, 128)).astype(np.int32)

        def kern(d_ref, v_ref, sv, sd):
            sp, bidx, _, _, _ = tiles.inrow_sort(d_ref[:], [v_ref[:]])
            sv[:] = sp[0]
            sd[:] = bidx

        svals, sdig = run_interp(
            kern, [((R, 128), jnp.int32)] * 2, jnp.asarray(d), jnp.asarray(vals)
        )
        svals, sdig = np.asarray(svals), np.asarray(sdig)
        for r in range(R):
            order = np.argsort(d[r], kind="stable")
            np.testing.assert_array_equal(svals[r], vals[r][order], f"row {r}")
            np.testing.assert_array_equal(sdig[r], d[r][order], f"row {r}")


def test_bucket_count_table():
    d = _digits(4)

    def kern(d_ref, sc_o, se_o, tt_o):
        ws = tiles.packed_words(d_ref[:])
        ss = [tiles.lane_inclusive_prefix(w) for w in ws]
        tot, _ = tiles.row_tables(ss)
        sc, scexcl, tiletot = tiles.bucket_count_table(tot, R)
        sc_o[:], se_o[:], tt_o[:] = sc, scexcl, tiletot

    sc, se, tt = run_interp(
        kern,
        [((R, 128), jnp.int32), ((R, 128), jnp.int32), ((1, 128), jnp.int32)],
        jnp.asarray(d),
    )
    sc, se, tt = np.asarray(sc), np.asarray(se), np.asarray(tt)
    counts = np.zeros((R, 16), np.int32)
    for r in range(R):
        counts[r] = np.bincount(d[r], minlength=16)
    np.testing.assert_array_equal(sc[:, :16], counts)
    np.testing.assert_array_equal(sc[:, 16:], 0)
    np.testing.assert_array_equal(se[:, :16], np.cumsum(counts, 0) - counts)
    np.testing.assert_array_equal(tt[0, :16], counts.sum(0))
