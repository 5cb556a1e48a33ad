"""End-to-end pallas-engine sort tests (interpret mode on CPU).

Interpret mode is slow (~20 s per stage kernel call), so this file keeps a
small number of cases that exercise the full pipeline plumbing: bit-range
restriction (masked-copy path), full-width key+payload pairs, and 64-bit
limb decomposition. Broad dtype/size coverage lives in test_sort_oracle.py
(engine-agnostic semantics) and test_stage.py (kernel-level).
"""

import jax.numpy as jnp
import numpy as np

import cuda.radixsort_tpu as rs

PALLAS = rs.SortConfig(engine="pallas", interpret=True)


def test_pallas_u32_low_byte():
    rng = np.random.default_rng(0)
    n = 20_000
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    got = np.asarray(rs.sort(jnp.asarray(keys), end_bit=8, config=PALLAS))
    perm = np.argsort(keys & 0xFF, kind="stable")
    np.testing.assert_array_equal(got, keys[perm])


def test_pallas_pairs_low16():
    # 4 aligned stages (no mask copy) + payload plane; the full 8-stage
    # path is exercised on hardware by scripts/tpu_check.py
    rng = np.random.default_rng(1)
    n = 5_000
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    vals = np.arange(n, dtype=np.int32)
    gk, gv = rs.sort_pairs(jnp.asarray(keys), jnp.asarray(vals),
                           end_bit=16, config=PALLAS)
    perm = np.argsort(keys & 0xFFFF, kind="stable")
    np.testing.assert_array_equal(np.asarray(gk), keys[perm])
    np.testing.assert_array_equal(np.asarray(gv), vals[perm])


def test_pallas_u64_cross_limb_bits():
    # bit range [28, 36) spans both u32 limbs: hi limb sorts bits [0,4),
    # lo limb bits [28,32) — exercises the multi-limb pipeline path.
    rng = np.random.default_rng(2)
    n = 8_000
    keys = rng.integers(0, 2**64, size=n, dtype=np.uint64)
    got = np.asarray(
        rs.sort(jnp.asarray(keys), begin_bit=28, end_bit=36, config=PALLAS)
    )
    mask = np.uint64(((1 << 36) - 1) & ~((1 << 28) - 1))
    perm = np.argsort(keys & mask, kind="stable")
    np.testing.assert_array_equal(got, keys[perm])


def test_pallas_trivial_pass_skip_constant_and_hot_byte():
    """Trivial-pass short-circuit (VERDICT r4 #4; CUB downsweep
    :672-741 / dispatch copy shortcut :1064-1077): stages whose global
    histogram is single-bucket route through the identity branch. Constant
    keys skip every stage; single-hot-byte keys skip the upper stages.
    Semantics must be unchanged (stability included)."""
    rng = np.random.default_rng(3)
    n = 6_000
    # constant keys: every stage trivial; payload order must be preserved
    keys = np.full(n, 0xABCD1234, dtype=np.uint32)
    vals = np.arange(n, dtype=np.int32)
    gk, gv = rs.sort_pairs(jnp.asarray(keys), jnp.asarray(vals),
                           end_bit=16, config=PALLAS)
    np.testing.assert_array_equal(np.asarray(gk), keys)
    np.testing.assert_array_equal(np.asarray(gv), vals)
    # single hot byte: bits [8,16) vary, the rest constant
    keys = (0x5A000000 | (rng.integers(0, 256, size=n) << 8)).astype(np.uint32)
    got = np.asarray(rs.sort(jnp.asarray(keys), end_bit=16, config=PALLAS))
    np.testing.assert_array_equal(got, np.sort(keys))


def test_pallas_payload_dtypes_ride_planes():
    """r5: sub-4-byte payloads widen to u32 planes; 8-byte integer payloads
    split into (lo, hi) planes; f64 keeps the index+gather route (no 64-bit
    float bitcast on this backend). All bit-exact vs the stable oracle."""
    import jax

    rng = np.random.default_rng(5)
    n = 2500
    k = rng.integers(0, 2**16, n, dtype=np.uint64).astype(np.uint32)
    o = np.argsort(k, kind="stable")
    vb = rng.integers(0, 2, n).astype(bool)
    v16 = rng.integers(-2**15, 2**15, n).astype(np.int16)
    v64 = rng.integers(-2**60, 2**60, n, dtype=np.int64)
    f64 = rng.standard_normal(n)
    # plane-riding set (no f64): bool widens, i16 widens, i64 splits
    gk, (ob, o16, o64) = rs.sort_pairs(
        jnp.asarray(k), (jnp.asarray(vb), jnp.asarray(v16),
                         jnp.asarray(v64)),
        config=PALLAS, end_bit=16)
    np.testing.assert_array_equal(np.asarray(gk), k[o])
    np.testing.assert_array_equal(np.asarray(ob), vb[o])
    np.testing.assert_array_equal(np.asarray(o16), v16[o])
    np.testing.assert_array_equal(np.asarray(o64), v64[o])
    # an f64 leaf demotes the whole set to the index+gather route
    gk, (o64b, of) = rs.sort_pairs(
        jnp.asarray(k), (jnp.asarray(v64), jnp.asarray(f64)),
        config=PALLAS, end_bit=16)
    np.testing.assert_array_equal(np.asarray(gk), k[o])
    np.testing.assert_array_equal(np.asarray(o64b), v64[o])
    np.testing.assert_array_equal(np.asarray(of), f64[o])
