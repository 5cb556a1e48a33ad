"""Bitonic engine tests (interpret mode on CPU; hardware runs measured in
scripts/tpu_check.py and NOTES.md).

The bitonic engine serves keys-only full-range sorts; everything else must
transparently fall back to the stable path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import cuda.radixsort_tpu as rs
from cuda.radixsort_tpu.kernels.bitonic import sort_bits_bitonic

BITONIC = rs.SortConfig(engine="bitonic", interpret=True)


def test_kernel_direct_multilevel():
    # pow2 size crossing tile, merge-block and cross-stage paths
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**32, 1 << 14, dtype=np.uint32)
    got = np.asarray(sort_bits_bitonic(jnp.asarray(x), log_tile=10,
                                       log_merge=12, interpret=True))
    np.testing.assert_array_equal(got, np.sort(x))


@pytest.mark.parametrize("n", [1, 1000, 8192])
def test_sort_u32_sizes(n):
    rng = np.random.default_rng(n)
    x = rng.integers(0, 2**32, n, dtype=np.uint32)
    got = np.asarray(rs.sort(jnp.asarray(x), config=BITONIC))
    np.testing.assert_array_equal(got, np.sort(x))


def test_sort_dtypes_and_descending():
    rng = np.random.default_rng(3)
    i = rng.integers(-(2**31), 2**31, 4000).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(rs.sort(jnp.asarray(i), config=BITONIC)), np.sort(i))
    f = rng.standard_normal(4000).astype(np.float32)
    f[:10] = [0.0, -0.0, np.inf, -np.inf, 1e-40, -1e-40, 3, -3, 0.5, -0.5]
    np.testing.assert_array_equal(
        np.asarray(rs.sort(jnp.asarray(f), config=BITONIC,
                           descending=True)), np.sort(f)[::-1])


def test_sort_extremes_and_duplicates():
    x = np.array([0xFFFFFFFF, 0, 0xFFFFFFFF, 5, 5, 0, 0xFFFFFFFF] * 300,
                 np.uint32)
    got = np.asarray(rs.sort(jnp.asarray(x), config=BITONIC))
    np.testing.assert_array_equal(got, np.sort(x))


def test_fallbacks_stay_stable():
    # pairs / bit-range configs must not go through the (unstable) network
    rng = np.random.default_rng(9)
    keys = rng.integers(0, 2**16, 3000, dtype=np.uint32)
    vals = np.arange(3000, dtype=np.int32)
    gk, gv = rs.sort_pairs(jnp.asarray(keys), jnp.asarray(vals),
                           config=rs.SortConfig(engine="bitonic"))
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(gk), keys[perm])
    np.testing.assert_array_equal(np.asarray(gv), vals[perm])
    got = np.asarray(rs.sort(jnp.asarray(keys), end_bit=8,
                             config=rs.SortConfig(engine="bitonic")))
    np.testing.assert_array_equal(got, keys[np.argsort(keys & 0xFF,
                                                       kind="stable")])


def test_sort_u64_two_plane():
    rng = np.random.default_rng(11)
    x = rng.integers(0, 2**64, 3000, dtype=np.uint64)
    x[:50] = np.uint64(0xFFFFFFFF_FFFFFFFF)  # max-key ties with pads
    got = np.asarray(rs.sort(jnp.asarray(x), config=BITONIC))
    np.testing.assert_array_equal(got, np.sort(x))


def test_argsort_stable_bitonic():
    rng = np.random.default_rng(12)
    k = rng.integers(0, 32, 3000, dtype=np.uint32)  # heavy duplicates
    perm = np.asarray(rs.argsort(jnp.asarray(k), config=BITONIC))
    np.testing.assert_array_equal(perm, np.argsort(k, kind="stable"))
    pf = rng.standard_normal(3000).astype(np.float32)
    perm = np.asarray(rs.argsort(jnp.asarray(pf), descending=True,
                                 config=BITONIC))
    np.testing.assert_array_equal(perm, np.argsort(-pf, kind="stable"))


def test_segmented_bitonic():
    rng = np.random.default_rng(13)
    n = 4096
    offs = np.sort(rng.choice(np.arange(1, n), 30, replace=False))
    offsets = np.concatenate([[0], offs, [n]]).astype(np.int32)
    k = rng.integers(0, 2**32, n, dtype=np.uint32)
    got = np.asarray(rs.segmented_sort(jnp.asarray(k), jnp.asarray(offsets),
                                       config=BITONIC))
    want = k.copy()
    for s in range(len(offsets) - 1):
        want[offsets[s]:offsets[s + 1]] = np.sort(k[offsets[s]:offsets[s + 1]])
    np.testing.assert_array_equal(got, want)


def test_merge_sorted_blocks_interpret():
    # merge tail only: alternating-direction sorted blocks -> full sort
    from cuda.radixsort_tpu.kernels.bitonic import merge_sorted_planes_bitonic
    import numpy as np

    rng = np.random.default_rng(71)
    logn, log_block = 13, 11
    x = rng.integers(0, 2**32, size=1 << logn, dtype=np.uint32)
    blocks = x.reshape(-1, 1 << log_block).copy()
    for i in range(blocks.shape[0]):
        blocks[i] = np.sort(blocks[i])
        if i & 1:
            blocks[i] = blocks[i][::-1]
    out = merge_sorted_planes_bitonic(
        [jnp.asarray(blocks.reshape(-1))], log_block=log_block,
        interpret=True)[0]
    np.testing.assert_array_equal(np.asarray(out), np.sort(x))


def test_merge_sorted_blocks_two_planes_interpret():
    from cuda.radixsort_tpu.kernels.bitonic import merge_sorted_planes_bitonic
    import numpy as np

    rng = np.random.default_rng(72)
    logn, log_block = 12, 10
    k = rng.integers(0, 1 << 8, size=1 << logn, dtype=np.uint32)
    v = np.arange(1 << logn, dtype=np.uint32)
    kb = k.reshape(-1, 1 << log_block)
    vb = v.reshape(-1, 1 << log_block)
    for i in range(kb.shape[0]):
        o = np.lexsort((vb[i], kb[i]))
        if i & 1:
            o = o[::-1]
        kb[i], vb[i] = kb[i][o], vb[i][o]
    ok, ov = merge_sorted_planes_bitonic(
        [jnp.asarray(kb.reshape(-1)), jnp.asarray(vb.reshape(-1))],
        log_block=log_block, n_cmp=2, interpret=True)
    o = np.lexsort((v, k))
    np.testing.assert_array_equal(np.asarray(ok), k[o])
    np.testing.assert_array_equal(np.asarray(ov), v[o])


# --- unstable pairs: tie-safe ride planes (negative n_cmp, round 4) --------


def _check_unstable_pairs(k, v, ok, ov):
    """ok must be sorted; (ok, ov) must be a permutation of (k, v) pairs."""
    k, v, ok, ov = map(np.asarray, (k, v, ok, ov))
    assert (ok[:-1] <= ok[1:]).all() if len(ok) else True
    got = sorted(zip(ok.tolist(), ov.tolist()))
    want = sorted(zip(k.tolist(), v.tolist()))
    assert got == want


def test_unstable_pairs_tie_safe_pow2():
    # power-of-two size => tie-safe negative-n_cmp path (no pads); heavy
    # duplicates force comparand ties at every network level
    rng = np.random.default_rng(5)
    n = 1 << 11
    k = rng.integers(0, 8, n).astype(np.uint32)
    v = np.arange(n, dtype=np.uint32)
    ok, ov = rs.sort_pairs(jnp.asarray(k), jnp.asarray(v), config=BITONIC,
                           stable=False)
    _check_unstable_pairs(k, v, ok, ov)


def test_unstable_pairs_padded_all_compare():
    # non-power-of-two => all-compare path; max-key rows tie with the
    # 0xFFFFFFFF pad rows' key plane, the payload comparand disambiguates
    rng = np.random.default_rng(6)
    n = 1500
    k = rng.integers(0, 4, n).astype(np.uint32)
    k[rng.integers(0, n, 200)] = np.uint32(0xFFFFFFFF)
    v = np.arange(n, dtype=np.uint32)
    ok, ov = rs.sort_pairs(jnp.asarray(k), jnp.asarray(v), config=BITONIC,
                           stable=False)
    _check_unstable_pairs(k, v, ok, ov)


def test_cmpex_planes_tie_safe_chain():
    # the k>=2 tie-safe lex chain (negative n_cmp), unit-tested directly —
    # pure jnp, no kernel: a 3-plane interpret sort is a pre-existing
    # CPU-compile cliff (minutes at n=256), so the u64 unstable pairs path
    # is chip-verified in scripts/tpu_check.py instead.
    from cuda.radixsort_tpu.kernels.bitonic import _cmpex_planes

    # rows: (hi, lo) comparands + ride. pairs (mine vs partner):
    #   tie       -> both sides keep their own ride
    #   mine < p  -> dirhi side takes partner, other keeps
    #   mine > p  -> dirhi side keeps, other takes partner
    hi_m = jnp.asarray([1, 1, 2], jnp.int32)
    lo_m = jnp.asarray([5, 5, 5], jnp.int32)
    rid_m = jnp.asarray([10, 11, 12], jnp.int32)
    hi_p = jnp.asarray([1, 1, 1], jnp.int32)
    lo_p = jnp.asarray([5, 7, 5], jnp.int32)
    rid_p = jnp.asarray([20, 21, 22], jnp.int32)
    for dirhi, want in [
        (True, [10, 21, 12]),   # max side: tie keep, lt take, gt keep
        (False, [10, 11, 22]),  # min side: tie keep, lt keep, gt take
    ]:
        out = _cmpex_planes([hi_m, lo_m, rid_m], [hi_p, lo_p, rid_p],
                            jnp.full((3,), dirhi), -2)
        np.testing.assert_array_equal(np.asarray(out[2]), want)
    # and the positive-n_cmp path is unchanged: tie on the min side TAKES
    # the partner (the documented total-order requirement)
    out = _cmpex_planes([hi_m, lo_m, rid_m], [hi_p, lo_p, rid_p],
                        jnp.full((3,), False), 2)
    assert int(np.asarray(out[2])[0]) == 20


def test_unstable_pairs_u64_chain_e2e_compact_interpret():
    """VERDICT r4 #8b: the k>=2 tie-safe lex chain, END TO END through the
    real network kernels under CPU interpret. The standard 3-plane tile
    body hits the interpret compile cliff (NOTES r4: >500 s even at n=256),
    but the COMPACT body (traced strides, tiny program) compiles in ~5 s —
    so the chain gets CI coverage through tile + span + merge kernels, not
    just the pure-jnp comparator unit test."""
    rng = np.random.default_rng(44)
    n = 1 << 12
    hi = rng.integers(0, 4, size=n).astype(np.uint32)   # heavy ties
    lo = rng.integers(0, 4, size=n).astype(np.uint32)
    pay = np.arange(n, dtype=np.uint32)
    from cuda.radixsort_tpu.kernels import bitonic

    # log_merge < logn engages the span kernel between tile and merge
    out = bitonic.sort_planes_bitonic(
        [jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(pay)],
        n_cmp=-2, log_tile=10, log_merge=11, compact=True, interpret=True)
    oh, ol, op = (np.asarray(x) for x in out)
    o = np.lexsort((lo, hi))
    np.testing.assert_array_equal(oh, hi[o])
    np.testing.assert_array_equal(ol, lo[o])
    # tie-safe contract: payload is a permutation, and each (hi, lo) tie
    # group holds exactly its own payload multiset
    np.testing.assert_array_equal(np.sort(op), pay)
    for a in range(4):
        for b in range(4):
            np.testing.assert_array_equal(
                np.sort(pay[(hi == a) & (lo == b)]),
                np.sort(op[(oh == a) & (ol == b)]))


def test_unstable_pairs_u64_semantics_xla_fallback():
    # end-to-end u64 stable=False on the lax.sort fallback path (plain CPU,
    # no interpret): same public semantics, fast to run
    rng = np.random.default_rng(7)
    n = 1000
    k = (rng.integers(0, 4, n).astype(np.uint64) << np.uint64(32)) | np.uint64(7)
    v = np.arange(n, dtype=np.uint32)
    ok, ov = rs.sort_pairs(jnp.asarray(k), jnp.asarray(v), stable=False)
    k2, v2, ok2, ov2 = (np.asarray(x) for x in (k, v, ok, ov))
    assert (ok2[:-1] <= ok2[1:]).all()
    assert sorted(zip(ok2.tolist(), ov2.tolist())) == sorted(
        zip(k2.tolist(), v2.tolist()))


def test_unstable_pairs_constant_keys_is_permutation():
    # all comparands tie everywhere: tie-safe must never exchange, so the
    # payload plane must come back exactly unchanged (vs the positive-n_cmp
    # duplicate/loss failure mode)
    n = 1 << 10
    k = np.full(n, 42, np.uint32)
    v = np.arange(n, dtype=np.uint32)
    ok, ov = rs.sort_pairs(jnp.asarray(k), jnp.asarray(v), config=BITONIC,
                           stable=False)
    np.testing.assert_array_equal(np.asarray(ok), k)
    assert np.array_equal(np.sort(np.asarray(ov)), v)


def test_stable_pairs_unique_tag_matches_stable():
    # unique_leading_payload: a strictly-increasing u32 tag as the tie-break
    # comparand must reproduce the stable sort bit-for-bit, one plane cheaper
    rng = np.random.default_rng(8)
    n = 1 << 11
    k = rng.integers(0, 16, n).astype(np.uint32)
    tag = np.arange(n, dtype=np.uint32)
    pay = rng.integers(0, 2**32, n).astype(np.uint32)
    ok, (otag, opay) = rs.sort_pairs(jnp.asarray(k), (jnp.asarray(tag),
                                                      jnp.asarray(pay)),
                                     config=BITONIC,
                                     unique_leading_payload=True)
    perm = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(ok), k[perm])
    np.testing.assert_array_equal(np.asarray(otag), tag[perm])
    np.testing.assert_array_equal(np.asarray(opay), pay[perm])


def test_sort_struct_unstable_semantics():
    # u64-as-(hi, lo) struct sort with stable=False — the u64 pairs route on
    # x64-off backends; xla fallback on plain CPU, bitonic tie-safe on chip
    rng = np.random.default_rng(9)
    n = 1200
    hi = rng.integers(0, 4, n).astype(np.uint32)
    lo = rng.integers(0, 4, n).astype(np.uint32)
    v = np.arange(n, dtype=np.uint32)
    (ohi, olo), ov = rs.sort_struct((jnp.asarray(hi), jnp.asarray(lo)),
                                    jnp.asarray(v), stable=False)
    ohn, oln, ovn = np.asarray(ohi), np.asarray(olo), np.asarray(ov)
    key = (ohn.astype(np.uint64) << np.uint64(32)) | oln
    want = (hi.astype(np.uint64) << np.uint64(32)) | lo
    assert (key[:-1] <= key[1:]).all()
    assert np.array_equal(np.sort(ovn), v)
    assert np.array_equal(want[ovn], key)


def test_split_sort_merge_heavy_padding(monkeypatch):
    """r5: heavily padded sorts (pad >= 25% of the padded size) take the
    split-sort-merge route — sort the leading power of two ascending, the
    remainder descending (comparand complement), one merge level. Engaged
    here at small n via RS_SPLIT_SORT_MIN_LOGN; production threshold is
    2^19 (the 151M join concat case)."""
    import jax

    monkeypatch.setenv("RS_SPLIT_SORT_MIN_LOGN", "12")
    jax.clear_caches()
    B = rs.SortConfig(engine="bitonic", interpret=True)
    rng = np.random.default_rng(9)
    try:
        for n in (2300, 3000):
            k = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(
                np.uint32)
            np.testing.assert_array_equal(
                np.asarray(rs.sort(jnp.asarray(k), config=B)), np.sort(k))
            kd = rng.integers(0, 40, size=n).astype(np.uint32)
            v = np.arange(n, dtype=np.int32)
            ok, ov = rs.sort_pairs(jnp.asarray(kd), jnp.asarray(v), config=B)
            o = np.argsort(kd, kind="stable")
            np.testing.assert_array_equal(np.asarray(ok), kd[o])
            np.testing.assert_array_equal(np.asarray(ov), v[o])  # stable
            ok2, ov2 = rs.sort_pairs(jnp.asarray(kd), jnp.asarray(v),
                                     config=B, stable=False)
            np.testing.assert_array_equal(np.asarray(ok2), kd[o])
            np.testing.assert_array_equal(np.sort(np.asarray(ov2)), v)
    finally:
        jax.clear_caches()
