"""External (out-of-core) sort: native k-way merge + chunked device sorts."""

import numpy as np
import pytest

from cuda.radixsort_tpu.ops.external import sort_external, sort_external_pairs
from cuda.radixsort_tpu.utils import native


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(8)


def test_kway_merge_stability(rng):
    runs = [np.sort(rng.integers(0, 40, size=m, dtype=np.uint32))
            for m in (700, 33, 0, 2000, 1)]
    tags = [np.full(r.shape[0], i, np.uint32) for i, r in enumerate(runs)]
    mk, mt = native.kway_merge_u32(runs, tags)
    ck = np.concatenate(runs)
    perm = np.argsort(ck, kind="stable")
    np.testing.assert_array_equal(mk, ck[perm])
    np.testing.assert_array_equal(mt, np.concatenate(tags)[perm])


def test_kway_merge_full_range_threaded(rng):
    runs = [np.sort(rng.integers(0, 2**32, size=1 << 17, dtype=np.uint32))
            for _ in range(6)]
    runs.append(np.array([0, 0xFFFFFFFF], np.uint32))  # extremes
    got = native.kway_merge_u32(runs)
    np.testing.assert_array_equal(got, np.sort(np.concatenate(runs)))


def test_kway_merge_single_and_empty(rng):
    r = np.sort(rng.integers(0, 2**32, size=500, dtype=np.uint32))
    np.testing.assert_array_equal(native.kway_merge_u32([r]), r)
    np.testing.assert_array_equal(
        native.kway_merge_u32([r, np.empty(0, np.uint32)]), r)


def test_sort_external(rng):
    x = rng.integers(0, 2**32, size=(1 << 19) + 123, dtype=np.uint32)
    got = sort_external(x, chunk=1 << 16)
    np.testing.assert_array_equal(got, np.sort(x))
    # single-chunk path
    got2 = sort_external(x[: 1 << 12], chunk=1 << 16)
    np.testing.assert_array_equal(got2, np.sort(x[: 1 << 12]))


def test_sort_external_pairs_stable(rng):
    k = rng.integers(0, 64, size=(1 << 17) + 9, dtype=np.uint32)
    v = np.arange(k.shape[0], dtype=np.int32)
    mk, mv = sort_external_pairs(k, v, chunk=1 << 15)
    p = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(mk, k[p])
    np.testing.assert_array_equal(mv, v[p])
    assert mv.dtype == np.int32


def test_sort_external_rejects_wrong_dtype(rng):
    with pytest.raises(TypeError):
        sort_external(np.zeros(10, np.uint64))


def test_sort_external_file(tmp_path):
    from cuda.radixsort_tpu.ops.external import sort_external_file

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**32, size=300_000, dtype=np.uint64).astype(
        np.uint32)
    src = tmp_path / "in.u32"
    dst = tmp_path / "out.u32"
    keys.tofile(src)
    n = sort_external_file(str(src), str(dst), chunk=1 << 16)
    assert n == keys.shape[0]
    got = np.fromfile(dst, dtype=np.uint32)
    np.testing.assert_array_equal(got, np.sort(keys))
    # single-chunk path
    small = keys[:1000]
    src2, dst2 = tmp_path / "in2.u32", tmp_path / "out2.u32"
    small.tofile(src2)
    assert sort_external_file(str(src2), str(dst2)) == 1000
    np.testing.assert_array_equal(np.fromfile(dst2, dtype=np.uint32),
                                  np.sort(small))


def test_kway_merge_out_param():
    from cuda.radixsort_tpu.utils import native

    runs = [np.array([1, 5, 9], np.uint32), np.array([2, 5, 7], np.uint32)]
    out = np.zeros(6, np.uint32)
    r = native.kway_merge_u32(runs, out=out)
    assert r is out
    np.testing.assert_array_equal(out, [1, 2, 5, 5, 7, 9])


def test_sort_external_pairs_file(tmp_path):
    from cuda.radixsort_tpu.ops.external import sort_external_pairs_file

    rng = np.random.default_rng(8)
    n = 150_000
    keys = rng.integers(0, 1 << 16, size=n).astype(np.uint32)  # dup-heavy
    vals = np.arange(n, dtype=np.uint32)
    kp, vp = tmp_path / "k.u32", tmp_path / "v.u32"
    ko, vo = tmp_path / "ko.u32", tmp_path / "vo.u32"
    keys.tofile(kp)
    vals.tofile(vp)
    assert sort_external_pairs_file(str(kp), str(vp), str(ko), str(vo),
                                    chunk=1 << 15) == n
    o = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.fromfile(ko, dtype=np.uint32),
                                  keys[o])
    np.testing.assert_array_equal(np.fromfile(vo, dtype=np.uint32),
                                  vals[o])


def test_join_external_chunked_matches_oracle():
    from cuda.radixsort_tpu.ops.external import join_external

    rng = np.random.default_rng(11)
    nb, npr = 5_000, 64_123  # npr NOT a chunk multiple: exercises padding
    bk = rng.permutation(np.arange(2 * nb, dtype=np.uint32))[:nb]
    bv = rng.integers(-(1 << 20), 1 << 20, size=nb).astype(np.int32)
    pk = rng.choice(np.arange(2 * nb, dtype=np.uint32), size=npr)

    ok, ov, oi, cnt = join_external(bk, bv, pk, chunk=1 << 14)

    lookup = {int(k): int(v) for k, v in zip(bk, bv)}
    exp_idx = np.array([i for i, k in enumerate(pk) if int(k) in lookup])
    assert cnt == len(exp_idx) == len(ok)
    # probe_idx is globally adjusted and each row matches the oracle value
    assert sorted(oi.tolist()) == sorted(exp_idx.tolist())
    np.testing.assert_array_equal(ok, pk[oi])
    np.testing.assert_array_equal(
        ov, np.array([lookup[int(k)] for k in pk[oi]], np.int32))


def test_join_external_fold_path_counts():
    from cuda.radixsort_tpu.ops.external import join_external

    rng = np.random.default_rng(12)
    nb, npr = 3_000, 40_000
    bk = rng.permutation(np.arange(2 * nb, dtype=np.uint32))[:nb]
    bv = bk.astype(np.int32)
    pk = rng.choice(np.arange(2 * nb, dtype=np.uint32), size=npr)
    total, checksum = join_external(bk, bv, pk, chunk=1 << 13,
                                    materialize=False)
    ok, ov, oi, cnt = join_external(bk, bv, pk, chunk=1 << 13)
    assert total == cnt
    # checksum is an XOR of per-chunk folds — recompute per chunk
    folds = 0
    for lo in range(0, npr, 1 << 13):
        sel = (oi >= lo) & (oi < lo + (1 << 13))
        folds ^= ((int(ok[sel].sum(dtype=np.uint32))
                   ^ int(ov[sel].sum(dtype=np.int32))) & 0xFFFFFFFF)
    assert int(checksum) == folds
