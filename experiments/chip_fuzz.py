"""Randomized compiled-path fuzz on the attached chip.

CI runs the kernels under interpret on CPU; this soak runs the COMPILED
paths across random sizes/dtypes/modes and checks bit-exactness against
numpy oracles. Sizes are drawn to cross the r5 routing boundaries
(split-sort-merge engage, plane-widening, pallas compaction, plain_scan).

Usage: FUZZ_TRIALS=40 python experiments/chip_fuzz.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import cuda.radixsort_tpu as rs  # noqa: E402
from cuda.radixsort_tpu.ops.join import join as join_op  # noqa: E402

TRIALS = int(os.environ.get("FUZZ_TRIALS", 30))
rng = np.random.default_rng(int(os.environ.get("FUZZ_SEED", 0)))

SIZES = [1000, 4096, 65535, 65536, 65537, (1 << 18) + 7, (1 << 20) - 1,
         (1 << 21) + (1 << 19), (1 << 22) + 3]
if os.environ.get("FUZZ_BIG") == "1":
    SIZES = [(1 << 24) - 5, 1 << 24, (1 << 24) + (1 << 22),
             (1 << 25) + (1 << 22), (1 << 25) + (1 << 24) + 11]
KEYRANGES = [4, 256, 1 << 16, 1 << 32]


def gen_keys(n, kr, dtype):
    k = rng.integers(0, kr, size=n, dtype=np.uint64)
    if dtype == np.uint32:
        return k.astype(np.uint32)
    if dtype == np.int32:
        return (k.astype(np.int64) - kr // 2).astype(np.int32)
    if dtype == np.float32:
        f = k.astype(np.float32) - kr / 2
        f[:: 17] = -0.0
        return f
    raise AssertionError


def trial(i):
    n = int(rng.choice(SIZES))
    kr = int(rng.choice(KEYRANGES))
    dtype = [np.uint32, np.int32, np.float32][i % 3]
    mode = i % 4
    k = gen_keys(n, kr, dtype)
    desc = bool(rng.integers(0, 2))
    if mode == 0:        # keys-only sort
        got = np.asarray(rs.sort(jnp.asarray(k), descending=desc))
        want = np.sort(k)[::-1] if desc else np.sort(k)
        assert np.array_equal(got, want), f"sort n={n} kr={kr} {dtype}"
        return f"sort {dtype.__name__} n={n} kr={kr} desc={desc}"
    if mode == 1:        # stable pairs (mixed payload dtypes)
        v = np.arange(n, dtype=np.int32)
        vb = (k.view(np.uint32) & 1).astype(bool) if dtype == np.float32 \
            else (k & 1).astype(bool)
        ok, (ov, ob) = rs.sort_pairs(jnp.asarray(k),
                                     (jnp.asarray(v), jnp.asarray(vb)))
        o = np.argsort(k, kind="stable")
        assert np.array_equal(np.asarray(ok), k[o])
        assert np.array_equal(np.asarray(ov), v[o])
        assert np.array_equal(np.asarray(ob), vb[o])
        return f"pairs {dtype.__name__} n={n} kr={kr}"
    if mode == 2:        # unstable pairs
        if dtype != np.uint32:
            return "skip"
        v = np.arange(n, dtype=np.uint32)
        ok, ov = rs.sort_pairs(jnp.asarray(k), jnp.asarray(v), stable=False)
        okh, ovh = np.asarray(ok), np.asarray(ov)
        assert (okh[:-1] <= okh[1:]).all()
        assert sorted(zip(okh.tolist(), ovh.tolist())) == \
            sorted(zip(k.tolist(), v.tolist()))
        return f"unstable pairs n={n} kr={kr}"
    # inner join
    if dtype != np.uint32:
        return "skip"
    nb = max(256, n // 8)
    bk = np.unique(rng.integers(0, kr, size=nb, dtype=np.uint64)
                   .astype(np.uint32))
    bv = rng.integers(-99, 99, size=len(bk)).astype(np.int32)
    ok, ov, oi, cnt = join_op(jnp.asarray(bk), jnp.asarray(bv),
                              jnp.asarray(k), how="inner")
    c = int(cnt)
    okh, ovh = np.asarray(ok)[:c], np.asarray(ov)[:c]
    lut = dict(zip(bk.tolist(), bv.tolist()))
    m = np.isin(k, bk)
    assert c == m.sum(), f"join count n={n} kr={kr}: {c} vs {m.sum()}"
    assert np.array_equal(np.sort(okh), np.sort(k[m]))
    assert all(lut[kk] == vv for kk, vv in zip(okh.tolist(), ovh.tolist()))
    return f"join n={n} kr={kr} nb={len(bk)}"


def main():
    t0 = time.time()
    done = 0
    for i in range(TRIALS):
        label = trial(i)
        done += 1
        print(f"[{i + 1}/{TRIALS}] ok: {label} "
              f"({time.time() - t0:.0f}s)", flush=True)
    print(f"chip_fuzz: PASS {done}/{TRIALS}")


if __name__ == "__main__":
    main()
