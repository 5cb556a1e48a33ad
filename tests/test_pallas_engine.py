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


def test_pallas_pairs_full_u32():
    rng = np.random.default_rng(1)
    n = 5_000
    keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    vals = np.arange(n, dtype=np.int32)
    gk, gv = rs.sort_pairs(jnp.asarray(keys), jnp.asarray(vals), config=PALLAS)
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(gk), keys[perm])
    np.testing.assert_array_equal(np.asarray(gv), vals[perm])
