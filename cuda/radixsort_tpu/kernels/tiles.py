"""Kernel-safe tile math for the partition stage (2- or 4-bit digits).

All functions here use ONLY primitives that lower in Mosaic TPU kernels
(elementwise ops, pltpu.roll, take_along_axis along the last dim with <=128
lanes, transposes, static slices) — see NOTES.md "Mosaic lowering constraints".
They are pure jnp-in/jnp-out so correctness is tested on CPU through tiny
`pallas_call(interpret=True)` wrappers (tests/test_tiles.py).

Reference semantics being reimplemented (NOT translated):
  * the packed Hillis-Steele prefix over 4x8-bit bucket counters plays the
    role of CUB's packed shared-memory digit counters
    (agent_radix_sort_upsweep.cuh:136-176 packs 4x8-bit counters per uint32);
  * `inrow_sort` is the BlockRadixRank + local exchange of the downsweep agent
    (block_radix_rank.cuh:438-495, agent_radix_sort_downsweep.cuh:271-299),
    vectorized over 128 lanes with a binary-search gather instead of a rank
    scatter (TPU has gather, not scatter).

Digit width is a parameter (the policy-hub knob, CUB tuning_radix_sort.cuh
:358-1063 analogue): nb=16 (4-bit, 4 packed words) is the full-sort sweet
spot of the round-1 cost model; nb=4 (2-bit, ONE packed word) costs ~2.5x
less per stage and wins for 1-2-stage partition-class ops (filter,
selection). Per-row counts <= 128 always fit the packed 8-bit fields.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

NB = 16          # default buckets per stage (4-bit digits)
LANES = 128

_I32 = jnp.int32


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(_I32, shape, len(shape) - 1)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(_I32, shape, 0)


def packed_words(d: jnp.ndarray, nb: int = NB):
    """Digits (R,128) in [0, nb) -> nb//4 packed one-hot words.

    Word j holds buckets [4j, 4j+4), 8 bits per bucket:
    word_j = (1 << 8*(d & 3)) where d>>2 == j else 0.
    """
    shift8 = (d & 3) * jnp.int32(8)
    val = jax.lax.shift_left(jnp.int32(1), shift8)
    if nb == 4:
        return [val]
    hi = d >> 2
    return [jnp.where(hi == j, val, 0) for j in range(nb // 4)]


def lane_inclusive_prefix(w: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along lanes (axis=-1) of packed words.

    Hillis-Steele: 7 log-steps of roll + masked add. Packed 8-bit fields never
    overflow (row counts <= 128 < 256).
    """
    lane = _lane_iota(w.shape)
    s = w
    for k in (1, 2, 4, 8, 16, 32, 64):
        sh = pltpu.roll(s, shift=k, axis=len(w.shape) - 1)
        s = s + jnp.where(lane >= k, sh, 0)
    return s


def field(word: jnp.ndarray, b4: int) -> jnp.ndarray:
    """Extract static 8-bit field b4 (0..3) from packed word."""
    return jax.lax.shift_right_logical(word, jnp.int32(8 * b4)) & 255


def field_dyn(words: list[jnp.ndarray], b: jnp.ndarray) -> jnp.ndarray:
    """Extract per-element field b (0..4*len(words)) from packed word planes."""
    if len(words) == 1:
        w = words[0]
    elif len(words) == 2:
        w = jnp.where(b >> 2 == 0, words[0], words[1])
    else:
        w01 = jnp.where((b >> 2) & 1 == 0, words[0], words[1])
        w23 = jnp.where((b >> 2) & 1 == 0, words[2], words[3])
        w = jnp.where(b >> 3 == 0, w01, w23)
    return jax.lax.shift_right_logical(w, (b & 3) * jnp.int32(8)) & 255


def row_tables(ss: list[jnp.ndarray]):
    """Per-row bucket totals and exclusive in-row bucket bases, packed.

    ss: inclusive prefix words (R,128). Returns (tot, rb):
      tot[j] (R,1): packed per-row counts of buckets 4j..4j+3
      rb[j]  (R,1): packed per-row EXCLUSIVE bases (rowbase[b] = # elements in
                    the row with digit < b) — the in-row striped spine.
    """
    tot = [s[:, LANES - 1 : LANES] for s in ss]
    # within-word exclusive prefix: shift lower fields up
    excl = [(t << 8) + (t << 16) + (t << 24) for t in tot]
    # per-word totals (top field of the inclusive within-word prefix)
    inc = [t + (t << 8) + (t << 16) + (t << 24) for t in tot]
    wt = [jax.lax.shift_right_logical(i, jnp.int32(24)) & 255 for i in inc]
    wb = [jnp.zeros_like(wt[0])]
    for j in range(1, len(ss)):
        wb.append(wb[-1] + wt[j - 1])
    rb = [e + w * jnp.int32(0x01010101) for e, w in zip(excl, wb)]
    return tot, rb


def inrow_sort(digits: jnp.ndarray, planes: list[jnp.ndarray], nb: int = NB):
    """Stable in-row counting sort of every 128-lane row by its digit.

    Returns (sorted_planes, sorted_digits, tot, rb, ss) where sorted_digits is
    the bucket id at each output slot and tot/rb are the packed row tables.

    Slot math: output lane j of row r holds the (j - rowbase[b])-th element
    with digit b where b = bucket of slot j; its source lane is found with a
    7-step binary search over the packed inclusive prefix (f(m) = # digit-b
    elements in lanes < m; src = max m with f(m) <= t, then f(src) == t).
    """
    shape = digits.shape
    ws = packed_words(digits, nb)
    ss = [lane_inclusive_prefix(w) for w in ws]
    tot, rb = row_tables(ss)

    j = _lane_iota(shape)
    # bucket of each output slot: rowbase is non-decreasing over buckets.
    # Broadcast compares against (R,1) columns measure FASTER than a 4-step
    # binary search over the packed fields (Mosaic keeps columns narrow).
    bidx = jnp.zeros(shape, _I32)
    for b in range(1, nb):
        rbf = field(rb[b >> 2], b & 3)  # (R,1)
        bidx = bidx + (j >= rbf).astype(_I32)
    # t = rank within bucket = j - rowbase[bidx]
    t = j - field_dyn(rb, bidx)

    # binary search for src lane: f(m) = field_b(ss[m-1]), f(0) = 0
    pos = jnp.zeros(shape, _I32)
    for k in (64, 32, 16, 8, 4, 2, 1):
        nxt = pos + k
        probe = nxt - 1
        fv = field_dyn([jnp.take_along_axis(s, probe, axis=-1) for s in ss], bidx)
        pos = jnp.where(fv <= t, nxt, pos)

    sorted_planes = [jnp.take_along_axis(p, pos, axis=-1) for p in planes]
    return sorted_planes, bidx, tot, rb, ss


def bucket_count_table(tot: list[jnp.ndarray], rows: int, nb: int = NB):
    """SC (R,128): lane b<nb holds the row's bucket-b count (0 elsewhere),
    plus its exclusive prefix over rows (SCexcl) and the tile totals (1,128).

    The (rows x buckets) table in lane-major layout lets ALL per-bucket
    row-prefixes be computed with ONE sublane Hillis-Steele scan.
    """
    shape = (rows, LANES)
    lane = _lane_iota(shape)
    sc = jnp.zeros(shape, _I32)
    for jw in range(len(tot)):
        t = jnp.broadcast_to(tot[jw], shape)
        f = jax.lax.shift_right_logical(t, (lane & 3) * jnp.int32(8)) & 255
        sc = sc + jnp.where((lane >> 2) == jw, f, 0)
    sc = jnp.where(lane < nb, sc, 0)

    row = _row_iota(shape)
    inc = sc
    k = 1
    while k < rows:
        sh = pltpu.roll(inc, shift=k, axis=0)
        inc = inc + jnp.where(row >= k, sh, 0)
        k *= 2
    scexcl = inc - sc
    tiletot = inc[rows - 1 : rows, :]
    return sc, scexcl, tiletot
