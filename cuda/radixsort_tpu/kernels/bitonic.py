"""Pallas bitonic sort engine — comparison-domain full sort.

Why this exists: the radix stage kernel (stage.py) is the right machinery for
*partitioning* (1-2 passes), but a full 8-pass radix sort costs ~5000 VPU
ops/element — more than a bitonic network's ~1000 (NOTES.md cost model). XLA's
own lax.sort is a bitonic-family network too, but measured at ~2100 effective
ops/element (0.45 G/s @2^24) and decaying with N; a hand-scheduled Pallas
bitonic with cheap per-stage primitives beats it.

Structure (all comparisons = min/max + select; no data-dependent control):
  * tile sort kernel: each (R x 128) VMEM tile fully bitonic-sorted, tiles
    alternating direction (global bitonic invariant). Stage primitive by
    stride s:
      - s < 128 (lane dim): partner via XOR lane gather
        (jnp.take_along_axis with the constant index lane^s — Mosaic lane
        gathers run at ~1 elementwise-op, NOTES.md probe5/6);
      - s >= 128 (row dim): partner via two static cyclic sublane rolls +
        select.
  * cross stages (stride >= merge block): the grouped-span kernel stages a
    butterfly of 2^c half-MB sub-blocks through VMEM via manual DMA and
    runs c consecutive stages per HBM round trip (in-place aliased — N
    read + N write per span; serves c=1 leftovers too, which keeps every
    pass in-place and lets 1B keys fit one chip);
  * tile merge kernel: after the cross stages of global level k, each
    block finishes the level's strides (block/2 .. 1) in VMEM with a
    scalar per-block direction.

Reference role: this is the framework's answer to the reference's
single-tile/block-sort path (CUB block_radix_sort.cuh SortBlockedToStriped)
generalized to the full-device problem — a comparison network instead of
rank-and-exchange because the TPU VPU has no scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32
_U32 = jnp.uint32

LOG_LANES = 7
LANES = 128


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(_I32, shape, 1)


def _row_iota(shape):
    return jax.lax.broadcasted_iota(_I32, shape, 0)


def _cmpex(x, partner, dirhi):
    """One compare-exchange: keep max where dirhi else min."""
    return jnp.where(dirhi, jnp.maximum(x, partner), jnp.minimum(x, partner))


def _cmpex_planes(planes, partners, dirhi, n_cmp: int):
    """Compare-exchange a plane set. The first |n_cmp| planes compare
    lexicographically; remaining planes ride the same exchange mask
    (payloads).

    n_cmp > 0 (fast path): ride planes are only correct when the comparand
    tuple is a TOTAL ORDER over rows (make the last comparand an index
    plane and the network is STABLE). On a tie the min side takes the
    partner while the max side keeps its own — one row's rides duplicated,
    the other's lost — so ties must be impossible.

    n_cmp < 0 (tie-safe rides): the min side takes the partner only on a
    STRICT greater-than, so tied rows never exchange and ride planes stay a
    permutation under duplicate comparands — an UNSTABLE pairs sort with no
    index plane (thrust::sort_by_key semantics). Costs one extra eq + two
    mask ops per stage; measured vs carrying the idx tie-break plane in
    NOTES r4."""
    if len(planes) == 1:
        return [_cmpex(planes[0], partners[0], dirhi)]
    k = min(abs(n_cmp), len(planes))
    if n_cmp < 0 and k == 1:
        # single-comparand tie-safe shortcut: resolve the comparand with
        # min/max (ties resolve to the own value), then rides take the
        # partner exactly where the comparand CHANGED — no lt/eq/gt chain.
        # Measured: the boolean-blend formulation below erased the win of
        # dropping the idx plane (57.6 vs 58.6 ms @2^25); this one prices
        # the ride mask at 1 neq.
        new0 = _cmpex(planes[0], partners[0], dirhi)
        take_partner = new0 != planes[0]
        return [new0] + [jnp.where(take_partner, p, x)
                         for x, p in zip(planes[1:], partners[1:])]
    lt = planes[0] < partners[0]
    eq = None
    for i in range(1, k):
        eq = (planes[i - 1] == partners[i - 1]) if eq is None else (
            eq & (planes[i - 1] == partners[i - 1]))
        lt = lt | (eq & (planes[i] < partners[i]))
    if n_cmp < 0 and len(planes) > k:
        eq = (planes[k - 1] == partners[k - 1]) if eq is None else (
            eq & (planes[k - 1] == partners[k - 1]))
        # boolean blend, not jnp.where — Mosaic can't select between i1
        # vectors ("Unsupported target bitwidth for truncation");
        # take = dirhi ? lt : ~(lt|eq), folded as below
        le = lt | eq
        take_partner = (dirhi & lt) | jnp.logical_not(dirhi | le)
    else:
        take_partner = jnp.logical_xor(lt, jnp.logical_not(dirhi))
    return [jnp.where(take_partner, p, x) for x, p in zip(planes, partners)]


def _stage_in_tile(planes, log_s: int, desc, n_cmp: int):
    """One bitonic stage of stride 2^log_s inside (R,128) tiles.

    desc: bool mask (or broadcastable scalar) — comparison direction per
    element (True = descending block).
    """
    shape = planes[0].shape
    if log_s < LOG_LANES:
        # lane-dim XOR partner: one constant-index gather per plane (~1
        # elementwise-op). The driver traces with x64 off, so the gather
        # indices stay i32 (Mosaic rejects 64-bit).
        s = 1 << log_s
        idx = _lane_iota(shape) ^ s
        partners = [jnp.take_along_axis(x, idx, axis=-1) for x in planes]
        hi = (_lane_iota(shape) & s) != 0
    else:
        # row-dim XOR partner: two cyclic sublane rolls + select (i32 shift
        # scalars — tpu.dynamic_rotate rejects i64)
        rs = 1 << (log_s - LOG_LANES)
        r = shape[0]
        hi = (_row_iota(shape) & rs) != 0
        partners = [
            jnp.where(hi,
                      pltpu.roll(x, shift=jnp.int32(rs), axis=0),
                      pltpu.roll(x, shift=jnp.int32(r - rs), axis=0))
            for x in planes
        ]
    return _cmpex_planes(planes, partners, jnp.logical_xor(hi, desc), n_cmp)


def _desc_mask(shape, k: int, log_tile: int, tile_desc):
    """Direction of global level k for elements of one tile.

    Level-k blocks are 2^k long; element i descends iff bit k of its global
    index is set. For k < log_tile that bit lives in the in-tile index
    (iota masks); for k >= log_tile it is the per-tile scalar tile_desc.
    """
    if k < LOG_LANES:
        m = (_lane_iota(shape) & (1 << k)) != 0
    elif k < log_tile:
        m = (_row_iota(shape) & (1 << (k - LOG_LANES))) != 0
    else:
        m = jnp.zeros(shape, jnp.bool_)
    return jnp.logical_xor(m, tile_desc)


# Mosaic has no unsigned vector min/max (arith.maxui fails to legalize), so
# kernels compare in signed space: bias u32 -> i32 by XORing the sign bit at
# load and undo at store (order-preserving bijection — the same trick as the
# signed-key twiddle, in reverse). Comparison planes get the bias; payload
# planes pass through as raw u32 (never compared).
def _load_planes(refs, n_cmp: int):
    sign = jnp.int32(-(1 << 31))
    out = []
    for i, r in enumerate(refs):
        if i < abs(n_cmp):
            out.append(jax.lax.bitcast_convert_type(r[...], jnp.int32) ^ sign)
        else:
            out.append(r[...])
    return out


def _store_planes(refs, planes, n_cmp: int):
    sign = jnp.int32(-(1 << 31))
    for i, (r, x) in enumerate(zip(refs, planes)):
        if i < abs(n_cmp):
            r[...] = jax.lax.bitcast_convert_type(x ^ sign, _U32)
        else:
            r[...] = x


def _tile_sort_body(log_tile: int, n_planes: int, n_cmp: int, *refs):
    ins, outs = refs[:n_planes], refs[n_planes:]
    t = pl.program_id(0)
    planes = _load_planes(ins, n_cmp)
    tile_desc = (t & 1) == 1  # global bit log_tile of this tile's base index
    for k in range(1, log_tile + 1):
        desc = _desc_mask(planes[0].shape, k, log_tile, tile_desc)
        for log_s in range(k - 1, -1, -1):
            planes = _stage_in_tile(planes, log_s, desc, n_cmp)
    _store_planes(outs, planes, n_cmp)


# --- transpose-phased bodies (r3) ------------------------------------------
# Measured on v5e (experiments/probe_vpu_ceiling2 / probe_lane_roll): a
# sublane ROLL compare-exchange costs ~0.5 op-units/stage while a lane
# XOR-GATHER stage costs ~2.4, and an in-kernel (128,128) transpose ~2.1.
# So instead of paying the gather on every stride < 128, these bodies keep
# the tile in a TRANSPOSED frame (lanes hold network bits 7..13, sublanes
# hold bits 0..6 and >=14) where strides 0..6 are cheap rolls, and hop to
# the standard frame only for the strides-7..13 phase of each level — two
# transposes per level instead of seven gathers.


def _to_xp(x):
    """Swap network bits [0..6] (lanes) with [7..13] (low row bits):
    (R,128) -> view (R/128, 128, 128) -> swap the two 128 dims. Involution."""
    r = x.shape[0]
    return jnp.swapaxes(x.reshape(r // LANES, LANES, LANES), 1, 2).reshape(
        r, LANES)


def _stage_roll_rows(planes, rbit: int, desc, n_cmp: int):
    """Compare-exchange where the network stride lives in ROW bit `rbit`
    of the current frame: partner via two static cyclic sublane rolls."""
    shape = planes[0].shape
    rs = 1 << rbit
    r = shape[0]
    hi = (_row_iota(shape) & rs) != 0
    partners = [
        jnp.where(hi, pltpu.roll(x, shift=jnp.int32(rs), axis=0),
                  pltpu.roll(x, shift=jnp.int32(r - rs), axis=0))
        for x in planes
    ]
    return _cmpex_planes(planes, partners, jnp.logical_xor(hi, desc), n_cmp)


def _desc_mask_xp(shape, k: int, log_block: int, tile_desc):
    """Direction of level k in the TRANSPOSED frame: network bit k lives in
    row bit k (k<7), lane bit k-7 (7<=k<14), row bit k-7 (k>=14)."""
    if k < LOG_LANES:
        m = (_row_iota(shape) & (1 << k)) != 0
    elif k < 2 * LOG_LANES:
        m = (_lane_iota(shape) & (1 << (k - LOG_LANES))) != 0
    elif k < log_block:
        m = (_row_iota(shape) & (1 << (k - LOG_LANES))) != 0
    else:
        m = jnp.zeros(shape, jnp.bool_)
    return jnp.logical_xor(m, tile_desc)


def _level_xp(planes, k: int, log_block: int, tile_desc, n_cmp: int,
              resident_xp: bool):
    """All strides of level k with every compare-exchange a row roll.

    resident_xp: planes arrive (and leave) in the transposed frame; else
    standard. Phases: strides >=14 are row rolls in EITHER frame; strides
    13..7 need the STANDARD frame; strides 6..0 the TRANSPOSED frame.
    """
    nst = min(k, log_block)
    if resident_xp:
        desc = _desc_mask_xp(planes[0].shape, k, log_block, tile_desc)
        for log_s in range(nst - 1, 2 * LOG_LANES - 1, -1):
            planes = _stage_roll_rows(planes, log_s - LOG_LANES, desc, n_cmp)
        if nst - 1 >= LOG_LANES:
            planes = [_to_xp(x) for x in planes]
            desc_s = _desc_mask(planes[0].shape, k, log_block, tile_desc)
            for log_s in range(min(nst - 1, 2 * LOG_LANES - 1),
                               LOG_LANES - 1, -1):
                planes = _stage_roll_rows(planes, log_s - LOG_LANES,
                                          desc_s, n_cmp)
            planes = [_to_xp(x) for x in planes]
        for log_s in range(min(nst - 1, LOG_LANES - 1), -1, -1):
            planes = _stage_roll_rows(planes, log_s, desc, n_cmp)
        return planes
    # standard-resident (merge bodies): strides >= 7 here, 6..0 transposed
    desc = _desc_mask(planes[0].shape, k, log_block, tile_desc)
    for log_s in range(nst - 1, LOG_LANES - 1, -1):
        planes = _stage_roll_rows(planes, log_s - LOG_LANES, desc, n_cmp)
    planes = [_to_xp(x) for x in planes]
    desc_x = _desc_mask_xp(planes[0].shape, k, log_block, tile_desc)
    for log_s in range(min(nst - 1, LOG_LANES - 1), -1, -1):
        planes = _stage_roll_rows(planes, log_s, desc_x, n_cmp)
    return [_to_xp(x) for x in planes]


def _tile_sort_body_xp(log_tile: int, n_planes: int, n_cmp: int, *refs):
    ins, outs = refs[:n_planes], refs[n_planes:]
    t = pl.program_id(0)
    planes = [_to_xp(x) for x in _load_planes(ins, n_cmp)]
    tile_desc = (t & 1) == 1
    for k in range(1, log_tile + 1):
        planes = _level_xp(planes, k, log_tile, tile_desc, n_cmp,
                           resident_xp=True)
    _store_planes(outs, [_to_xp(x) for x in planes], n_cmp)


def _tile_merge_body_xp(log_block: int, k: int, n_planes: int, n_cmp: int,
                        *refs):
    ins, outs = refs[:n_planes], refs[n_planes:]
    t = pl.program_id(0)
    planes = _load_planes(ins, n_cmp)
    if k >= log_block:
        tile_desc = ((t >> (k - log_block)) & 1) == 1
    else:
        tile_desc = False
    planes = _level_xp(planes, k, log_block, tile_desc, n_cmp,
                       resident_xp=False)
    _store_planes(outs, planes, n_cmp)


# --- fori-compact stage bodies -------------------------------------------
# The fully-unrolled bodies above emit ~log_tile^2/2 stages of Mosaic code;
# at 3+ planes the program size kills compilation (round-1: 3-plane lt=16
# failed, lt=14 required). These variants roll each level's stride loop into
# fori_loops with TRACED strides (dynamic lane-XOR gather / dynamic
# sublane rotate both lower in Mosaic) — program size drops from O(lt^2) to
# O(lt) at a small per-stage overhead. Selected for n_planes >= 3
# (sort_planes_bitonic compact='auto').


def _stage_dyn_lane(planes, log_s, desc, n_cmp: int):
    """One lane stage of TRACED stride 2^log_s (log_s < LOG_LANES)."""
    shape = planes[0].shape
    s = jax.lax.shift_left(jnp.int32(1), log_s)
    idx = _lane_iota(shape) ^ s
    partners = [jnp.take_along_axis(x, idx, axis=-1) for x in planes]
    hi = (_lane_iota(shape) & s) != 0
    return tuple(_cmpex_planes(list(planes), partners,
                               jnp.logical_xor(hi, desc), n_cmp))


def _stage_dyn_row(planes, log_rs, desc, n_cmp: int):
    """One sublane stage of TRACED row stride 2^log_rs."""
    shape = planes[0].shape
    r = shape[0]
    rs = jax.lax.shift_left(jnp.int32(1), log_rs)
    hi = (_row_iota(shape) & rs) != 0
    partners = [
        jnp.where(hi,
                  pltpu.roll(x, shift=rs, axis=0),
                  pltpu.roll(x, shift=jnp.int32(r) - rs, axis=0))
        for x in planes
    ]
    return tuple(_cmpex_planes(list(planes), partners,
                               jnp.logical_xor(hi, desc), n_cmp))


def _level_compact(planes, k: int, log_block: int, tile_desc, n_cmp: int):
    """All strides of global level k (min(k, log_block)-1 .. 0) as two
    fori_loops (row strides, then lane strides) with traced strides — no
    lax.cond (Mosaic predicates conds by evaluating both sides)."""
    desc = _desc_mask(planes[0].shape, k, log_block, tile_desc)
    nst = min(k, log_block)
    nrow = max(nst - LOG_LANES, 0)
    if nrow > 0:
        def rbody(i, ps):
            return _stage_dyn_row(ps, jnp.int32(nst - 1 - LOG_LANES) - i,
                                  desc, n_cmp)
        planes = jax.lax.fori_loop(0, nrow, rbody, tuple(planes))
    nlane = min(nst, LOG_LANES)

    def lbody(i, ps):
        return _stage_dyn_lane(ps, jnp.int32(nlane - 1) - i, desc, n_cmp)

    return list(jax.lax.fori_loop(0, nlane, lbody, tuple(planes)))


def _tile_sort_body_compact(log_tile: int, n_planes: int, n_cmp: int, *refs):
    ins, outs = refs[:n_planes], refs[n_planes:]
    t = pl.program_id(0)
    planes = _load_planes(ins, n_cmp)
    tile_desc = (t & 1) == 1
    for k in range(1, log_tile + 1):
        planes = _level_compact(planes, k, log_tile, tile_desc, n_cmp)
    _store_planes(outs, planes, n_cmp)


def _tile_merge_body_compact(log_block: int, k: int, n_planes: int,
                             n_cmp: int, *refs):
    ins, outs = refs[:n_planes], refs[n_planes:]
    t = pl.program_id(0)
    planes = _load_planes(ins, n_cmp)
    if k >= log_block:
        tile_desc = ((t >> (k - log_block)) & 1) == 1
    else:
        tile_desc = False
    planes = _level_compact(planes, k, log_block, tile_desc, n_cmp)
    _store_planes(outs, planes, n_cmp)


def _tile_merge_body(log_block: int, k: int, n_planes: int, n_cmp: int, *refs):
    """Finish global level k inside one block: strides min(k,block)/2 .. 1.

    The merge block can be much larger than the sort tile — its program is
    only ~log_block stages, so VMEM (not program size) bounds it."""
    ins, outs = refs[:n_planes], refs[n_planes:]
    t = pl.program_id(0)
    planes = _load_planes(ins, n_cmp)
    if k >= log_block:
        tile_desc = ((t >> (k - log_block)) & 1) == 1
    else:
        tile_desc = False
    desc = _desc_mask(planes[0].shape, k, log_block, tile_desc)
    for log_s in range(min(k, log_block) - 1, -1, -1):
        planes = _stage_in_tile(planes, log_s, desc, n_cmp)
    _store_planes(outs, planes, n_cmp)


# v5e VMEM is 128 MiB; the default scoped limit (16 MiB) is too small for
# big merge blocks whose unrolled stages keep several live tile copies.
# The full 128 MiB: 3-plane lm=20 merges need ~128M scoped (measured r2).
_VMEM_LIMIT = 128 * 1024 * 1024


def _tile_call(body, n_planes: int, nrows: int, rows_per_tile: int,
               interpret: bool):
    spec = pl.BlockSpec((rows_per_tile, LANES), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        body,
        grid=(nrows // rows_per_tile,),
        in_specs=[spec] * n_planes,
        out_shape=[jax.ShapeDtypeStruct((nrows, LANES), _U32)] * n_planes,
        out_specs=[spec] * n_planes,
        # identity block mapping: each grid step reads only the block it
        # writes, so in-place buffers are safe — halves peak HBM (matters
        # at the 2^28+ sizes where N-sized copies exhaust the 16GB chip)
        input_output_aliases={i: i for i in range(n_planes)},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )


def _cross_span_body(c: int, k: int, log_block: int, base_bit: int,
                     brows: int, n_planes: int, n_cmp: int, nslots: int,
                     *refs):
    """Manual-DMA butterfly: c consecutive cross stages in ONE HBM round
    trip. Each grid step owns a group of 2^c blocks (those connected by the
    c strides), stages them through VMEM, compare-exchanges slot pairs, and
    writes every member back — N read + N write for c stages, vs 3N per
    stage for the single-stage pair kernel.

    MULTI-BUFFERED across grid steps (VERDICT r1 #1a; r4 #3 deepened 2→N
    slots): scratch holds `nslots` slots; step p reclaims the slot last
    used by step p-(nslots-1) (waiting that step's writeback), prefetches
    step p+1's input into it, then computes on the input prefetched at
    step p-1. With nslots=2 the reclaim wait (out of step p-1, started one
    step ago) sits on the critical path ahead of in(p+1); with nslots=3 the
    reclaimed slot's writeback started TWO steps ago and is long drained —
    per-step cost drops from max(compute, out-tail + in) toward
    max(compute, DMA bandwidth). Member sets of different grid steps
    partition the rows, so the in-place aliasing stays hazard-free.
    """
    ins = refs[:n_planes]
    outs = refs[n_planes:2 * n_planes]
    scratch = refs[2 * n_planes:3 * n_planes]   # (nslots*g*brows, 128) each
    insem, outsem = refs[3 * n_planes], refs[3 * n_planes + 1]
    g = 1 << c
    p = pl.program_id(0)
    nt = pl.num_programs(0)
    slot = jax.lax.rem(p, nslots)
    reclaim = jax.lax.rem(p + 1, nslots)   # slot of step p+1 == p-(nslots-1)

    def member(step, m):
        low = step & ((1 << base_bit) - 1) if base_bit else 0
        high = (step >> base_bit) << (base_bit + c)
        return high | (m << base_bit) | low

    # per-SLOT semaphores: in(p) and in(p+1) are in flight simultaneously,
    # so they must not share a semaphore — a shared one lets step p's wait
    # be satisfied by step p+1's completions and compute reads a
    # half-transferred slot (hardware-only data race; interpret mode
    # executes DMAs eagerly and never sees it)
    def in_copies(step, slt):
        # base_bit == 0 => the g members are one contiguous row range:
        # one DMA per plane instead of g (narrow spans at lb == lo are
        # issue-latency-bound otherwise — round-4 span-plan sweep)
        if base_bit == 0:
            return [pltpu.make_async_copy(
                ins[q].at[pl.ds(member(step, 0) * brows, g * brows), :],
                scratch[q].at[pl.ds(slt * g * brows, g * brows), :],
                insem.at[slt]) for q in range(n_planes)]
        cps = []
        for m in range(g):
            for q in range(n_planes):
                cps.append(pltpu.make_async_copy(
                    ins[q].at[pl.ds(member(step, m) * brows, brows), :],
                    scratch[q].at[pl.ds((slt * g + m) * brows, brows), :],
                    insem.at[slt]))
        return cps

    def out_copies(step, slt):
        if base_bit == 0:
            return [pltpu.make_async_copy(
                scratch[q].at[pl.ds(slt * g * brows, g * brows), :],
                outs[q].at[pl.ds(member(step, 0) * brows, g * brows), :],
                outsem.at[slt]) for q in range(n_planes)]
        cps = []
        for m in range(g):
            for q in range(n_planes):
                cps.append(pltpu.make_async_copy(
                    scratch[q].at[pl.ds((slt * g + m) * brows, brows), :],
                    outs[q].at[pl.ds(member(step, m) * brows, brows), :],
                    outsem.at[slt]))
        return cps

    # step 0 prefetches itself (prologue)
    @pl.when(p == 0)
    def _():
        for cp in in_copies(p, slot):
            cp.start()

    # reclaim the next slot: wait for step p-(nslots-1)'s writeback before
    # prefetching step p+1 into it (sems persist across sequential steps)
    @pl.when(p >= nslots - 1)
    def _():
        for cp in out_copies(p - (nslots - 1), reclaim):
            cp.wait()

    @pl.when(p + 1 < nt)
    def _():
        for cp in in_copies(p + 1, reclaim):
            cp.start()

    # wait for this step's input (started at step p-1, or just above for 0)
    for cp in in_copies(p, slot):
        cp.wait()

    sign = jnp.int32(-(1 << 31))

    def slot_ref(q, m):
        return scratch[q][pl.ds((slot * g + m) * brows, brows), :]

    for j in range(c - 1, -1, -1):  # descending strides: bit j of m-space
        for m in range(g):
            if m & (1 << j):
                continue
            mp = m | (1 << j)
            a_desc = ((member(p, m) >> (k - log_block)) & 1) == 1
            planes_a, planes_b = [], []
            for q in range(n_planes):
                xa, xb = slot_ref(q, m), slot_ref(q, mp)
                if q < abs(n_cmp):
                    xa = jax.lax.bitcast_convert_type(xa, jnp.int32) ^ sign
                    xb = jax.lax.bitcast_convert_type(xb, jnp.int32) ^ sign
                planes_a.append(xa)
                planes_b.append(xb)
            lo_side = _cmpex_planes(planes_a, planes_b, a_desc, n_cmp)
            hi_side = _cmpex_planes(planes_b, planes_a,
                                    jnp.logical_not(a_desc), n_cmp)
            for q in range(n_planes):
                ya, yb = lo_side[q], hi_side[q]
                if q < abs(n_cmp):
                    ya = jax.lax.bitcast_convert_type(ya ^ sign, _U32)
                    yb = jax.lax.bitcast_convert_type(yb ^ sign, _U32)
                scratch[q][pl.ds((slot * g + m) * brows, brows), :] = ya
                scratch[q][pl.ds((slot * g + mp) * brows, brows), :] = yb

    for cp in out_copies(p, slot):
        cp.start()

    # epilogue: drain every still-outstanding writeback (steps p-nslots+2
    # .. p; earlier ones were waited by the reclaim above)
    @pl.when(p == nt - 1)
    def _():
        for d in range(nslots - 1):
            @pl.when(p >= d)
            def _(d=d):
                for cp in out_copies(p - d, jax.lax.rem(p - d, nslots)):
                    cp.wait()


def _cross_span_body_strided(c: int, k: int, log_block: int, base_bit: int,
                             brows: int, n_planes: int, n_cmp: int,
                             nslots: int, *refs):
    """Multi-buffered span body with ONE strided DMA per plane per side.

    The flat body issues 2^c separate sub-block copies per plane per side
    per step; at 0.5 MB blocks the per-copy issue overhead is comparable to
    the transfer time and span trips run at ~57% of HBM bandwidth (NOTES r3:
    grouped span c=5 measures 3.3 units/stage vs the ~1.95 bandwidth floor).
    Here the caller reshapes each plane to (nhigh, g, nlow, brows, LANES),
    so one member set is the strided slice [high, :, low] and each side is
    a single multi-dim DMA descriptor per plane — the DMA engine walks the
    stride instead of the core issuing g descriptors."""
    ins = refs[:n_planes]
    outs = refs[n_planes:2 * n_planes]
    scratch = refs[2 * n_planes:3 * n_planes]  # (nslots, g, brows, LANES)
    insem, outsem = refs[3 * n_planes], refs[3 * n_planes + 1]
    g = 1 << c
    p = pl.program_id(0)
    nt = pl.num_programs(0)
    slot = jax.lax.rem(p, nslots)
    reclaim = jax.lax.rem(p + 1, nslots)
    nlow = 1 << base_bit

    def hi_lo(step):
        if base_bit == 0:
            return step, 0
        return jax.lax.div(step, nlow), jax.lax.rem(step, nlow)

    def in_copies(step, slt):
        h, lo = hi_lo(step)
        return [pltpu.make_async_copy(
            ins[q].at[h, :, lo], scratch[q].at[slt], insem.at[slt])
            for q in range(n_planes)]

    def out_copies(step, slt):
        h, lo = hi_lo(step)
        return [pltpu.make_async_copy(
            scratch[q].at[slt], outs[q].at[h, :, lo], outsem.at[slt])
            for q in range(n_planes)]

    @pl.when(p == 0)
    def _():
        for cp in in_copies(p, slot):
            cp.start()

    @pl.when(p >= nslots - 1)
    def _():
        for cp in out_copies(p - (nslots - 1), reclaim):
            cp.wait()

    @pl.when(p + 1 < nt)
    def _():
        for cp in in_copies(p + 1, reclaim):
            cp.start()

    for cp in in_copies(p, slot):
        cp.wait()

    sign = jnp.int32(-(1 << 31))

    def member_desc(m):
        # descending-direction bit of member m's global block index: the
        # low/high halves of level k alternate every 2^(k-log_block) blocks
        h, lo = hi_lo(p)
        gidx = (h << (base_bit + c)) | (m << base_bit) | (
            lo if base_bit else 0)
        return ((gidx >> (k - log_block)) & 1) == 1

    for j in range(c - 1, -1, -1):
        for m in range(g):
            if m & (1 << j):
                continue
            mp = m | (1 << j)
            a_desc = member_desc(m)
            planes_a, planes_b = [], []
            for q in range(n_planes):
                xa = scratch[q][slot, m]
                xb = scratch[q][slot, mp]
                if q < abs(n_cmp):
                    xa = jax.lax.bitcast_convert_type(xa, jnp.int32) ^ sign
                    xb = jax.lax.bitcast_convert_type(xb, jnp.int32) ^ sign
                planes_a.append(xa)
                planes_b.append(xb)
            lo_side = _cmpex_planes(planes_a, planes_b, a_desc, n_cmp)
            hi_side = _cmpex_planes(planes_b, planes_a,
                                    jnp.logical_not(a_desc), n_cmp)
            for q in range(n_planes):
                ya, yb = lo_side[q], hi_side[q]
                if q < abs(n_cmp):
                    ya = jax.lax.bitcast_convert_type(ya ^ sign, _U32)
                    yb = jax.lax.bitcast_convert_type(yb ^ sign, _U32)
                scratch[q][slot, m] = ya
                scratch[q][slot, mp] = yb

    for cp in out_copies(p, slot):
        cp.start()

    @pl.when(p == nt - 1)
    def _():
        for d in range(nslots - 1):
            @pl.when(p >= d)
            def _(d=d):
                for cp in out_copies(p - d, jax.lax.rem(p - d, nslots)):
                    cp.wait()


def _cross_span_body_sb(c: int, k: int, log_block: int, base_bit: int,
                     brows: int, n_planes: int, n_cmp: int, *refs):
    """Manual-DMA butterfly: c consecutive cross stages in ONE HBM round
    trip. Each grid step owns a group of 2^c blocks (those connected by the
    c strides), stages them through VMEM, compare-exchanges slot pairs, and
    writes every member back — N read + N write for c stages, vs 3N per
    stage for the single-stage pair kernel."""
    ins = refs[:n_planes]
    outs = refs[n_planes:2 * n_planes]
    scratch = refs[2 * n_planes:3 * n_planes]
    sem = refs[3 * n_planes]
    g = 1 << c
    p = pl.program_id(0)
    low = p & ((1 << base_bit) - 1) if base_bit else 0
    high = (p >> base_bit) << (base_bit + c)

    def member(m):
        return high | (m << base_bit) | low

    # batch-start all input DMAs, then wait — transfers overlap (a serial
    # start+wait per chunk is latency-bound: ~0.3 ms/pass vs the ~80 us
    # bandwidth floor at 2^24). base_bit == 0: contiguous group, one DMA
    # per plane.
    cps = []
    if base_bit == 0:
        for q in range(n_planes):
            cp = pltpu.make_async_copy(
                ins[q].at[pl.ds(member(0) * brows, g * brows), :],
                scratch[q].at[pl.ds(0, g * brows), :], sem)
            cp.start()
            cps.append(cp)
    else:
        for m in range(g):
            for q in range(n_planes):
                cp = pltpu.make_async_copy(
                    ins[q].at[pl.ds(member(m) * brows, brows), :],
                    scratch[q].at[pl.ds(m * brows, brows), :], sem)
                cp.start()
                cps.append(cp)
    for cp in cps:
        cp.wait()

    sign = jnp.int32(-(1 << 31))

    def slot(q, m):
        return scratch[q][pl.ds(m * brows, brows), :]

    for j in range(c - 1, -1, -1):  # descending strides: bit j of m-space
        for m in range(g):
            if m & (1 << j):
                continue
            mp = m | (1 << j)
            a_desc = ((member(m) >> (k - log_block)) & 1) == 1
            planes_a, planes_b = [], []
            for q in range(n_planes):
                xa, xb = slot(q, m), slot(q, mp)
                if q < abs(n_cmp):
                    xa = jax.lax.bitcast_convert_type(xa, jnp.int32) ^ sign
                    xb = jax.lax.bitcast_convert_type(xb, jnp.int32) ^ sign
                planes_a.append(xa)
                planes_b.append(xb)
            lo_side = _cmpex_planes(planes_a, planes_b, a_desc, n_cmp)
            hi_side = _cmpex_planes(planes_b, planes_a,
                                    jnp.logical_not(a_desc), n_cmp)
            for q in range(n_planes):
                ya, yb = lo_side[q], hi_side[q]
                if q < abs(n_cmp):
                    ya = jax.lax.bitcast_convert_type(ya ^ sign, _U32)
                    yb = jax.lax.bitcast_convert_type(yb ^ sign, _U32)
                scratch[q][pl.ds(m * brows, brows), :] = ya
                scratch[q][pl.ds(mp * brows, brows), :] = yb

    cps = []
    if base_bit == 0:
        for q in range(n_planes):
            cp = pltpu.make_async_copy(
                scratch[q].at[pl.ds(0, g * brows), :],
                outs[q].at[pl.ds(member(0) * brows, g * brows), :], sem)
            cp.start()
            cps.append(cp)
    else:
        for m in range(g):
            for q in range(n_planes):
                cp = pltpu.make_async_copy(
                    scratch[q].at[pl.ds(m * brows, brows), :],
                    outs[q].at[pl.ds(member(m) * brows, brows), :], sem)
                cp.start()
                cps.append(cp)
    for cp in cps:
        cp.wait()


def _span_log_block(n_planes: int = 1) -> int:
    """Span sub-block size (log elems). RS_SPAN_LOG_BLOCK overrides for
    geometry sweeps (a smaller block admits a wider span c at the same VMEM
    budget; a larger one amortizes DMA latency over fewer, bigger
    transfers). Measured v5e (experiments/sweep_span_geometry, round 3):
    0.5 MB blocks for 1-2 planes; 0.25 MB for 3+ planes, where the halved
    block buys a wider double-buffered span (c=5) within the same VMEM —
    256M 4-plane contract 1179 -> 1067 ms with the c/db defaults below."""
    import os

    ov = os.environ.get("RS_SPAN_LOG_BLOCK")
    if ov:
        return int(ov)
    return 17 if n_planes <= 2 else 16




def _span_slots(n_planes: int, c: int, brows: int) -> int:
    """Scratch slots for the multi-buffered span body. 3 slots take the
    slot-reclaim writeback wait off the critical path ahead of the next
    prefetch (see _cross_span_body); fall back to 2 when a third slot
    would push span scratch past 64 MiB (the round-3 budget line — the
    96 MiB 3-slot 4-plane configuration SIGKILLed the remote compile
    helper, r5). RS_SPAN_SLOTS overrides for sweeps."""
    import os

    ov = os.environ.get("RS_SPAN_SLOTS")
    if ov:
        # the rotation needs >= 2 slots: with 1 slot the reclaim gate at
        # step 0 waits a writeback that was never issued (deadlock on
        # hardware — r5 review); single-buffered sweeps use RS_SPAN_DB=0
        return max(int(ov), 2)
    slot_bytes = (1 << c) * brows * LANES * 4 * n_planes
    return 3 if 3 * slot_bytes <= 64 * 1024 * 1024 else 2


def _use_xp() -> bool:
    """Transpose-phased stage bodies (roll-only compare-exchanges)."""
    import os

    return os.environ.get("RS_XP", "0") == "1"


def _span_c_max(n_planes: int) -> int:
    """Grouped-span width: nslots x 2^c sub-blocks x n_planes of scratch
    must fit VMEM alongside the span program. RS_SPAN_CMAX overrides for
    sweeps. Measured v5e: 1 plane keeps c=5 (round-3 sweep, 0.5 MB blocks;
    3 slots fit at 48 MB); 2+ planes take c=4 so the 3-slot rotation stays
    under the 64 MiB scratch line — the round-5 contract sweep measured
    c=4/3-slot at 1045 ms vs c=5/2-slot at 1057 ms
    (experiments/sweep_contract_r5.py)."""
    import os

    ov = os.environ.get("RS_SPAN_CMAX")
    if ov:
        return int(ov)
    return 4 if n_planes >= 2 else 5


def _span_budget_log(n_planes: int) -> int:
    """log2 of the per-slot span group size (elements) that fits the VMEM
    scratch budget: 2 slots x group x n_planes x 4 B <= 64 MiB, i.e. a
    32 MiB per-slot byte budget. 1 plane -> 2^23 elems, 2 -> 2^22,
    4 -> 2^21."""
    return (32 * 1024 * 1024 // (4 * n_planes)).bit_length() - 1


def _span_plan_mode() -> str:
    """Span planning mode. 'fixed' (default) is the round-3 measured
    uniform geometry. 'adaptive' sizes each span individually: width c
    grows until the 2-slot scratch budget is hit at >=0.25 MB sub-blocks,
    narrow remainder spans get the largest sub-block the budget allows,
    and contiguous (base_bit==0) groups coalesce into one DMA per plane.
    MEASURED NEGATIVE (round 4, experiments/sweep_span_plan.py, on-chip):
    cutting 2^30 from 11 to 9 spans moved 937.25 -> 931.2 ms (-0.65%) and
    2^28 195.8 -> 194.5 ms, but 2^24 REGRESSED 8.45 -> 8.76 ms and the
    4-plane pairs contract 1067 -> 1073 ms — span COUNT is not the
    binding term at big N; the residual 1B gap to the 855 ms VPU floor is
    per-trip DMA exposure that wider spans do not remove. Kept env-gated
    (RS_SPAN_PLAN=adaptive) for future geometry studies."""
    import os

    return os.environ.get("RS_SPAN_PLAN", "fixed")


def _plan_spans(k: int, log_merge: int, n_planes: int):
    """Partition level k's cross stages (strides 2^(k-1) .. 2^log_merge)
    into spans: a list of (log_s_hi, log_s_lo, log_block) triples, widest
    first. Every span is one HBM round trip (N read + N write), so span
    COUNT is the traffic knob; log_block is the DMA-granularity knob."""
    import os

    stages = k - log_merge
    if stages <= 0:
        return []
    adaptive = _span_plan_mode() == "adaptive"
    budget = _span_budget_log(n_planes)
    c_max = _span_c_max(n_planes)
    if adaptive and not os.environ.get("RS_SPAN_CMAX"):
        # widest span that keeps sub-blocks >= 0.25 MB within budget
        c_max = max(c_max, budget - 16)
    lb_env = os.environ.get("RS_SPAN_LOG_BLOCK")
    spans = []
    log_s = k - 1
    while log_s >= log_merge:
        c = min(c_max, log_s - log_merge + 1)
        lo = log_s - c + 1
        if lb_env:
            lb = min(int(lb_env), lo)
        elif adaptive:
            # prefer lb == lo (base_bit 0): the span body then coalesces
            # each group side into ONE contiguous DMA per plane
            lb = min(lo, budget - c, 22)
        else:
            lb = min(_span_log_block(n_planes), lo)
        spans.append((log_s, lo, lb))
        log_s -= c
    return spans


def _cross_span_pallas(planes, k: int, log_s_hi: int, log_s_lo: int,
                       n_cmp: int, interpret: bool,
                       log_block: int | None = None):
    """Run cross stages with strides 2^log_s_hi .. 2^log_s_lo (consecutive,
    descending, all >= 2^log_block) in one grouped pass."""
    n_planes = len(planes)
    nrows = planes[0].shape[0]
    c = log_s_hi - log_s_lo + 1
    # sub-block can't exceed the smallest stride in the span
    if log_block is None:
        log_block = min(_span_log_block(n_planes), log_s_lo)
    brows = 1 << (log_block - LOG_LANES)
    base_bit = log_s_lo - log_block
    nblocks = nrows // brows
    g = 1 << c

    import os
    # Double-buffered spans at 3-4 planes overflowed Mosaic in round 2;
    # with the round-3 bodies they compile AND win (contract sweep: c=4 db
    # 1081.6 ms vs c=4 sb 1152 ms) — db is now the default at every plane
    # count. RS_SPAN_DB_PLANES caps the plane count for fallback sweeps.
    db_planes = int(os.environ.get("RS_SPAN_DB_PLANES", "4"))
    double_buf = (os.environ.get("RS_SPAN_DB", "1") == "1"
                  and n_planes <= db_planes)
    strided = double_buf and os.environ.get("RS_SPAN_DMA", "strided") != "flat"
    nslots = _span_slots(n_planes, c, brows) if double_buf else 1
    if strided:
        # one multi-dim DMA per plane per side: view each plane as
        # (nhigh, g, nlow, brows, LANES) so a member set is a strided slice
        nlow = 1 << base_bit
        nhigh = nblocks >> (base_bit + c)
        body = functools.partial(_cross_span_body_strided, c, k, log_block,
                                 base_bit, brows, n_planes, n_cmp, nslots)
        sems = [pltpu.SemaphoreType.DMA((nslots,)),
                pltpu.SemaphoreType.DMA((nslots,))]
        shape5 = (nhigh, g, nlow, brows, LANES)
        out = pl.pallas_call(
            body,
            grid=(nblocks // g,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_planes,
            out_shape=[jax.ShapeDtypeStruct(shape5, _U32)] * n_planes,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_planes,
            scratch_shapes=[pltpu.VMEM((nslots, g, brows, LANES), _U32)
                            for _ in range(n_planes)]
            + sems,
            input_output_aliases={i: i for i in range(n_planes)},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT, has_side_effects=True),
            interpret=interpret,
        )(*[p.reshape(shape5) for p in planes])
        return [p.reshape(nrows, LANES) for p in _as_list(out)]
    body = _cross_span_body if double_buf else _cross_span_body_sb
    if double_buf:
        body = functools.partial(body, c, k, log_block, base_bit,
                                 brows, n_planes, n_cmp, nslots)
        sems = [pltpu.SemaphoreType.DMA((nslots,)),
                pltpu.SemaphoreType.DMA((nslots,))]
    else:
        body = functools.partial(body, c, k, log_block, base_bit,
                                 brows, n_planes, n_cmp)
        sems = [pltpu.SemaphoreType.DMA]
    out = pl.pallas_call(
        body,
        grid=(nblocks // g,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_planes,
        out_shape=[jax.ShapeDtypeStruct((nrows, LANES), _U32)] * n_planes,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_planes,
        scratch_shapes=[pltpu.VMEM((nslots * g * brows, LANES), _U32)
                        for _ in range(n_planes)]
        + sems,
        input_output_aliases={i: i for i in range(n_planes)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT, has_side_effects=True),
        interpret=interpret,
    )(*planes)
    return list(out) if isinstance(out, (list, tuple)) else [out]


def _as_list(out):
    return list(out) if isinstance(out, (list, tuple)) else [out]


def resolve_log_merge(logn: int, n_planes: int) -> int:
    """Default merge-kernel block (log elems) for a 2^logn sort of n_planes.

    Measured sweet spots (NOTES r2/r3 sweeps): 2^20 blocks up to ~2^25, then
    cross stages dominate and bigger blocks win where VMEM allows. The merge
    block's VMEM footprint scales with plane count: 1-plane takes 2^22 at
    logn>=28 (the r3 sweep's 937 ms @1B, +6% over lm=21) and 2^21 at 26-27;
    2 planes cap at 2^20; 4+ planes at 2^19 (lm=20 x 3 planes OOMs scoped
    VMEM at k>=22 — measured r2; r5 re-checks: lm=21 x 3 planes and
    lm=20 x 4 planes both still fail the remote compile — 140 MB scoped
    VMEM vs the 128 MB chip).

    This is the single source of truth: sort_planes_bitonic, the merge entry,
    and bench.py's pass accounting all derive from it (VERDICT r3 #1/#5 —
    no parallel tables to drift)."""
    if n_planes >= 4:
        return 19
    if n_planes == 1 and logn >= 28:
        return 22
    if n_planes == 1 and logn >= 26:
        return 21
    return 20


@functools.partial(jax.jit,
                   static_argnames=("n_cmp", "log_tile", "log_merge",
                                    "compact", "interpret"))
def sort_planes_bitonic(planes, *, n_cmp: int = 1, log_tile: int = 16,
                        log_merge: int | None = None,
                        compact: bool | None = None,
                        interpret: bool = False):
    """Ascending bitonic sort of parallel (N,) uint32 plane columns by
    plane[0] (tiebroken by plane[1] when n_cmp == 2 — pass an index plane
    for a stable sort). N must be a power of two >= 2^log_tile (callers pad
    with max-key sentinels).

    CONTRACT for ride-along planes (planes beyond |n_cmp|), by n_cmp sign:
      n_cmp > 0: the compare planes must form a TOTAL order (include a
        unique index plane) — on a full compare-tie both sides of a
        compare-exchange resolve to the same element, duplicating one ride
        payload and dropping the other.
      n_cmp < 0: tie-safe — tied rows never exchange, so ride planes stay
        a permutation under duplicate comparands (the unstable
        thrust::sort_by_key path; one extra eq + two mask ops per stage).

    log_tile: sort-kernel tile (program size grows ~log_tile^2 — Mosaic
    chokes past ~2^17). log_merge: merge-kernel block (program ~log_merge
    stages; VMEM-bound). Cross stages above the merge block run as streaming
    pair kernels."""
    planes = list(planes)
    n_planes = len(planes)
    n = planes[0].shape[0]
    logn = n.bit_length() - 1
    assert n == (1 << logn), "power-of-two input required (pad upstream)"
    if log_merge is None:
        log_merge = resolve_log_merge(logn, n_planes)
    if compact is None:
        # compact bodies measured ~5x SLOWER on hardware (dynamic-stride
        # gathers/rotates lose Mosaic's static-shuffle patterns — NOTES r2);
        # they stay available for program-size-constrained configs only
        compact = False
    # Everything here is u32/i32; trace with x64 off so literals in index
    # maps / scalar carries don't become i64 (Mosaic rejects 64-bit scalars).
    with jax.enable_x64(False):
        return _sort_planes_impl(planes, n_planes, logn, n_cmp, log_tile,
                                 log_merge, compact, interpret)


def _sort_planes_impl(planes, n_planes, logn, n_cmp, log_tile, log_merge,
                      compact, interpret):
    log_tile = min(log_tile, logn)
    log_merge = max(min(log_merge, logn), log_tile)
    rows_per_tile = 1 << (log_tile - LOG_LANES)
    rows_per_block = 1 << (log_merge - LOG_LANES)
    nrows = (1 << logn) // LANES
    sort_body = _tile_sort_body_compact if compact else _tile_sort_body
    merge_body = _tile_merge_body_compact if compact else _tile_merge_body
    if not compact and _use_xp():
        if rows_per_tile >= LANES:
            sort_body = _tile_sort_body_xp
        if rows_per_block >= LANES:
            merge_body = _tile_merge_body_xp

    xs = [p.reshape(nrows, LANES) for p in planes]
    xs = _as_list(_tile_call(
        functools.partial(sort_body, log_tile, n_planes, n_cmp),
        n_planes, nrows, rows_per_tile, interpret)(*xs))
    for k in range(log_tile + 1, logn + 1):
        # the span kernel serves c == 1 too: in-place (N read + N write
        # vs the pair kernel's 3N) and no extra N-sized buffer — the
        # difference between fitting 2^30 keys or not
        for hi, lo, lb in _plan_spans(k, log_merge, n_planes):
            xs = _cross_span_pallas(xs, k, hi, lo, n_cmp, interpret,
                                    log_block=lb)
        xs = _as_list(_tile_call(
            functools.partial(merge_body, log_merge, k, n_planes,
                              n_cmp),
            n_planes, nrows, rows_per_block, interpret)(*xs))
    return [x.reshape(-1) for x in xs]


@functools.partial(jax.jit, static_argnames=("log_tile", "log_merge", "interpret"))
def sort_bits_bitonic(bits: jnp.ndarray, *, log_tile: int = 16,
                      log_merge: int | None = None,
                      interpret: bool = False) -> jnp.ndarray:
    """Keys-only wrapper around sort_planes_bitonic."""
    return sort_planes_bitonic(
        [bits], n_cmp=1, log_tile=log_tile, log_merge=log_merge,
        interpret=interpret)[0]


@functools.partial(jax.jit,
                   static_argnames=("log_block", "n_cmp", "log_merge",
                                    "compact", "interpret"))
def merge_sorted_planes_bitonic(planes, *, log_block: int, n_cmp: int = 1,
                                log_merge: int | None = None,
                                compact: bool | None = None,
                                interpret: bool = False):
    """Merge 2^(logn-log_block) pre-sorted blocks into one sorted sequence.

    Each 2^log_block block must already be sorted ASCENDING when its block
    index is even and DESCENDING when odd (the bitonic alternating invariant
    — sort odd blocks on complemented comparison bits to get this). Runs
    only the network levels log_block+1 .. logn: merging R blocks costs
    ~log(R)*logn stages instead of the full ~logn^2/2 — the compute the
    round-based exchange hides behind its transfers stays hidden.
    """
    planes = list(planes)
    n = planes[0].shape[0]
    logn = n.bit_length() - 1
    assert n == (1 << logn), "power-of-two input required"
    assert log_block <= logn
    if log_merge is None:
        log_merge = resolve_log_merge(logn, len(planes))
    with jax.enable_x64(False):
        return _merge_planes_impl(planes, logn, log_block, n_cmp,
                                  min(16, log_block), log_merge, interpret,
                                  compact=bool(compact))


def _merge_planes_impl(planes, logn, log_block, n_cmp, log_tile, log_merge,
                       interpret, compact=False):
    n_planes = len(planes)
    log_merge = max(min(log_merge, logn), log_tile)
    rows_per_block = 1 << (max(log_merge, LOG_LANES) - LOG_LANES)
    nrows = (1 << logn) // LANES
    if compact:
        merge_body = _tile_merge_body_compact
    else:
        merge_body = (_tile_merge_body_xp
                      if _use_xp() and rows_per_block >= LANES
                      else _tile_merge_body)
    xs = [p.reshape(nrows, LANES) for p in planes]
    for k in range(log_block + 1, logn + 1):
        for hi, lo, lb in _plan_spans(k, log_merge, n_planes):
            xs = _cross_span_pallas(xs, k, hi, lo, n_cmp, interpret,
                                    log_block=lb)
        xs = _as_list(_tile_call(
            functools.partial(merge_body, log_merge, k, n_planes,
                              n_cmp),
            n_planes, nrows, rows_per_block, interpret)(*xs))
    return [x.reshape(-1) for x in xs]
