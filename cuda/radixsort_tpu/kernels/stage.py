"""The 4-bit partition stage kernel — one LSD digit pass over HBM.

TPU-native replacement for the reference's upsweep/scan/downsweep trio
(CUB dispatch_radix_sort.cuh:362-488). One Pallas kernel per digit pass:

  * the global digit histogram is computed ONCE up front for all passes
    (kernels/histogram.py — the onesweep-histogram idea,
    agent_radix_sort_histogram.cuh:247-275), so each pass kernel receives its
    16 global bucket bases;
  * the TPU grid executes tiles SEQUENTIALLY on the core, so cross-tile
    carry lives in SMEM/VMEM scratch that persists across grid steps — this
    replaces both the striped-spine scan AND onesweep's decoupled lookback
    (agent_radix_sort_onesweep.cuh:223-301): no cross-block polling exists or
    is needed;
  * each tile (256 rows x 128 lanes) is stably sorted in-row (tiles.py), then
    every bucket's ragged row-runs are rotated to their global lane phase
    (gather), routed to staging rows with a one-hot row-router matmul on the
    MXU, and flushed to HBM in 32-row (16 KB) aligned DMA blocks — the
    write-combining smem-to-gmem trick of the downsweep agent
    (agent_radix_sort_downsweep.cuh:271-299) rebuilt around DMA granularity;
  * bucket-boundary rows (shared by two buckets' partial rows) are merged
    from head/tail fragments in the final grid step.

Stability: buckets append tile-ascending, rows ascend within a tile, and the
in-row sort is stable, so the pass is a stable counting pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda.radixsort_tpu.kernels import tiles

ROWS = 256              # default tile rows; tile = ROWS*128 elements
W = 24                  # staging window rows per append chunk
CHUNK = (W - 1) * 128   # elements per append chunk (needs <= W staging rows)
SROWS = 80              # staging rows per bucket (head row + <=56 fill + slack)
NB = tiles.NB           # default buckets (4-bit digits)
_I32 = jnp.int32
_U32 = jnp.uint32


def _matmul(m: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """bf16 x bf16 -> f32 matmul. Operand values must be <= 255 (bf16-exact):
    TPU matmuls run bf16 passes by default, so 16-bit halves would corrupt
    low bits — the router therefore moves data as four 8-bit byte planes."""
    return jax.lax.dot_general(
        m.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _stage_kernel(shift: int, nb: int, rows: int, n_planes: int,
                  total_rows: int, gb_ref, *refs):
    """Kernel body. refs = planes(in) + planes(out) + scratches."""
    NB, ROWS = nb, rows
    ins = refs[:n_planes]
    outs = refs[n_planes : 2 * n_planes]
    stg = refs[2 * n_planes : 3 * n_planes]      # per-plane staging VMEM
    pf_ref, sb_ref, acc_ref, sem = refs[3 * n_planes : 3 * n_planes + 4]

    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _init():
        for p in range(n_planes):
            stg[p][...] = jnp.zeros((NB * SROWS, 128), _U32)
        for b in range(NB):
            pf_ref[b] = gb_ref[b, 0]
            sb_ref[b] = jax.lax.shift_right_logical(gb_ref[b, 0], jnp.int32(7))

    keys = ins[0][...]
    planes = [r[...] for r in ins]
    d = ((keys >> _U32(shift)) & _U32(nb - 1)).astype(_I32)
    sorted_planes, bidx, tot, rb, ss = tiles.inrow_sort(d, planes, nb)
    sc, scexcl, tiletot = tiles.bucket_count_table(tot, ROWS, nb)

    lane = jax.lax.broadcasted_iota(_I32, (ROWS, 128), 1)
    qiota = jax.lax.broadcasted_iota(_I32, (W, ROWS), 0)

    def copy(src_ref, srow, dst_ref, drow, nrows):
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(srow, nrows), :],
            dst_ref.at[pl.ds(drow, nrows), :],
            sem,
        )
        cp.start()
        cp.wait()

    for b in range(NB):
        pf_b = pf_ref[b]
        c_total = tiletot[0, b]
        cnt_col = sc[:, b : b + 1]
        prow = pf_b + scexcl[:, b : b + 1]          # (R,1) global run starts
        srcstart = tiles.field(rb[b >> 2], b & 3)   # (R,1)

        phase = prow & 127
        gidx = (lane - (phase - srcstart)) & 127
        rots = [jnp.take_along_axis(sp, gidx, axis=-1) for sp in sorted_planes]
        tloc = (lane - phase) & 127
        g = prow + tloc                              # (R,128) global positions
        in_run = tloc < cnt_col
        is_head = in_run & (lane >= phase)
        is_wrap = in_run ^ is_head
        rw_head = jnp.transpose(
            jax.lax.shift_right_logical(prow, jnp.int32(7))
        )                                            # (1,R) absolute row idx

        def chunk_body(carry):
            done, sb_b = carry
            base = pf_b + done
            hi_ok = g < (base + CHUNK)
            lo_ok = g >= base
            mh = is_head & hi_ok & lo_ok
            mw = is_wrap & hi_ok & lo_ok
            base_row = jax.lax.shift_right_logical(base, jnp.int32(7))
            mrow_h = (qiota == (rw_head - base_row)).astype(jnp.float32)
            mrow_w = (qiota == (rw_head + 1 - base_row)).astype(jnp.float32)
            off = base_row - sb_b
            for p in range(n_planes):
                rot = rots[p]
                rh = jnp.where(mh, rot, _U32(0))
                rw = jnp.where(mw, rot, _U32(0))
                acc_rows = None
                for shiftv in (0, 8, 16, 24):
                    # route bytes through i32 -> f32 (Mosaic lacks u32<->f32)
                    ph = ((rh >> _U32(shiftv)) & _U32(255)).astype(_I32).astype(jnp.float32)
                    pw = ((rw >> _U32(shiftv)) & _U32(255)).astype(_I32).astype(jnp.float32)
                    s = _matmul(mrow_h, ph) + _matmul(mrow_w, pw)
                    v = s.astype(_I32).astype(_U32) << _U32(shiftv)
                    acc_rows = v if acc_rows is None else (acc_rows | v)
                cur = stg[p][pl.ds(b * SROWS + off, W), :]
                stg[p][pl.ds(b * SROWS + off, W), :] = cur | acc_rows

            done = jnp.minimum(done + CHUNK, c_total)
            # flush complete 32-row blocks: rows [1,33) relative to sb_b
            def flush_cond(s):
                return (jax.lax.shift_right_logical(pf_b + done, jnp.int32(7)) - s) >= 33

            def flush_body(s):
                for p in range(n_planes):
                    copy(stg[p], b * SROWS + 1, outs[p], s + 1, 32)
                    blk = stg[p][pl.ds(b * SROWS + 33, SROWS - 33), :]
                    stg[p][pl.ds(b * SROWS + 1, SROWS - 33), :] = blk
                    stg[p][pl.ds(b * SROWS + SROWS - 32, 32), :] = jnp.zeros(
                        (32, 128), _U32
                    )
                return s + 32

            sb_b = jax.lax.while_loop(flush_cond, flush_body, sb_b)
            return done, sb_b

        def chunk_cond(carry):
            return carry[0] < c_total

        _, sb_fin = jax.lax.while_loop(
            chunk_cond, chunk_body, (jnp.int32(0), sb_ref[b])
        )
        sb_ref[b] = sb_fin
        pf_ref[b] = pf_b + c_total

    # ---- final grid step: drain full rows, merge boundary fragments ----
    @pl.when(t == nt - 1)
    def _epilogue():
        for b in range(NB):
            sb_b = sb_ref[b]
            pf_b = pf_ref[b]
            fillidx = jax.lax.shift_right_logical(pf_b, jnp.int32(7)) - sb_b

            def drain_cond(i):
                return i < fillidx

            def drain_body(i):
                for p in range(n_planes):
                    copy(stg[p], b * SROWS + i, outs[p], sb_b + i, 1)
                return i + 1

            jax.lax.while_loop(drain_cond, drain_body, jnp.int32(1))

        # boundary rows: OR head fragment (staging row 0) and tail fragment
        # (staging row fillidx) per bucket into acc; flush when row changes.
        zrow = jnp.zeros((1, 128), _U32)
        for p in range(n_planes):
            acc_ref[...] = zrow
            currow = jnp.int32(-1)
            for b in range(NB):
                hb = jax.lax.shift_right_logical(gb_ref[b, 0], jnp.int32(7))
                pf_b = pf_ref[b]
                tb = jax.lax.shift_right_logical(pf_b, jnp.int32(7))
                fillidx = tb - sb_ref[b]
                ht = (pf_b & 127) != 0   # bucket has a partial tail row
                # a bucket whose base is the array end (empty trailing
                # bucket) has no head row — skip it entirely
                hvalid = hb < total_rows

                flush_now = (currow >= 0) & (hb != currow) & hvalid

                @pl.when(flush_now)
                def _():
                    copy(acc_ref, 0, outs[p], currow, 1)
                    acc_ref[...] = zrow

                currow = jnp.where(hvalid & (hb != currow), hb, currow)
                head_row = stg[p][pl.ds(b * SROWS, 1), :]
                acc_ref[...] = acc_ref[...] | jnp.where(hvalid, head_row, zrow)

                tail_sep = ht & (tb != currow)

                @pl.when(tail_sep)
                def _():
                    copy(acc_ref, 0, outs[p], currow, 1)
                    acc_ref[...] = zrow

                currow = jnp.where(tail_sep, tb, currow)
                tail_row = stg[p][pl.ds(b * SROWS + fillidx, 1), :]
                acc_ref[...] = acc_ref[...] | jnp.where(ht, tail_row, zrow)

            @pl.when(currow >= 0)
            def _():
                copy(acc_ref, 0, outs[p], currow, 1)


@functools.partial(
    jax.jit, static_argnames=("shift", "width", "rows", "interpret")
)
def partition_stage(planes, gbase, *, shift: int, width: int = 4,
                    rows: int = ROWS, interpret: bool = False):
    """One stable `width`-bit counting pass over HBM-resident planes.

    planes: list of (N, 128)-shaped uint32 arrays (keys first; payloads follow
    the same permutation). N must be a multiple of `rows`. gbase: (2^width,)
    int32 exclusive global bucket bases of digit (key >> shift) & (2^width-1).
    width (2 or 4 — the policy-hub digit knob, CUB tuning_radix_sort.cuh
    policy analogue) and rows (tile rows) come from SortConfig.
    Returns the permuted planes.
    """
    assert width in (2, 4), width
    nb = 1 << width
    planes = list(planes)
    n_planes = len(planes)
    nrows = planes[0].shape[0]
    assert nrows % rows == 0, nrows
    nt = nrows // rows

    grid_in_specs = [pl.BlockSpec((nb, 1), lambda t: (0, 0),
                                  memory_space=pltpu.SMEM)]
    grid_in_specs += [
        pl.BlockSpec((rows, 128), lambda t: (t, 0), memory_space=pltpu.VMEM)
        for _ in range(n_planes)
    ]
    out_shapes = [jax.ShapeDtypeStruct((nrows, 128), _U32)] * n_planes
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_planes
    scratch = (
        [pltpu.VMEM((nb * SROWS, 128), _U32) for _ in range(n_planes)]
        + [pltpu.SMEM((nb,), _I32), pltpu.SMEM((nb,), _I32)]
        + [pltpu.VMEM((1, 128), _U32), pltpu.SemaphoreType.DMA]
    )

    kern = functools.partial(_stage_kernel, shift, nb, rows, n_planes, nrows)
    out = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=grid_in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(gbase.reshape(nb, 1).astype(_I32), *planes)
    return list(out) if isinstance(out, (list, tuple)) else [out]
