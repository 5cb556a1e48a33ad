"""Pallas segmented-scan kernel — bandwidth-class scan-by-key.

The XLA formulations in ops/scan.py move the array log2(n) times (doubling)
or 3x (cumsum+fill); this kernel is the reference's spine-scan idea
(RadixSortScanBinsKernel: sequential tiles with a running-prefix carry,
CUB kernels/radix_sort.cuh:146-178) applied to the DATA: ONE HBM read +
ONE write. Tiles execute in grid order on TPU, so the cross-tile carry is
a value in SMEM scratch — the same sequential-grid carry that replaces
decoupled lookback in kernels/stage.py. The carry starts at the op's
identity, so no has-carry flag is needed.

Tile layout: Mosaic requires block sublane/lane dims divisible by (8, 128)
or equal to the array dims, so a tile is a (8, lanes) plane of consecutive
row-major chunks (flat index = row*lanes + lane). In-tile: flagged
Hillis–Steele doubling along lanes (log2(lanes) shift+where steps,
vectorized over the 8 sublanes), then an unrolled 8-row sequential carry
pass — row r's prefix before its first head combines with the running
carry; the carry out of a row is its (adjusted) last element, which by
segmented-scan semantics is exactly the accumulation of the run still open
at the row boundary.

Interpret-mode twin runs in CPU CI (tests/test_scan_kernel.py); hardware
status: see the committed hw_recheck.log / tpu_check
``pallas_segmented_scan_kernel`` line for the latest chip run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32
_ROWS = 8

_OPS = {
    "sum": jnp.add,
    "min": jnp.minimum,
    "max": jnp.maximum,
}


def _identity(op: str, dtype):
    if op == "sum":
        return jnp.zeros((), dtype)
    big = (jnp.asarray(jnp.inf, dtype)
           if jnp.issubdtype(dtype, jnp.floating)
           else jnp.asarray(jnp.iinfo(dtype).max, dtype))
    return big if op == "min" else (-big if jnp.issubdtype(
        dtype, jnp.floating) else jnp.asarray(jnp.iinfo(dtype).min, dtype))


def _sscan_kernel(op: str, rows: int, lanes: int, x_ref, f_ref, o_ref,
                  carry_ref):
    t = pl.program_id(0)
    f = _OPS[op]

    @pl.when(t == 0)
    def _():
        carry_ref[0, 0] = _identity(op, carry_ref.dtype)

    v = x_ref[0]                          # (rows, lanes) values
    g = f_ref[0]                          # (rows, lanes) i32 head flags
    lane = jax.lax.broadcasted_iota(_I32, (rows, lanes), 1)
    d = 1
    while d < lanes:
        pv = jnp.concatenate([v[:, :d], v[:, :-d]], axis=1)
        pg = jnp.concatenate([jnp.ones((rows, d), _I32), g[:, :-d]],
                             axis=1)
        in_range = lane >= d
        take = in_range & (g == 0)
        v = jnp.where(take, f(pv, v), v)
        g = jnp.maximum(g, jnp.where(in_range, pg, 0))
        d *= 2

    # Cross-row carry, fully vectorized (r3 — the former 8-step sequential
    # per-row scalar extraction dominated the kernel): per-row aggregate
    # A_r = in-row scan value at the row end (accumulation of the segment
    # still open at the row boundary), per-row head flag H_r; a flagged
    # doubling over the (rows, 1) columns yields S_r = accumulation
    # entering row r+1, seeded with the cross-tile carry. Exactly two
    # scalar accesses per tile remain: carry in, carry out.
    fl = f_ref[0]
    first = jnp.min(jnp.where(fl > 0, lane, lanes), axis=1,
                    keepdims=True)        # (rows, 1)
    pre = lane < first
    tc = carry_ref[0, 0]
    A = v[:, lanes - 1:lanes]             # (rows, 1)
    # flags stay i32 throughout — Mosaic cannot truncate narrow vectors
    # to i1 (arith.trunci i8->i1 fails on (rows,1) shapes)
    H = jnp.max(fl, axis=1, keepdims=True)
    # seed the incoming carry into ROW 0 ONLY (doubling COMBINES values —
    # seeding any later headless row would fold tc in twice): if row 0 has
    # no head its aggregate continues the incoming segment.
    A0 = jnp.where(H[0:1] > 0, A[0:1], f(tc, A[0:1]))
    A = jnp.concatenate([A0, A[1:]], axis=0)
    S, h = A, H
    d = 1
    row = jax.lax.broadcasted_iota(_I32, (rows, 1), 0)
    while d < rows:
        pS = jnp.concatenate([S[:d], S[:-d]], axis=0)
        ph = jnp.concatenate([jnp.ones((d, 1), _I32), h[:-d]], axis=0)
        in_range = row >= d
        take = in_range & (h == 0)
        S = jnp.where(take, f(pS, S), S)
        h = jnp.maximum(h, jnp.where(in_range, ph, 0))
        d *= 2
    C = jnp.concatenate([jnp.full((1, 1), tc, v.dtype), S[:-1]], axis=0)
    out = jnp.where(pre, f(C, v), v)
    o_ref[...] = out.reshape(1, rows, lanes)
    carry_ref[0, 0] = S[rows - 1, 0]


@functools.partial(jax.jit,
                   static_argnames=("op", "tile", "rows", "interpret"))
def segmented_scan_pallas(
    values: jnp.ndarray,
    head_flags: jnp.ndarray,
    op: str = "sum",
    *,
    tile: int = 16384,
    rows: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inclusive segmented scan (restart at True head flags; position 0 is
    always a head) — one HBM read + one write. op: "sum"|"min"|"max";
    values i32/u32/f32. tile = rows x lanes elements per grid step (rows
    power of two; lanes >= 128)."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {list(_OPS)}")
    n = values.shape[0]
    if n == 0:
        return values
    # shrink for small inputs: keep lanes >= 128 so the VPU stays full
    while tile // 2 >= n and (tile // 2) // rows >= 128:
        tile //= 2
    while tile // rows < 128 and rows > 8:
        rows //= 2
    if tile % rows:
        raise ValueError(f"tile must be a multiple of rows={rows}")
    lanes = tile // rows
    ident = _identity(op, values.dtype)
    npad = -n % tile
    flags = head_flags.astype(_I32)
    flags = jnp.concatenate([jnp.ones((1,), _I32), flags[1:]])
    if npad:
        values = jnp.concatenate(
            [values, jnp.full((npad,), ident, values.dtype)])
        # pads open their own segment so the real carry never leaks in
        flags = jnp.concatenate([flags, jnp.ones((npad,), _I32)])
    nt = (n + npad) // tile
    out = pl.pallas_call(
        functools.partial(_sscan_kernel, op, rows, lanes),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, rows, lanes), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, lanes), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((nt, rows, lanes), values.dtype),
        out_specs=pl.BlockSpec((1, rows, lanes), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1, 1), values.dtype)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(values.reshape(nt, rows, lanes), flags.reshape(nt, rows, lanes))
    out = out.reshape(-1)
    return out[:n] if npad else out
