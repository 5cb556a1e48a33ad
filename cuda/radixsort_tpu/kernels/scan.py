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


def _sscan_kernel(op: str, lanes: int, x_ref, f_ref, o_ref, carry_ref):
    t = pl.program_id(0)
    f = _OPS[op]

    @pl.when(t == 0)
    def _():
        carry_ref[0, 0] = _identity(op, carry_ref.dtype)

    v = x_ref[0]                          # (ROWS, lanes) values
    g = f_ref[0]                          # (ROWS, lanes) i32 head flags
    lane = jax.lax.broadcasted_iota(_I32, (_ROWS, lanes), 1)
    d = 1
    while d < lanes:
        pv = jnp.concatenate([v[:, :d], v[:, :-d]], axis=1)
        pg = jnp.concatenate([jnp.ones((_ROWS, d), _I32), g[:, :-d]],
                             axis=1)
        in_range = lane >= d
        take = in_range & (g == 0)
        v = jnp.where(take, f(pv, v), v)
        g = jnp.maximum(g, jnp.where(in_range, pg, 0))
        d *= 2

    # per-row first-head position (lanes when the row has no head): the
    # running carry applies to each row's prefix before its first head
    fl = f_ref[0]
    first = jnp.min(jnp.where(fl > 0, lane, lanes), axis=1,
                    keepdims=True)        # (ROWS, 1)
    pre = lane < first
    c = carry_ref[0, 0]
    rows = []
    for r in range(_ROWS):
        vr = v[r:r + 1, :]
        out_r = jnp.where(pre[r:r + 1, :], f(c, vr), vr)
        c = out_r[0, lanes - 1]
        rows.append(out_r)
    out = jnp.concatenate(rows, axis=0)
    o_ref[...] = out.reshape(1, _ROWS, lanes)
    carry_ref[0, 0] = c


@functools.partial(jax.jit, static_argnames=("op", "tile", "interpret"))
def segmented_scan_pallas(
    values: jnp.ndarray,
    head_flags: jnp.ndarray,
    op: str = "sum",
    *,
    tile: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inclusive segmented scan (restart at True head flags; position 0 is
    always a head) — one HBM read + one write. op: "sum"|"min"|"max";
    values i32/u32/f32."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {list(_OPS)}")
    n = values.shape[0]
    if n == 0:
        return values
    # a tile is (8, lanes): keep lanes >= 128 so the VPU stays full
    while tile > _ROWS * 128 and tile // 2 >= n:
        tile //= 2
    if tile % _ROWS:
        raise ValueError(f"tile must be a multiple of {_ROWS}")
    lanes = tile // _ROWS
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
        functools.partial(_sscan_kernel, op, lanes),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, _ROWS, lanes), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, lanes), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((nt, _ROWS, lanes), values.dtype),
        out_specs=pl.BlockSpec((1, _ROWS, lanes), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1, 1), values.dtype)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(values.reshape(nt, _ROWS, lanes), flags.reshape(nt, _ROWS, lanes))
    out = out.reshape(-1)
    return out[:n] if npad else out
