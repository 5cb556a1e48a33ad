"""Pallas segmented-scan kernel — bandwidth-class scan-by-key.

The XLA formulations in ops/scan.py move the array log2(n) times (doubling)
or 3x (cumsum+fill); this kernel is the reference's spine-scan idea
(RadixSortScanBinsKernel: sequential tiles with a running-prefix carry,
CUB kernels/radix_sort.cuh:146-178) applied to the DATA: ONE HBM read +
ONE write. Tiles execute in grid order on TPU, so the cross-tile carry is
a (value, has_carry) pair in SMEM scratch — the same sequential-grid carry
that replaces decoupled lookback in kernels/stage.py.

In-tile: flagged Hillis–Steele doubling over a (1, TILE) lane vector —
log2(TILE) shift+where steps entirely in vregs/VMEM. The incoming carry
applies to the tile's prefix before its first head; the outgoing carry is
the (adjusted) last element, which by segmented-scan semantics is exactly
the accumulation of the run still open at the tile boundary.

Status: interpret-verified (CPU CI); hardware measurement queued
(round-3 queue #2 in NOTES) before it takes over ops/scan.py routing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32 = jnp.int32

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


def _sscan_kernel(op: str, tile: int, x_ref, f_ref, o_ref, carry_ref,
                  has_ref):
    t = pl.program_id(0)
    f = _OPS[op]

    @pl.when(t == 0)
    def _():
        has_ref[0, 0] = _I32(0)

    v = x_ref[...]                        # (1, tile) values
    g = f_ref[...]                        # (1, tile) i32 head flags
    lane = jax.lax.broadcasted_iota(_I32, (1, tile), 1)
    d = 1
    while d < tile:
        pv = jnp.concatenate([v[:, :d], v[:, :-d]], axis=1)
        pg = jnp.concatenate([jnp.ones((1, d), _I32), g[:, :-d]], axis=1)
        in_range = lane >= d
        take = in_range & (g == 0)
        v = jnp.where(take, f(pv, v), v)
        g = jnp.maximum(g, jnp.where(in_range, pg, 0))
        d *= 2

    # apply the incoming carry to the prefix before this tile's first head
    fl = f_ref[...]
    any_head = jnp.sum(fl) > 0
    first = jnp.argmax(fl[0, :])          # 0 when no head (guarded below)
    pre = lane[0:1, :] < jnp.where(any_head, first, tile)
    carry = carry_ref[0, 0]
    out = jnp.where(pre & (has_ref[0, 0] == 1), f(carry, v), v)
    o_ref[...] = out
    carry_ref[0, 0] = out[0, tile - 1]
    has_ref[0, 0] = _I32(1)


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
    while tile > 128 and tile // 2 >= n:
        tile //= 2
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
        functools.partial(_sscan_kernel, op, tile),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((nt, tile), values.dtype),
        out_specs=pl.BlockSpec((1, tile), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1, 1), values.dtype),
                        pltpu.SMEM((1, 1), _I32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(values.reshape(nt, tile), flags.reshape(nt, tile))
    out = out.reshape(-1)
    return out[:n] if npad else out
