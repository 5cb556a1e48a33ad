"""Fused all-pass digit histogram kernel.

One read of the keys produces the global 16-bin histogram of EVERY 4-bit
digit position at once — the onesweep-histogram idea
(CUB agent_radix_sort_histogram.cuh:95-275: all passes' bins in one pass over
the input). Histograms are permutation-invariant, so all stage bases for a
limb can be computed before any pass runs.

Output: (8, 16) int32 counts (stage s = bits [4s, 4s+4)). The exclusive scan
into per-stage bucket bases is 128 numbers — done in XLA (`stage_bases`),
the analogue of the 256-bin DeviceRadixSortExclusiveSumKernel
(kernels/radix_sort.cuh:756).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 256
NSTAGES = 8
NB = 16
_I32 = jnp.int32
_U32 = jnp.uint32


def _hist_kernel(n_stages: int, width: int, x_ref, o_ref, acc_ref):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    nb = 1 << width
    # pad the stage axis to a sublane multiple (8) for the VMEM tiles
    srows = -(-n_stages // 8) * 8

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros((srows, 128), _I32)

    x = x_ref[...]
    lane = jax.lax.broadcasted_iota(_I32, (srows, 128), 1)
    rows = []
    for s in range(n_stages):
        d = ((x >> _U32(width * s)) & _U32(nb - 1)).astype(_I32)
        cnt = [jnp.sum((d == b).astype(_I32)) for b in range(nb)]
        row = jnp.zeros((1, 128), _I32)
        for b in range(nb):
            row = jnp.where(lane[0:1, :] == b, cnt[b], row)
        rows.append(row)
    for s in range(n_stages, srows):
        rows.append(jnp.zeros((1, 128), _I32))
    acc_ref[...] = acc_ref[...] + jnp.concatenate(rows, axis=0)

    @pl.when(t == nt - 1)
    def _():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("n_stages", "width", "interpret"))
def digit_histograms(keys: jnp.ndarray, *, n_stages: int = 8, width: int = 4,
                     interpret: bool = False) -> jnp.ndarray:
    """(N,128) uint32 keys -> (n_stages, 2^width) int32 histogram of each
    width-bit digit position (stage s = bits [width*s, width*(s+1)))."""
    nrows = keys.shape[0]
    # grid tile: largest power-of-two row block <= ROWS dividing the input
    # (stage_rows variants produce inputs that are not multiples of 256)
    hrows = next(h for h in (256, 128, 64, 32, 16, 8) if nrows % h == 0)
    srows = -(-n_stages // 8) * 8
    out = pl.pallas_call(
        functools.partial(_hist_kernel, n_stages, width),
        grid=(nrows // hrows,),
        in_specs=[pl.BlockSpec((hrows, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((srows, 128), _I32),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((srows, 128), _I32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(keys)
    return out[:n_stages, : 1 << width]


def stage_bases(hist: jnp.ndarray) -> jnp.ndarray:
    """(8,16) stage histograms -> (8,16) exclusive bucket bases per stage."""
    return (jnp.cumsum(hist, axis=1) - hist).astype(jnp.int32)
