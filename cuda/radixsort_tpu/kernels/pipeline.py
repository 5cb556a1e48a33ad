"""Pallas engine driver: LSD pipeline over limb columns.

Glue between ops/sort.py's limb decomposition and the stage/histogram
kernels. Role parity: DispatchRadixSort::InvokePasses pass planning
(dispatch_radix_sort.cuh:822-988) — but all stage bases come from ONE fused
histogram read per limb (histograms are permutation-invariant), and "double
buffering" is XLA's problem (functional dataflow), not ours.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cuda.radixsort_tpu.kernels import histogram as hist_lib
from cuda.radixsort_tpu.kernels import stage as stage_lib

ROWS = stage_lib.ROWS
TILE = ROWS * 128


def stage_width(cfg) -> int:
    """Digit width of the Pallas stage pipeline from SortConfig.radix_bits:
    2-bit stages for radix_bits <= 3, else 4-bit (wider digits do not pay on
    this VPU — the in-row machinery's packed 8-bit fields top out at 16
    buckets; the policy clamp is documented in config.py)."""
    return 2 if cfg.radix_bits <= 3 else 4


def tile_elems(cfg) -> int:
    """Stage-kernel tile size in elements for this config."""
    return cfg.stage_rows * 128


def _to_planes(col: jnp.ndarray, nrows: int) -> jnp.ndarray:
    return col.reshape(nrows, 128)


def _stages_for(begin: int, end: int, width: int) -> list[int]:
    """Stage shifts covering bit range [begin, end), LSD order.

    Stages are aligned to width-bit boundaries; callers pass aligned ranges
    or pre-mask (see sort_limbs_pallas).
    """
    lo = begin // width
    hi = -(-end // width)
    return [width * s for s in range(lo, hi)]


def sort_limbs_pallas(limbs, limb_bits, payloads, cfg):
    """Stable LSD sort of uint32 limb columns via the Pallas stage kernel.

    limbs[k]: (N,) uint32, most-significant first; limb_bits[k]=(begin,end)
    participating bits. Payloads follow the permutation. Input length must be
    a multiple of TILE (ops/sort.py pads). Non-nibble-aligned bit ranges are
    handled by pre-masking a copy of the limb for ordering and carrying the
    original as a payload (CUB begin_bit/end_bit semantics).
    """
    interpret = bool(cfg.interpret)
    width = stage_width(cfg)
    rows = cfg.stage_rows
    n = limbs[0].shape[0]
    assert n % (rows * 128) == 0, n
    nrows = n // 128

    planes = [ _to_planes(c, nrows) for c in limbs ]
    pay_planes = [ _to_planes(p.view(jnp.uint32) if p.dtype != jnp.uint32
                              else p, nrows) for p in payloads ]

    for k in range(len(limbs) - 1, -1, -1):
        begin, end = limb_bits[k]
        if begin >= end:
            continue
        aligned = (begin % width == 0) and (end % width == 0)
        if aligned:
            key_plane = planes[k]
            extra = []
        else:
            mask = jnp.uint32(((1 << end) - 1) & ~((1 << begin) - 1))
            key_plane = planes[k] & mask
            extra = [planes[k]]  # original rides as payload
        others = [planes[i] for i in range(len(planes)) if i != k] + extra

        hists = hist_lib.digit_histograms(
            key_plane, n_stages=-(-end // width), width=width,
            interpret=interpret
        )
        bases = hist_lib.stage_bases(hists)
        all_planes = [key_plane] + others + pay_planes
        for shift in _stages_for(
                begin if aligned else width * (begin // width), end, width):
            s = shift // width
            # Trivial-pass short-circuit (CUB downsweep whole-tile copy,
            # agent_radix_sort_downsweep.cuh:672-741 + the dispatch copy
            # shortcut, dispatch_radix_sort.cuh:1064-1077): when this
            # stage's global histogram puts every key in one bucket, the
            # stable counting pass is the identity — skip the stage kernel.
            # The fused histogram already computed every stage's counts, so
            # the test is one max over 2^width lanes per stage.
            trivial = jnp.max(hists[s]) == jnp.int32(n)
            all_planes = jax.lax.cond(
                trivial,
                lambda ps: ps,
                lambda ps: list(stage_lib.partition_stage(
                    ps, bases[s], shift=shift, width=width,
                    rows=rows, interpret=interpret,
                )),
                all_planes)

        # unpack
        key_plane = all_planes[0]
        rest = all_planes[1:]
        oi = 0
        new_planes = []
        for i in range(len(planes)):
            if i == k:
                new_planes.append(key_plane if aligned else None)
            else:
                new_planes.append(rest[oi])
                oi += 1
        if not aligned:
            new_planes[k] = rest[oi]
            oi += 1
        planes = new_planes
        pay_planes = list(rest[oi:])

    out_limbs = [p.reshape(-1) for p in planes]
    out_pays = []
    for p, orig in zip(pay_planes, payloads):
        flat = p.reshape(-1)
        out_pays.append(flat.view(orig.dtype) if orig.dtype != jnp.uint32
                        else flat)
    return out_limbs, out_pays
