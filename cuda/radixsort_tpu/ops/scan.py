"""Segmented scans (scan-by-key) — prefix scans that reset at run starts.

Parity: cub::DeviceScan::{Inclusive,Exclusive}{Sum,Scan}ByKey and
InclusiveScanInit (CUB device/device_scan.cuh:1144-1801): segments are
maximal runs of CONSECUTIVE keys equal under ``equality_op`` — a run-based
contract, not a global group-by (sort first, or use ops.aggregate.groupby,
for grouped semantics).

TPU-native design — compact primitives ONLY. ``jax.lax.associative_scan``
fails to compile at >=2^21 elements through this backend's remote-compile
path (measured; ops/join.py and ops/aggregate.py carry the same note).

Engines, picked by ``engine="auto"`` (measured @2^24 on v5e, r3):

* Pallas one-read-one-write kernel (kernels/scan.py) for named
  sum/min/max at >=2^16 rows on TPU — 1.3 ms @16M (12.9 G rows/s).
* sum (and count) elsewhere: one ``cumsum`` + one segment-start position
  fill (``cummax`` of marked positions — positions are monotone, so the
  fill is exact for ANY value sign) + one gather of the exclusive prefix
  at the segment start: out[i] = cs[i] - exc[start(i)]. CPU/small-n
  only — the TPU elementwise gather runs at ~0.11 G rows/s (155 ms
  @2^24).
* everything else (min/max/prod/custom associative op): a hand-rolled
  Hillis–Steele doubling scan with head-flag propagation — ceil(log2 n)
  unrolled steps, each a shift + where + op (8.9 ms @2^24; the same
  elementwise shapes the bitonic networks compile from in seconds). Same
  log-depth tree an associative_scan would build, without the
  primitive's lowering.

Exclusive scans shift values one slot right WITHIN each segment (head
slots take the operator identity) and run the same inclusive machinery; a
per-segment ``init`` then combines from the left, which is exactly CUB's
"init_value is applied to the first element of each segment" contract.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

_NAMED = {
    "sum": (jnp.add, lambda dt: jnp.zeros((), dt)),
    "prod": (jnp.multiply, lambda dt: jnp.ones((), dt)),
    "min": (jnp.minimum, lambda dt: (jnp.asarray(jnp.inf, dt)
                                     if jnp.issubdtype(dt, jnp.floating)
                                     else jnp.asarray(jnp.iinfo(dt).max, dt))),
    "max": (jnp.maximum, lambda dt: (jnp.asarray(-jnp.inf, dt)
                                     if jnp.issubdtype(dt, jnp.floating)
                                     else jnp.asarray(jnp.iinfo(dt).min, dt))),
}


def _resolve_op(op, identity, dtype, *, need_identity):
    if callable(op):
        if identity is None:
            if need_identity:
                raise ValueError("a callable op needs identity= (its "
                                 "neutral element) for exclusive scans")
            return op, None
        return op, jnp.asarray(identity, dtype)
    try:
        f, ident = _NAMED[op]
    except KeyError:
        raise ValueError(f"op must be callable or one of {list(_NAMED)}")
    return f, ident(dtype)


def _head_flags(keys, n, equality_op):
    """True where a new run of equal-consecutive keys begins."""
    cols = keys if isinstance(keys, (tuple, list)) else (keys,)
    if equality_op is None:
        neq = cols[0][1:] != cols[0][:-1]
        for c in cols[1:]:
            neq = neq | (c[1:] != c[:-1])
    else:
        if len(cols) != 1:
            raise ValueError("equality_op takes a single key column")
        neq = ~equality_op(cols[0][:-1], cols[0][1:])
    return jnp.concatenate([jnp.ones((1,), bool), neq])


_PALLAS_OPS = ("sum", "min", "max")
_PALLAS_DTYPES = (jnp.int32, jnp.uint32, jnp.float32)


def _pick_engine(engine, op, dtype, n):
    """engine="auto" routing, measured on v5e at 2^24 (probe_scan_route):
    pallas one-read-one-write kernel 6.5 ms; flagged doubling 8.9 ms;
    cumsum+gather 155 ms (the XLA elementwise gather runs at ~0.11 G/s on
    TPU — never route int sums through it there)."""
    if engine != "auto":
        return engine
    if (jax.default_backend() == "tpu" and isinstance(op, str)
            and op in _PALLAS_OPS and dtype in _PALLAS_DTYPES
            and n >= (1 << 16)):
        return "pallas"
    return "xla"


def _segmented_cumsum(values, flags):
    """Inclusive segmented sum: cumsum minus the exclusive prefix at each
    segment's start (start positions are monotone -> exact cummax fill)."""
    n = values.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    cs = jnp.cumsum(values)
    exc = cs - values
    start = jax.lax.cummax(jnp.where(flags, pos, -1))
    return cs - jnp.take(exc, jnp.clip(start, 0, n - 1), axis=0)


def _segmented_doubling(values, flags, f):
    """Inclusive segmented scan for an arbitrary associative op: flagged
    Hillis–Steele doubling, ceil(log2 n) unrolled shift+where steps."""
    n = values.shape[0]
    v, fl = values, flags
    d = 1
    while d < n:
        pv = jnp.concatenate([v[:d], v[:-d]])   # v[i-d]; first d rows unused
        pf = jnp.concatenate([jnp.ones((d,), bool), fl[:-d]])
        in_range = jnp.arange(n, dtype=jnp.int32) >= d
        take = in_range & jnp.logical_not(fl)
        v = jnp.where(take, f(pv, v), v)
        fl = fl | jnp.where(in_range, pf, False)
        d *= 2
    return v


def plain_scan_fast(x, op):
    """Plain (unsegmented) inclusive scan for the NAMED ops "max"/"min"/
    "sum": the Pallas segmented-scan kernel on TPU at >=2^18 rows (XLA's
    cummax/cummin/cumsum lower to log-depth reduce-windows costing far
    more than one pass — measured @5M on v5e, r5: cummax 3.75 ms, cumsum
    0.95 ms vs the kernel's ~0.4 ms one-read-one-write), the dedicated
    lax lowerings otherwise (CPU CI included). The general `plain_scan`
    below serves arbitrary/custom operators via the compat layers."""
    from cuda.radixsort_tpu import config as _config_lib

    if (x.ndim == 1 and x.shape[0] >= (1 << 18)
            and _config_lib.default_backend() == "tpu"):
        return segmented_scan(x, jnp.zeros(x.shape, bool), op)
    import jax

    return {"max": jax.lax.cummax, "min": jax.lax.cummin,
            "sum": jnp.cumsum}[op](x)


def segmented_scan(
    values: jnp.ndarray,
    head_flags: jnp.ndarray,
    op="sum",
    *,
    identity=None,
    exclusive: bool = False,
    init=None,
    engine: str = "auto",
):
    """Prefix-scan ``values`` with ``op``, restarting at every True in
    ``head_flags`` (position 0 is always a segment head).

    exclusive=True shifts the scan right within each segment; ``init``
    (optional) is combined from the left into every output element of the
    segment — for an inclusive scan this is CUB's InclusiveScanInit, for
    an exclusive scan it seeds each segment (ExclusiveScanByKey).

    engine: "auto" (default — pallas on TPU for named sum/min/max at
    >=2^16 rows, xla otherwise), "xla" (cumsum+fill / flagged-doubling,
    fuses with neighbors), or "pallas" (kernels/scan.py one-read-one-write
    kernel; named sum/min/max ops only). Measured @2^24 on v5e: pallas
    6.5 ms, doubling 8.9 ms, cumsum+gather 155 ms.
    """
    f, ident = _resolve_op(op, identity, values.dtype,
                           need_identity=exclusive)
    n = values.shape[0]
    if n == 0:
        return values
    engine = _pick_engine(engine, op, values.dtype, n)
    flags = jnp.concatenate(
        [jnp.ones((1,), bool), head_flags.astype(bool)[1:]])
    if exclusive:
        shifted = jnp.concatenate([jnp.full((1,), ident, values.dtype),
                                   values[:-1]])
        values = jnp.where(flags, ident, shifted)
    if engine == "pallas":
        from cuda.radixsort_tpu.kernels.scan import segmented_scan_pallas

        out = segmented_scan_pallas(
            values, flags, op,
            interpret=jax.default_backend() != "tpu")
    # sum fast path: ints only — the cumsum-difference trick subtracts two
    # GLOBAL prefixes, so float error would scale with the whole array's
    # magnitude (catastrophic cancellation near segment starts); floats
    # take the doubling path, which only ever combines within segments.
    # TPU large-n int sums take the doubling path instead: the fill gather
    # runs at ~0.11 G rows/s there (155 ms @2^24 vs doubling's 8.9)
    elif (op == "sum" and jnp.issubdtype(values.dtype, jnp.integer)
          and (jax.default_backend() != "tpu" or n < (1 << 18))):
        out = _segmented_cumsum(values, flags)
    else:
        out = _segmented_doubling(values, flags, f)
    if init is not None:
        out = f(jnp.asarray(init, values.dtype), out)
    return out


def plain_scan(values, op, *, identity=None, exclusive: bool = False,
               init=None):
    """Whole-array prefix scan on the same compact-primitive machinery
    (one all-False flag set) — the associative_scan-free path the compat
    layers (DeviceScan/thrust) use for custom operators."""
    n = values.shape[0]
    if n == 0:
        return values
    flags = jnp.zeros((n,), bool)
    return segmented_scan(values, flags, op, identity=identity,
                          exclusive=exclusive, init=init)


def reduce_with(values, op, init=None, *, identity=None):
    """Whole-array reduction for an arbitrary associative op: a log-depth
    pairwise fold (halving loop) — no scan primitive, no n-step loop."""
    f, _ = _resolve_op(op, identity, values.dtype, need_identity=False)
    v = values
    while v.shape[0] > 1:
        m = v.shape[0] // 2
        head = f(v[:m], v[m:2 * m])
        v = (head if v.shape[0] % 2 == 0
             else jnp.concatenate([head, v[-1:]]))
    total = v[0]
    if init is not None:
        total = f(jnp.asarray(init, values.dtype), total)
    return total


@functools.partial(
    jax.jit,
    static_argnames=("op", "equality_op", "exclusive", "engine"),
)
def scan_by_key(
    keys,
    values: jnp.ndarray,
    op="sum",
    *,
    identity=None,
    exclusive: bool = False,
    init=None,
    equality_op: Callable | None = None,
    engine: str = "auto",
):
    """Scan ``values`` within runs of consecutive equal ``keys``.

    ``keys`` may be one array or a tuple of equal-length arrays (runs break
    where ANY column changes). op: "sum"|"prod"|"min"|"max" or an
    associative callable (then pass identity=). Matches
    cub::DeviceScan::*ByKey semantics (run-based segments, per-segment
    init for exclusive scans).
    """
    n = values.shape[0]
    if n == 0:
        return values
    heads = _head_flags(keys, n, equality_op)
    return segmented_scan(values, heads, op, identity=identity,
                          exclusive=exclusive, init=init, engine=engine)
