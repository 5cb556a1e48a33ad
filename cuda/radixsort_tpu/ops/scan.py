"""Segmented scans (scan-by-key) — prefix scans that reset at run starts.

Parity: cub::DeviceScan::{Inclusive,Exclusive}{Sum,Scan}ByKey and
InclusiveScanInit (CUB device/device_scan.cuh:1144-1801): segments are
maximal runs of CONSECUTIVE keys equal under ``equality_op`` — a run-based
contract, not a global group-by (sort first, or use ops.aggregate.groupby,
for grouped semantics).

TPU-native design: the classic segmented-scan monoid over (head_flag,
value) pairs,

    (fa, va) . (fb, vb) = (fa | fb,  vb          if fb
                                     op(va, vb)  otherwise)

run through ``lax.associative_scan`` — ONE fused XLA scan over the whole
batch, no kernel boundaries, no per-segment launches, ragged segments
load-balance for free (the CUDA reference needs a tile-state lookback
chain per scan; XLA's scan lowers to the same log-depth tree the hardware
wants). Exclusive scans shift values one slot right WITHIN each segment
(head slots take the operator identity) and run the same inclusive monoid;
a per-segment ``init`` then combines from the left, which is exactly CUB's
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


def segmented_scan(
    values: jnp.ndarray,
    head_flags: jnp.ndarray,
    op="sum",
    *,
    identity=None,
    exclusive: bool = False,
    init=None,
):
    """Prefix-scan ``values`` with ``op``, restarting at every True in
    ``head_flags`` (position 0 is always a segment head).

    exclusive=True shifts the scan right within each segment; ``init``
    (optional) is combined from the left into every output element of the
    segment — for an inclusive scan this is CUB's InclusiveScanInit, for
    an exclusive scan it seeds each segment (ExclusiveScanByKey).
    """
    f, ident = _resolve_op(op, identity, values.dtype,
                           need_identity=exclusive)
    n = values.shape[0]
    flags = jnp.concatenate(
        [jnp.ones((1,), bool), head_flags.astype(bool)[1:]])
    if exclusive:
        shifted = jnp.concatenate([jnp.full((1,), ident, values.dtype),
                                   values[:-1]])
        values = jnp.where(flags, ident, shifted)

    def combine(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, f(av, bv))

    _, out = jax.lax.associative_scan(combine, (flags, values))
    if init is not None:
        out = f(jnp.asarray(init, values.dtype), out)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("op", "equality_op", "exclusive"),
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
                          exclusive=exclusive, init=init)
