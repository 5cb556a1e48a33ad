"""Group-by aggregation (count/sum/min/max) — sort + segmented scan.

TPU-native design (BASELINE.json:10): hash-table aggregation needs scatter
(dead on TPU); instead rows are radix-sorted by group key and per-group
reductions are SEGMENTED SCANS (associative, log-step, no gathers):

  sorted keys -> segment starts (neighbor compare) -> reversed segmented
  inclusive scan puts each segment's TOTAL at its START row -> compact the
  start rows with the filter operator.

Skew (Zipf keys) costs nothing here beyond the sort itself — a heavy group
is just a long segment; the distributed variant (parallel/shuffle.py)
handles cross-device skew by partial-aggregating locally before exchange.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cuda.radixsort_tpu import config as config_lib
from cuda.radixsort_tpu.ops.filter import filter_columns as _filter_columns
from cuda.radixsort_tpu.ops.sort import sort_pairs as _sort_pairs

_OPS = {
    "sum": (jnp.add, 0),
    "count": (jnp.add, 0),
    "min": (jnp.minimum, None),  # identity filled per dtype
    "max": (jnp.maximum, None),
}


def _segmented_total_at_start(values, is_start, op):
    """Reversed segmented inclusive scan: out[i] = reduce of i's segment,
    valid at segment-start rows. Segment flags mark starts (ascending)."""

    def combine(l, r):
        lv, lf = l
        rv, rf = r
        # standard segmented-scan operator: r starts a segment -> keep r
        return jnp.where(rf, rv, op(lv, rv)), lf | rf

    vrev = values[::-1]
    # reversed flags: position j starts a reversed segment iff its original
    # row was a segment END, i.e. frev[0]=True, frev[j] = is_start[n-j]
    frev = jnp.concatenate([jnp.ones((1,), bool), is_start[1:][::-1]])
    out, _ = jax.lax.associative_scan(combine, (vrev, frev))
    return out[::-1]


@functools.partial(jax.jit, static_argnames=("agg", "config"))
def groupby(
    keys: jnp.ndarray,
    values: jnp.ndarray | None = None,
    *,
    agg: str = "sum",
    config: config_lib.SortConfig | None = None,
):
    """Group rows by key and reduce values per group.

    Returns (group_keys, aggregates, count): rows [0, count) hold one row per
    distinct key (key-ascending). agg="count" ignores `values`.
    """
    if agg not in _OPS:
        raise ValueError(agg)
    cfg = config_lib.resolve(config)
    n = keys.shape[0]
    if agg == "count" or values is None:
        values = jnp.ones((n,), jnp.int32)
    op, _ = _OPS[agg]

    skeys, svals = _sort_pairs(keys, values, config=cfg)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]]
    )
    totals = _segmented_total_at_start(svals, is_start, op)
    (gk, gv), count = _filter_columns(
        is_start, (skeys, totals), config=cfg
    )
    return gk, gv, count
