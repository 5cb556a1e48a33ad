"""Equality join — sort-coalesce formulation (BASELINE.json:9).

TPU-native design: hash-table probing is pointer-chasing (dead on a vector
machine), so the join is expressed through the machinery this framework is
fast at — stable sort + segmented scans:

  1. concatenate build rows then probe rows (build first);
  2. stable radix sort by key: equal keys group together with build rows
     FIRST (stability replaces a composite (key, side) sort key);
  3. a "last build row so far" associative scan carries each build row's
     payload forward; a probe row matches iff the carried key equals its own;
  4. probe rows are compacted out with the filter operator.

Supports inner and left joins with unique build keys (the FK-join shape of
the benchmark: 1B probe x 100M build). Duplicate build keys resolve to the
LAST duplicate; 1:N row expansion is future work (needs dynamic output
sizing — planned via two-phase count + gather).

The distributed variant partitions both sides by key hash over the mesh
(parallel/shuffle.py) and runs this local join per shard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cuda.radixsort_tpu import config as config_lib
from cuda.radixsort_tpu import twiddle
from cuda.radixsort_tpu.ops.filter import filter_columns as _filter_columns
from cuda.radixsort_tpu.ops.sort import sort_pairs as _sort_pairs


def _last_valid_scan(bkey, bval, valid):
    """Associative scan: carry (key, val) of the last `valid` row so far."""

    def combine(l, r):
        lk, lv, lf = l
        rk, rv, rf = r
        return (
            jnp.where(rf, rk, lk),
            jnp.where(rf, rv, lv),
            lf | rf,
        )

    return jax.lax.associative_scan(combine, (bkey, bval, valid))


@functools.partial(jax.jit, static_argnames=("how", "config"))
def join(
    build_keys: jnp.ndarray,
    build_vals: jnp.ndarray,
    probe_keys: jnp.ndarray,
    *,
    how: str = "inner",
    config: config_lib.SortConfig | None = None,
):
    """Join probe rows against (unique-key) build rows.

    Returns (keys, vals, probe_idx, count):
      keys[:count]      — probe keys that matched (key-sorted order)
      vals[:count]      — the matched build value per probe row
      probe_idx[:count] — original probe row index (gather other probe
                          columns with it — values-follow-keys)
    For how="left", count == len(probe_keys) and unmatched rows carry
    matched-mask False in vals' companion mask (returned as 5th element).
    """
    if how not in ("inner", "left"):
        raise ValueError(how)
    cfg = config_lib.resolve(config)
    nb, np_ = build_keys.shape[0], probe_keys.shape[0]

    keys = jnp.concatenate([build_keys, probe_keys])
    side = jnp.concatenate(
        [jnp.zeros((nb,), jnp.int32), jnp.ones((np_,), jnp.int32)]
    )
    vals = jnp.concatenate([build_vals, jnp.zeros((np_,), build_vals.dtype)])
    orig = jnp.concatenate(
        [jnp.zeros((nb,), jnp.int32), jnp.arange(np_, dtype=jnp.int32)]
    )

    skeys, (sside, svals, sorig) = _sort_pairs(
        keys, (side, vals, orig), config=cfg
    )

    sbits = twiddle.twiddle_in(skeys)
    is_build = sside == 0
    ck, cv, cvalid = _last_valid_scan(
        jnp.where(is_build, sbits, 0), jnp.where(is_build, svals, 0), is_build
    )
    matched = cvalid & (ck == sbits)
    is_probe = sside == 1

    if how == "inner":
        keep = is_probe & matched
        (ok, ov, oi), count = _filter_columns(
            keep, (skeys, cv, sorig), config=cfg
        )
        return ok, ov, oi, count
    # left join: all probe rows, plus matched mask
    (ok, ov, oi, om), count = _filter_columns(
        is_probe, (skeys, cv, sorig, matched), config=cfg
    )
    return ok, ov, oi, count, om
