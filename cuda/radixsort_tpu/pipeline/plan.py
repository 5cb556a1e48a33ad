"""Declarative query plans over Table — the engine's logical-plan driver.

The reference stack's user story ends at `thrust::sort`; this framework's
BASELINE contract extends it to pipelined queries (filter -> sort -> join,
BASELINE.json:11). `pipeline/query.py` hand-fuses the flagship shape; this
module is the general form: a small immutable logical plan (`Query`) whose
stages lower onto the measured operator set, threading the static-shape
validity protocol (rows [0, count) valid) through every stage — compacted
tables carry real-but-dropped rows in their tails, so every stage masks by
row position, never by sentinel keys (VERDICT r1 #2's lesson, kept).

    q = (Query(orders)
         .where(lambda t: t["amount"] > 100)
         .join(parts, on="part", value="price")
         .groupby("part", "amount", agg="sum")
         .order_by("amount", descending=True)
         .limit(10))
    out, count, stats = q.run()
    print(q.explain())

Every stage's row count lands in `stats` (SURVEY §5 observability). `run()`
executes eagerly stage-by-stage (each operator is jitted internally); for a
single end-to-end jit, close over the plan: `jax.jit(lambda t: Query(t)...
.run())` — Table is a pytree, plans are static structure.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax.numpy as jnp

from cuda.radixsort_tpu import config as config_lib
from cuda.radixsort_tpu.table import Table


class _Stage(NamedTuple):
    op: str
    args: tuple
    kwargs: dict


class Query:
    """Immutable logical plan over a source Table (or a (Table, count) pair
    whose tail rows are already invalid)."""

    def __init__(self, source: Table, *, _count=None, _stages=()):
        self._source = source
        self._count = _count
        self._stages = tuple(_stages)

    def _with(self, op: str, *args, **kwargs) -> "Query":
        return Query(self._source, _count=self._count,
                     _stages=self._stages + (_Stage(op, args, kwargs),))

    # -- plan builders -------------------------------------------------------
    def where(self, pred: Callable[[Table], jnp.ndarray]) -> "Query":
        """Keep rows where pred(table) is True (stable compaction)."""
        return self._with("where", pred)

    def select(self, *names: str) -> "Query":
        """Project to the named columns."""
        return self._with("select", tuple(names))

    def with_column(self, name: str,
                    fn: Callable[[Table], jnp.ndarray]) -> "Query":
        """Add a computed column (elementwise over the table)."""
        return self._with("with_column", name, fn)

    def join(self, build: Table, *, on: str, value: str,
             build_count=None) -> "Query":
        """Inner join against `build[on]`, bringing `build[value]` across.
        `build_count` marks a compacted build side's valid prefix."""
        return self._with("join", build, on, value, build_count)

    def groupby(self, key: str, value: str, *, agg: str = "sum") -> "Query":
        """Group by `key`, reduce `value`. Output columns: key, value —
        or key, `agg` when value names the key column itself (e.g.
        groupby("x", "x", agg="count") yields columns x, count)."""
        return self._with("groupby", key, value, agg)

    def order_by(self, key: str, *, descending: bool = False) -> "Query":
        """Stable sort by one column; invalid tail rows stay in the tail."""
        return self._with("order_by", key, descending)

    def limit(self, k: int) -> "Query":
        """Truncate the valid prefix to at most k rows."""
        return self._with("limit", k)

    # -- introspection -------------------------------------------------------
    def explain(self) -> str:
        lines = [f"scan {self._source!r}"
                 + ("" if self._count is None else "  [pre-counted]")]
        for st in self._stages:
            if st.op == "where":
                lines.append("where <predicate>")
            elif st.op == "select":
                lines.append(f"select {list(st.args[0])}")
            elif st.op == "with_column":
                lines.append(f"with_column {st.args[0]!r}")
            elif st.op == "join":
                b, on, value, _ = st.args
                lines.append(f"join build={b!r} on={on!r} value={value!r}")
            elif st.op == "groupby":
                key, value, agg = st.args
                lines.append(f"groupby key={key!r} value={value!r} "
                             f"agg={agg!r}")
            elif st.op == "order_by":
                lines.append(f"order_by {st.args[0]!r}"
                             + (" desc" if st.args[1] else ""))
            elif st.op == "limit":
                lines.append(f"limit {st.args[0]}")
        return "\n -> ".join(lines)

    # -- execution -----------------------------------------------------------
    def run(self, *, config: config_lib.SortConfig | None = None):
        """Execute the plan on one chip.

        Returns (table, count, stats): rows [0, count) of every column are
        the result; stats maps "i:op" -> rows valid after that stage.
        """
        t = self._source
        count = (jnp.asarray(t.num_rows, jnp.int32) if self._count is None
                 else jnp.asarray(self._count, jnp.int32))
        stats: dict[str, Any] = {}
        for i, st in enumerate(self._stages):
            t, count = _EXEC[st.op](t, count, st, config)
            stats[f"{i}:{st.op}"] = count
        return t, count, stats


def _valid_mask(t: Table, count) -> jnp.ndarray:
    return jnp.arange(t.num_rows, dtype=jnp.int32) < count


def _exec_where(t: Table, count, st: _Stage, config):
    pred = st.args[0]
    mask = pred(t) & _valid_mask(t, count)
    t2, c2 = t.filter(mask, config=config)
    return t2, c2.astype(jnp.int32)


def _exec_select(t: Table, count, st: _Stage, config):
    return t.select(st.args[0]), count


def _exec_with_column(t: Table, count, st: _Stage, config):
    name, fn = st.args
    return t.with_column(name, fn(t)), count


def _exec_join(t: Table, count, st: _Stage, config):
    from cuda.radixsort_tpu.ops.join import join as join_op

    build, on, value, build_count = st.args
    bk, bv = build[on], build[value]
    bvalid = (None if build_count is None
              else _valid_mask(build, build_count))
    ok, ov, oi, cnt = join_op(bk, bv, t[on], how="inner",
                              build_valid=bvalid,
                              probe_valid=_valid_mask(t, count),
                              config=config)
    out = {on: ok, value: ov}
    for name in t.column_names:
        if name != on:
            out[name] = jnp.take(t[name], oi, axis=0)
    return Table(out), cnt.astype(jnp.int32)


def _exec_groupby(t: Table, count, st: _Stage, config):
    from cuda.radixsort_tpu.ops.aggregate import groupby as groupby_op

    key, value, agg = st.args
    gk, gv, cnt = groupby_op(t[key], t[value], agg=agg,
                             valid=_valid_mask(t, count), config=config)
    out_name = value if value != key else agg
    return Table({key: gk, out_name: gv}), cnt.astype(jnp.int32)


def _exec_order_by(t: Table, count, st: _Stage, config):
    from cuda.radixsort_tpu.ops.sort import sort_struct

    key, descending = st.args
    # validity limb: chosen so the struct-wide `descending` still sinks the
    # invalid tail rows last (they are real dropped rows, not sentinels)
    valid = _valid_mask(t, count)
    flag = (valid if descending else jnp.logical_not(valid)).astype(jnp.uint8)
    others = tuple(n for n in t.column_names if n != key)
    (_, sk), sv = sort_struct((flag, t[key]),
                              tuple(t[n] for n in others),
                              descending=descending, config=config)
    out = dict(zip(others, sv))
    out[key] = sk
    return Table(out), count


def _exec_limit(t: Table, count, st: _Stage, config):
    return t, jnp.minimum(count, jnp.asarray(st.args[0], jnp.int32))


_EXEC = {
    "where": _exec_where,
    "select": _exec_select,
    "with_column": _exec_with_column,
    "join": _exec_join,
    "groupby": _exec_groupby,
    "order_by": _exec_order_by,
    "limit": _exec_limit,
}
