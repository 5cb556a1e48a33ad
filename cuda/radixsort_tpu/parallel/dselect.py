"""Distributed selection: k-th value, top-k, distinct over a device mesh.

Reference scope: the single-GPU reference has no multi-device form of these;
they are the mesh-scale generalization the BASELINE contract demands of every
operator (BASELINE.json:5), built from the same primitives as the distributed
sort (parallel/dsort.py).

TPU-native designs:

* `kth_value_distributed` — the radix-select refinement loop of
  `ops/select.py` with ONE change: each 16-bin candidate histogram is a
  `psum` over the mesh axis. 8 tiny collectives (u32) resolve the global
  k-th element with ZERO data movement — no key ever leaves its device.
* `top_k_distributed` — local `top_k` per shard (the global top-k is a
  subset of the union of local top-k's), `all_gather` of the k*ndev
  candidates, exact final selection by one u64 (value, index) sort — the
  index limb reproduces the single-chip tie rule (smallest original
  position wins among threshold ties). Replicated output.
* `distinct_distributed` — `sort_distributed` then per-shard consecutive
  dedup; cross-shard duplicate runs are cut with one `all_gather` of each
  shard's last valid key (runs are contiguous across the sorted shard
  concatenation, so comparing against the nearest non-empty predecessor's
  tail is sufficient).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cuda.radixsort_tpu import twiddle
from cuda.radixsort_tpu.parallel.dsort import (
    _shard_valid,
    axis_size,
    sort_distributed,
)

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


@functools.partial(jax.jit,
                   static_argnames=("mesh", "axis_name", "largest"))
def kth_value_distributed(keys: jnp.ndarray, k, *, mesh: Mesh,
                          axis_name="x", largest: bool = False):
    """Global k-th smallest (0-based; largest=True for k-th largest) of a
    sharded array. Histogram-refinement only — 8 psum'd 16-bin histograms,
    no exchange. Returns a replicated scalar of keys.dtype."""
    if twiddle.bit_width(keys.dtype) > 32:
        raise NotImplementedError(
            "kth_value_distributed: <=32-bit keys (use sort_distributed + "
            "reconstruct for 64-bit selection)")
    ndev = axis_size(mesh, axis_name)
    n = keys.shape[0]
    s = -(-n // ndev)
    pad = s * ndev - n
    bits = twiddle.twiddle_in(keys, descending=largest).astype(jnp.uint32)
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros((pad,), jnp.uint32)])

    def shard_fn(b):
        b = b.reshape(-1)
        valid = _shard_valid(n, s, axis_name)
        prefix = jnp.zeros((), jnp.uint32)
        kk = jnp.asarray(k, jnp.int32)
        for level in range(28, -1, -4):
            shift = jnp.uint32(level)
            himask = jnp.uint32((0xFFFFFFFF << (level + 4)) & 0xFFFFFFFF
                                if level + 4 < 32 else 0)
            cand = valid & ((b & himask) == prefix)
            digit = (b >> shift) & jnp.uint32(15)
            hist = jnp.stack(
                [jnp.sum(jnp.where(cand & (digit == jnp.uint32(d)), 1, 0)
                         .astype(jnp.int32)) for d in range(16)])
            hist = jax.lax.psum(hist, axis_name)
            cum = jnp.cumsum(hist) - hist
            bucket = jnp.sum((cum <= kk).astype(jnp.int32)) - 1
            kk = kk - cum[bucket]
            prefix = prefix | (bucket.astype(jnp.uint32) << shift)
        return prefix.reshape(1)

    out = shard_map(shard_fn, mesh=mesh, in_specs=P(axis_name),
                    out_specs=P(), check_vma=False)(bits)
    return twiddle.twiddle_out(out[0], keys.dtype, descending=largest)


@functools.partial(jax.jit,
                   static_argnames=("k", "mesh", "axis_name", "largest"))
def top_k_distributed(keys: jnp.ndarray, k: int, *, mesh: Mesh,
                      axis_name="x", largest: bool = True):
    """Global top-k (values, original indices) of a sharded array.

    Exchange volume: k rows per device (the local candidates), gathered once;
    the final exact selection is a lexicographic (twiddled value, original
    index) sort of the k*ndev candidates, so ties break to the smallest
    global position — bit-identical to single-chip `ops.select.top_k`.
    (Two-operand `lax.sort`, NOT a u64 pack — u64 silently truncates with
    x64 disabled, the NOTES gotcha.) Output is replicated.
    """
    from cuda.radixsort_tpu.ops.select import top_k as _local_topk

    if twiddle.bit_width(keys.dtype) > 32:
        raise NotImplementedError("top_k_distributed: <=32-bit keys")
    ndev = axis_size(mesh, axis_name)
    n = keys.shape[0]
    s = -(-n // ndev)
    pad = s * ndev - n
    if k > n:
        raise ValueError(f"k={k} > n={n}")
    bits = twiddle.twiddle_in(keys, descending=largest).astype(jnp.uint32)
    if pad:
        # pads are the WORST key in twiddle-descending-of-interest space:
        # twiddled order is ascending and local top-k selects smallest
        # twiddled bits, so 0xFFFFFFFF pads never displace a real candidate
        # unless the shard has fewer than k real rows (handled by validity
        # masking below).
        bits = jnp.concatenate([bits, jnp.full((pad,), 0xFFFFFFFF,
                                               jnp.uint32)])
    kloc = min(k, s)

    def shard_fn(b):
        b = b.reshape(-1)
        d = jax.lax.axis_index(axis_name).astype(jnp.uint32)
        valid = _shard_valid(n, s, axis_name)
        # local candidates on twiddled bits: smallest kloc (twiddle space is
        # ascending; `largest` was already folded into the twiddle)
        vals, idx = _local_topk(b, kloc, largest=False, sorted_result=False)
        gidx = d * jnp.uint32(s) + idx.astype(jnp.uint32)
        # invalid rows (pads) -> push to the very end of the order
        isvalid = jnp.take(valid, idx)
        cv = jnp.where(isvalid, vals, jnp.uint32(0xFFFFFFFF))
        ci = jnp.where(isvalid, gidx, jnp.uint32(0xFFFFFFFF))
        av = jax.lax.all_gather(cv, axis_name).reshape(-1)
        ai = jax.lax.all_gather(ci, axis_name).reshape(-1)
        bv, bi = jax.lax.sort((av, ai), num_keys=2)
        return bv[:k].reshape(1, k), bi[:k].astype(jnp.int32).reshape(1, k)

    tv, ti = shard_map(shard_fn, mesh=mesh, in_specs=P(axis_name),
                       out_specs=(P(), P()), check_vma=False)(bits)
    return (twiddle.twiddle_out(tv[0], keys.dtype, descending=largest),
            ti[0])


@functools.partial(jax.jit, static_argnames=("mesh", "axis_name", "cap"))
def distinct_distributed(keys: jnp.ndarray, *, mesh: Mesh, axis_name="x",
                         cap: int | None = None):
    """Sorted distinct values of a sharded array.

    Returns (padded (ndev*s,) array, per-device counts (ndev,)): device d's
    distinct values are out[d*s : d*s + counts[d]]; the concatenation of the
    valid prefixes is the ascending duplicate-free value set.
    """
    from cuda.radixsort_tpu.ops.unique import _run_starts

    ndev = axis_size(mesh, axis_name)
    n = keys.shape[0]
    s = -(-n // ndev)
    out, counts, _st = sort_distributed(keys, mesh=mesh,
                                        axis_name=axis_name, cap=cap)
    rows = out.shape[0] // ndev

    def shard_fn(b, cnts):
        b = b.reshape(-1)
        c = cnts.reshape(-1)[0]  # in_spec sharded counts: my own entry
        valid = jnp.arange(rows, dtype=jnp.int32) < c
        starts = _run_starts(b) & valid
        # cross-shard runs: my first valid key duplicates the tail of the
        # nearest NON-EMPTY predecessor shard
        me = jax.lax.axis_index(axis_name).astype(jnp.int32)
        last = b[jnp.maximum(c - 1, 0)]
        lasts = jax.lax.all_gather(last, axis_name)          # (ndev,)
        allc = jax.lax.all_gather(c, axis_name)              # (ndev,)
        devs = jnp.arange(lasts.shape[0], dtype=jnp.int32)
        has = (devs < me) & (allc > 0)
        prev_i = jnp.where(jnp.any(has), jnp.argmax(
            jnp.where(has, devs, -1)), jnp.int32(0))
        dup_first = jnp.any(has) & (b[0] == lasts[prev_i]) & (c > 0)
        starts = starts.at[0].set(starts[0] & jnp.logical_not(dup_first))
        # stable compaction of the kept rows (sort of 1-bit partition ids:
        # drop=False rows first, input order preserved)
        drop = jnp.logical_not(starts)
        order = jnp.argsort(drop, stable=True)
        kept = jnp.take(b, order)
        ucnt = jnp.sum(starts.astype(jnp.int32))
        return kept.reshape(1, -1), ucnt.reshape(1)

    uk, ucounts = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name)), check_vma=False,
    )(out, counts)
    return (twiddle.twiddle_out(uk.reshape(-1), keys.dtype),
            ucounts.reshape(-1))
