"""Distributed radix sort / shuffle over a device mesh.

TPU-native redesign of the reference's single-GPU pipeline for multi-chip:
the reference (CUB dispatch_radix_sort.cuh) never leaves one device — its
"exchange" between histogram and scatter phases is the striped spine in HBM
(kernels/radix_sort.cuh:58-60). Here the same idea becomes a key-range
exchange over ICI: a global histogram (psum) picks balanced splitters, an
all_to_all moves each key to its owner, and each owner sorts its range
locally. Output = globally sorted keys, range-partitioned across devices.

This is simultaneously the generic hash/range SHUFFLE operator demanded by
BASELINE.json:5 (distributed all-to-all shuffle with histogram-driven
partitioning); the join/aggregate operators reuse `exchange_by_bucket`.

Sizing note: the exchange pads each (src,dst) lane to `cap` elements. The
default cap is the full local shard (always correct, memory-hungry).
`sort_distributed_sized` is the two-phase sized exchange: a histogram-only
jitted sizing pass computes the true max (src,dst) lane occupancy, the cap
is rounded up to a power of two (bounding compile variants) and the main
exchange runs with that static cap — recv buffers shrink from ndev*S to
ndev*cap (~ndev x smaller when balanced). This is the distributed analogue
of the reference's two-phase temp-storage query (size call with
d_temp_storage==nullptr, then run — CUB device_radix_sort.cuh:339).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuda.radixsort_tpu import twiddle
from cuda.radixsort_tpu import config as config_lib

try:  # jax>=0.8 top-level; older releases kept it in experimental
    from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _local_sort_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """Ascending unsigned sort of twiddled bits (device-local, collective-free).

    On TPU this is the Pallas bitonic network (3.4x over lax.sort — the
    local sort dominates the distributed pipeline's compute); elsewhere
    (CPU CI meshes) it stays lax.sort."""
    if config_lib.default_backend() == "tpu":
        from cuda.radixsort_tpu.kernels.bitonic import sort_bits_bitonic

        n = bits.shape[0]
        logn = max((n - 1).bit_length(), 10)
        npad = 1 << logn
        if npad != n:
            bits = jnp.concatenate(
                [bits, jnp.full((npad - n,), 0xFFFFFFFF, jnp.uint32)]
            )
        return sort_bits_bitonic(bits)[:n]
    return jax.lax.sort([bits], num_keys=1, is_stable=True, dimension=0)[0]


def _splitter_owner(gh: jnp.ndarray, ndev: int) -> jnp.ndarray:
    """Assign each of the B histogram buckets an owner device, balancing counts.

    gh: (B,) global bucket counts. Returns (B,) int32 owner ids, non-decreasing
    (range partitioning keeps output globally ordered). Balanced by cumulative
    mass — the heavy-hitter-aware analogue of even key-range splitting.
    """
    total = jnp.maximum(jnp.sum(gh), 1)
    # owner of bucket i = floor(ndev * (cumulative mass before midpoint of i) / total)
    cum = jnp.cumsum(gh) - gh // 2
    owner = jnp.clip((cum * ndev) // total, 0, ndev - 1)
    return owner.astype(jnp.int32)


def _make_padded_send(bits, dest, ndev: int, cap: int, sentinel):
    """Group local elements by destination into a dense (ndev, cap) buffer.

    Elements are stably grouped by sorting on (dest, position) so the
    per-destination segments preserve bucket order; segment d occupies
    rows [seg_start[d], seg_start[d]+counts[d]).
    """
    s = bits.shape[0]
    pos = jnp.arange(s, dtype=jnp.uint32)
    order = jax.lax.sort(
        [dest, pos] + [bits], num_keys=2, is_stable=False, dimension=0
    )
    dsorted, _, bsorted = order
    counts = jnp.zeros((ndev,), jnp.int32).at[dest].add(1, mode="drop")
    seg_start = jnp.cumsum(counts) - counts
    idx = seg_start[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    valid = jnp.arange(cap, dtype=jnp.int32)[None, :] < counts[:, None]
    gathered = jnp.take(bsorted, jnp.clip(idx, 0, s - 1).reshape(-1), axis=0)
    send = jnp.where(valid.reshape(-1), gathered, sentinel).reshape(ndev, cap)
    return send, counts


def _route_plan(bits, axis_name: str, ndev: int, sb: int):
    """Shared routing math: splitter histogram -> owner -> per-key dest.

    Returns (dest (S,) uint32, send_counts (ndev,) int32)."""
    top = (bits >> jnp.uint32(32 - sb)).astype(jnp.int32)
    lh = jnp.zeros((1 << sb,), jnp.int32).at[top].add(1, mode="drop")
    gh = jax.lax.psum(lh, axis_name)
    owner = _splitter_owner(gh, ndev)
    dest = owner[top].astype(jnp.uint32)
    counts = jnp.zeros((ndev,), jnp.int32).at[owner].add(lh)
    return dest, counts


def _default_splitter_bits(ndev: int) -> int:
    return min(16, max(8, (ndev - 1).bit_length() + 6))


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis_name", "descending", "splitter_bits")
)
def exchange_cap_for_sort(keys: jnp.ndarray, *, mesh: Mesh, axis_name: str = "x",
                          descending: bool = False,
                          splitter_bits: int | None = None) -> jnp.ndarray:
    """Phase one of the sized exchange: exact max (src,dst) lane occupancy
    for a sort_distributed of these keys. Histogram-only — no sort, no data
    movement beyond two tiny collectives."""
    ndev = mesh.shape[axis_name]
    n = keys.shape[0]
    s = -(-n // ndev)
    pad = s * ndev - n
    bits = twiddle.twiddle_in(keys, descending=descending).astype(jnp.uint32)
    if pad:
        bits = jnp.concatenate([bits, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)])
    sb = splitter_bits or _default_splitter_bits(ndev)

    def shard_fn(b):
        _, counts = _route_plan(b.reshape(-1), axis_name, ndev, sb)
        return jax.lax.pmax(jnp.max(counts), axis_name)

    return shard_map(
        shard_fn, mesh=mesh, in_specs=P(axis_name), out_specs=P()
    )(bits)


def round_cap(c: int, quantum: int = 128) -> int:
    """Round a measured cap up to a power of two (>= quantum) so repeated
    sized exchanges hit a bounded set of compiled variants."""
    c = max(int(c), quantum)
    return 1 << (c - 1).bit_length()


def sort_distributed_sized(keys: jnp.ndarray, *, mesh: Mesh,
                           axis_name: str = "x", descending: bool = False):
    """Two-phase sized distributed sort: measure the exchange (jitted sizing
    pass), then run sort_distributed with the tight static cap.

    Host-level wrapper (two jit calls by design — XLA shapes are static).
    Returns (padded_sorted, valid_counts, cap)."""
    cap = round_cap(int(exchange_cap_for_sort(
        keys, mesh=mesh, axis_name=axis_name, descending=descending)))
    out, counts = sort_distributed(
        keys, mesh=mesh, axis_name=axis_name, cap=cap, descending=descending)
    return out, counts, cap


def sort_sharded_bits(bits, axis_name: str, ndev: int, cap: int | None = None,
                      splitter_bits: int | None = None):
    """Distributed ascending sort of twiddled key bits. Runs inside shard_map.

    bits: (S,) uint32 local shard of twiddled bits (padded with 0xFFFFFFFF
    sentinels allowed — they sort to the global tail).
    Returns (out_padded (ndev*cap,), valid_count ()) per device: device d holds
    the d-th globally-sorted key range, sentinel-padded at the tail.
    """
    s = bits.shape[0]
    cap = s if cap is None else cap
    sb = splitter_bits or _default_splitter_bits(ndev)
    sentinel = jnp.uint32(0xFFFFFFFF)

    dest, _ = _route_plan(bits, axis_name, ndev, sb)

    send, _ = _make_padded_send(bits, dest, ndev, cap, sentinel)
    recv = jax.lax.all_to_all(
        send, axis_name, split_axis=0, concat_axis=0, tiled=False
    )
    flat = recv.reshape(-1)
    out = _local_sort_bits(flat)
    valid = jnp.sum((flat != sentinel).astype(jnp.int32))
    return out, valid


def make_mesh(n: int | None = None, axis: str = "x") -> Mesh:
    n = n or len(jax.devices())
    return jax.make_mesh((n,), (axis,))


@functools.partial(jax.jit, static_argnames=("mesh", "axis_name", "cap", "descending"))
def sort_distributed(keys: jnp.ndarray, *, mesh: Mesh, axis_name: str = "x",
                     cap: int | None = None, descending: bool = False):
    """Globally sort a sharded key array. Returns (padded_sorted, valid_counts).

    padded_sorted: (ndev * percap * ndev,) sharded on the mesh axis — device d
    holds the d-th key range (ascending), sentinel-padded. valid_counts: (ndev,)
    number of real keys per device. `jnp.concatenate` of the trimmed shards is
    the fully sorted array (see tests/test_dsort.py for the reconstruction).
    """
    ndev = mesh.shape[axis_name]
    n = keys.shape[0]
    s = -(-n // ndev)
    pad = s * ndev - n
    bits = twiddle.twiddle_in(keys, descending=descending).astype(jnp.uint32)
    if pad:
        bits = jnp.concatenate([bits, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)])
    ccap = cap or s

    def shard_fn(b):
        out, valid = sort_sharded_bits(b.reshape(-1), axis_name, ndev, cap=ccap)
        return out, valid.reshape(1)

    out, counts = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=(P(axis_name), P(axis_name)),
        # pallas_call out_shapes carry no vma annotation; skip the check
        # (outputs are per-shard by construction)
        check_vma=False,
    )(bits)
    return out, counts


def reconstruct_sorted(out, counts, dtype, n, descending: bool = False):
    """Host-side helper: trim per-device pads and undo the twiddle (tests)."""
    import numpy as np

    ndev = counts.shape[0]
    per = out.shape[0] // ndev
    o = np.asarray(out).reshape(ndev, per)
    c = np.asarray(counts)
    bits = np.concatenate([o[d, : c[d]] for d in range(ndev)])[:n]
    return np.asarray(
        twiddle.twiddle_out(jnp.asarray(bits), dtype, descending=descending)
    )
