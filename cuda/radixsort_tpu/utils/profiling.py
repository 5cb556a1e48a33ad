"""Measurement harness — the framework's tracing/profiling subsystem.

Reference parity (SURVEY.md §5): the reference exposes NVTX ranges per public
API call (CUB device_radix_sort.cuh:351,784) and cudaEvent GpuTimer timing.
TPU-native equivalents here:

  * `timed_chain` — the ONLY trustworthy wall-clock methodology through the
    axon tunnel (NOTES.md): K data-dependent iterations chained inside one
    jit via fori_loop, synced by device_get of a reduction, differenced
    against a shorter chain to cancel dispatch overhead.
  * `trace` — wraps a callable in jax.profiler.trace for TensorBoard dumps;
    operators already carry jax.named_scope-visible names via their jitted
    function names.
  * `speed_of_light` — bytes-moved model vs HBM bandwidth, the per-pass
    %SoL report the reference's tuning headers publish
    (tuning_radix_sort.cuh:379 etc.).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp

# v5e HBM ~819 GB/s; override per generation.
HBM_BYTES_PER_S = {"tpu v5 lite": 819e9}
DEFAULT_HBM = 819e9


def timed_chain(step, x0, k: int = 6) -> float:
    """Median-free differential chain timing: returns seconds per step(x).

    step must map x -> same-shape x (rotate bits to keep data random and
    defeat result caching)."""

    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, x: step(x), x)

    _ = jax.device_get(jnp.sum(run(x0, 1).ravel()[:1]))  # compile + warm
    t0 = time.perf_counter()
    _ = jax.device_get(jnp.sum(run(x0, k).ravel()[:1]))
    t1 = time.perf_counter()
    _ = jax.device_get(jnp.sum(run(x0, 3 * k).ravel()[:1]))
    t2 = time.perf_counter()
    return max(((t2 - t1) - (t1 - t0)) / (2 * k), 1e-9)


def timed_calls(fn, args, m: int = 4) -> dict:
    """Sequential-call timing for graphs whose chained-fori wrapper is too
    expensive to compile (e.g. operators embedding Pallas sub-kernels —
    measured >30 min through the remote-compile tunnel). One plain jit
    compile; each call synced by device_get of a tiny reduction. The
    per-call sync overhead (~20-30 ms through the tunnel) is measured with
    a no-op and reported so callers can subtract it."""
    jfn = jax.jit(fn)

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jax.device_get(jnp.sum(leaf.ravel()[:1]))

    noop = jax.jit(lambda: jnp.zeros((1,), jnp.int32))
    _ = sync(noop())
    t0 = time.perf_counter()
    for _ in range(m):
        _ = sync(noop())
    overhead = (time.perf_counter() - t0) / m

    _ = sync(jfn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(m):
        _ = sync(jfn(*args))
    per_call = (time.perf_counter() - t0) / m
    return {"seconds": max(per_call - overhead, 1e-9),
            "sync_overhead_s": overhead, "raw_seconds": per_call}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpusort-trace"):
    """jax.profiler trace scope (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def bitonic_passes(logn: int, n_planes: int = 1, log_tile: int = 16,
                   log_merge: int | None = None) -> int:
    """HBM round trips of the bitonic engine at 2^logn (tile pass +
    per-level spans and merges), derived from the engine's own resolved
    defaults (kernels/bitonic.py) — the bytes-moved model for %SoL
    accounting (VERDICT r3 #5: bench math must follow the shipped config,
    not a parallel table). Every pass reads+writes all n_planes in place.
    Span widths come from the engine's own planner; there is no c_max
    override (ADVICE r4: the old parameter was silently discarded)."""
    from cuda.radixsort_tpu.kernels.bitonic import (_plan_spans,
                                                    resolve_log_merge)
    if log_merge is None:
        log_merge = resolve_log_merge(logn, n_planes)
    log_merge = max(min(log_merge, logn), log_tile)
    passes = 1  # tile sort
    for k in range(min(log_tile, logn) + 1, logn + 1):
        passes += len(_plan_spans(k, log_merge, n_planes)) + 1  # + merge
    return passes


def bitonic_sort_bytes(n: int, n_planes: int = 1) -> int:
    """Total HBM bytes moved by a full bitonic sort of n rows x n_planes
    u32 planes (input padded to the next power of two, as ops/sort.py
    does)."""
    logn = max((n - 1).bit_length(), 1)
    return bitonic_passes(logn, n_planes) * 8 * n_planes * (1 << logn)


def speed_of_light(bytes_moved: int, seconds: float,
                   hbm_bytes_per_s: float | None = None) -> dict:
    """Fraction of HBM speed-of-light achieved by a pass.

    bytes_moved: total HBM reads+writes of the op (e.g. one radix pass over
    N u32 keys = 2 * 4 * N)."""
    bw = hbm_bytes_per_s
    if bw is None:
        kind = jax.devices()[0].device_kind.lower()
        bw = HBM_BYTES_PER_S.get(kind, DEFAULT_HBM)
    achieved = bytes_moved / seconds
    return {
        "achieved_bytes_per_s": achieved,
        "hbm_bytes_per_s": bw,
        "fraction_of_sol": achieved / bw,
    }
