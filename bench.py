"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric (BASELINE.json:2): keys/s/chip sorting uint32. Baseline comparator is
XLA's own `jnp.sort` on the same chip/size — the thing a JAX user would use
today (no reference-repo numbers exist on this machine; BASELINE.json
"published" is empty, see SURVEY.md §6).

Timing: K-chained iterations inside one jit with a data dependency +
device_get of a reduction (the only methodology that survives the axon
tunnel's broken block_until_ready — NOTES.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("BENCH_N", 1 << 24))
K = int(os.environ.get("BENCH_K", 8))


def timed_chain(step, x0, k=K):
    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, x: step(x), x)

    _ = jax.device_get(jnp.sum(run(x0, 1)[..., :1]))  # compile + warm
    t0 = time.perf_counter()
    _ = jax.device_get(jnp.sum(run(x0, k)[..., :1]))
    t1 = time.perf_counter()
    _ = jax.device_get(jnp.sum(run(x0, 3 * k)[..., :1]))
    t2 = time.perf_counter()
    return max(((t2 - t1) - (t1 - t0)) / (2 * k), 1e-9)


def main():
    import cuda.radixsort_tpu as rs

    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 2**32, size=N, dtype=np.uint32))

    # keep the chain honest: output feeds next input (rotate bits so the data
    # stays uniformly random and the sort can't be elided)
    def ours(x):
        y = rs.sort(x, config=rs.SortConfig(engine=rs.best_engine()))
        return (y >> jnp.uint32(7)) | (y << jnp.uint32(25))

    def baseline(x):
        y = jnp.sort(x)
        return (y >> jnp.uint32(7)) | (y << jnp.uint32(25))

    t_ours = timed_chain(ours, keys)
    t_base = timed_chain(baseline, keys)

    keys_per_s = N / t_ours
    print(json.dumps({
        "metric": "u32_sort_keys_per_s_per_chip",
        "value": round(keys_per_s, 1),
        "unit": "keys/s",
        "vs_baseline": round(t_base / t_ours, 4),
    }))


if __name__ == "__main__":
    main()
