"""Probe 7: hybrid-sort feasibility on the real TPU.

Questions:
  1. XLA lax.sort throughput vs N (does t ~ a*N*log^2 N hold? memory limit?)
  2. Batched sort (B, M) vs flat (B*M,): how much does the smaller log^2 buy?
  3. dynamic_slice extract + increasing-order dynamic_update_slice reassembly:
     cost of the bucket plumbing.

Methodology: K-chained fori_loop inside one jit + device_get of a reduction
(NOTES.md — block_until_ready is unreliable through the axon tunnel).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(step, x0, k=4):
    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, x: step(x), x)

    _ = jax.device_get(jnp.sum(run(x0, 1).ravel()[:1]))
    t0 = time.perf_counter()
    _ = jax.device_get(jnp.sum(run(x0, k).ravel()[:1]))
    t1 = time.perf_counter()
    _ = jax.device_get(jnp.sum(run(x0, 3 * k).ravel()[:1]))
    t2 = time.perf_counter()
    return max(((t2 - t1) - (t1 - t0)) / (2 * k), 1e-9)


def rot(y):
    return (y >> jnp.uint32(7)) | (y << jnp.uint32(25))


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)

    # 1) flat sort scaling
    for logn in (20, 22, 24, 26, 27):
        n = 1 << logn
        x = jax.random.bits(key, (n,), jnp.uint32)
        t = timed(lambda v: rot(jnp.sort(v)), x, k=2)
        a = t / (n * logn * logn)
        print(f"flat sort 2^{logn}: {t*1e3:8.2f} ms  {n/t/1e9:6.2f} G/s  a={a:.3e}")

    # 2) batched sort: same total elems, varying batch
    n = 1 << 24
    for b in (1, 16, 256):
        m = n // b
        x = jax.random.bits(key, (b, m), jnp.uint32)
        t = timed(lambda v: rot(jnp.sort(v, axis=-1)), x, k=2)
        print(f"batched sort ({b}, 2^{int(np.log2(m))}): {t*1e3:8.2f} ms  "
              f"{n/t/1e9:6.2f} G/s")

    # 3) bucket plumbing: 16 dynamic slices + update-slices over 2^24
    caps = (1 << 21,)
    for cap in caps:
        x = jax.random.bits(key, (n,), jnp.uint32)
        starts = jnp.arange(16, dtype=jnp.int32) * (n // 16)  # static-ish bases

        def plumb(v):
            rows = [jax.lax.dynamic_slice(v, (starts[d] + (v[0] % 2).astype(jnp.int32),),
                                          (cap,)) for d in range(16)]
            mat = jnp.stack(rows)
            out = jnp.zeros((n + cap,), jnp.uint32)
            for d in range(16):
                out = jax.lax.dynamic_update_slice(
                    out, mat[d], (starts[d] + (v[1] % 2).astype(jnp.int32),))
            return rot(out[:n])

        t = timed(plumb, x, k=2)
        print(f"plumb extract+reassemble cap=2^{int(np.log2(cap))}: "
              f"{t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
