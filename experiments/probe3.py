"""Probe v3 — timing that survives broken async dispatch.

Method: run K iterations of the op inside ONE jit with a serial data
dependency (output feeds next input), then device_get a scalar. Wall time
is measured for K and 2K iterations; per-iter = (t(2K) - t(K)) / K, which
cancels dispatch/compile/transfer overhead entirely.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed_chain(step, x0, k):
    """step: x -> x (same shape/dtype). Returns wall seconds for k chained iters."""

    @jax.jit
    def run(x, n):
        def body(i, x):
            return step(x)
        return jax.lax.fori_loop(0, n, body, x, unroll=False)

    # warmup/compile
    out = run(x0, 1)
    _ = jax.device_get(jnp.sum(out[..., :1]))
    t0 = time.perf_counter()
    out = run(x0, k)
    _ = jax.device_get(jnp.sum(out[..., :1]))
    t1 = time.perf_counter()
    out = run(x0, 2 * k)
    _ = jax.device_get(jnp.sum(out[..., :1]))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / k


def report(name, secs, n):
    gbs = n * 4 / secs / 1e9
    print(f"{name:52s} {secs*1e3:9.3f} ms  {n/secs/1e9:8.3f} Gelem/s  ({gbs:6.1f} GB/s per r+w stream)", flush=True)


rng = np.random.default_rng(0)


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = 1 << 24
    K = 8

    x0 = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))

    # 1. elementwise add — HBM read+write roofline
    report("P1 add x+1 (r4B + w4B)", timed_chain(lambda x: x + 1, x0, K), n)

    # 2. xla sort
    report("P2 xla sort u32", timed_chain(lambda x: jnp.sort(x), x0, K), n)

    # 3. gather by pseudo-perm (self-indexing to keep dependency)
    def gstep(x):
        p = (x.astype(jnp.int32) & (n - 1))
        return x[p] + 1
    report("P3 xla gather rand-idx", timed_chain(gstep, x0, K), n)

    # 4. scatter by iota-xor perm (true permutation, data-dependent-ish)
    def sstep(x):
        i = jnp.arange(n, dtype=jnp.int32)
        p = i ^ (x[0].astype(jnp.int32) & (n - 1))  # xor with a traced scalar => perm
        return jnp.zeros_like(x).at[p].set(x, unique_indices=True) + 1
    report("P4 xla scatter xor-perm", timed_chain(sstep, x0, K), n)

    # 5. pallas lane-gather tile sort analogue
    R, L, T = 64, 128, n // (64 * 128)

    def lane_gather_kernel(x_ref, o_ref):
        idx = (x_ref[:] & 127).astype(jnp.int32)
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=1) + 1

    def pstep(x):
        y = pl.pallas_call(
            lane_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(x)
        return y

    x2 = jnp.asarray(rng.integers(0, 2**31, size=(T * R, L), dtype=np.int32))
    report("P5 pallas lane-gather(128)", timed_chain(pstep, x2, K), n)

    # 6. pallas pure copy kernel (pallas overhead baseline)
    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1

    def cstep(x):
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(x)
    report("P6 pallas add-copy", timed_chain(cstep, x2, K), n)

    # 7. pallas 256-wide table lane-gather (counting-sort lookup shape)
    def tab_kernel(x_ref, o_ref):
        tab = jnp.cumsum(jnp.ones((R, 256), jnp.int32), axis=1)  # fake table
        idx = (x_ref[:] & 255).astype(jnp.int32)
        o_ref[:] = jnp.take_along_axis(tab, idx, axis=1) + x_ref[:]

    def tstep(x):
        return pl.pallas_call(
            tab_kernel,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(x)
    try:
        report("P7 pallas 256-table gather", timed_chain(tstep, x2, K), n)
    except Exception as e:
        print("P7 FAILED:", str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
