"""Probe v5 — compile-check the load-bearing mechanics for the stage kernel.

a. take_along_axis(axis=0) (sublane dynamic_gather) — compile + correctness + speed
b. VMEM scratch persistence across sequential grid steps
c. DMA VMEM scratch -> HBM output (ANY) at dynamic row offsets
d. dynamic-start sublane stores into scratch
e. while_loop in kernel
f. in-kernel transpose (32,256)->(256,32)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(step, x0, k=48):
    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, x: step(x), x)
    _ = jax.device_get(jnp.sum(run(x0, 1)[..., :1]))
    t0 = time.perf_counter()
    _ = jax.device_get(jnp.sum(run(x0, k)[..., :1]))
    t1 = time.perf_counter()
    _ = jax.device_get(jnp.sum(run(x0, 3 * k)[..., :1]))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * k)


rng = np.random.default_rng(0)
R, L, T = 256, 128, 512  # 16M elems
N = R * L * T


def main():
    print("backend:", jax.default_backend(), flush=True)

    # ---- a. sublane gather ----
    def k_sub(x_ref, o_ref):
        idx = (x_ref[:] & (R - 1)).astype(jnp.int32)
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=0) + 1

    def sub_step(x):
        return pl.pallas_call(
            k_sub,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(x)

    x0 = jnp.asarray(rng.integers(0, 2**31, size=(T * R, L), dtype=np.int32))
    try:
        got = np.asarray(jax.jit(sub_step)(x0))[:R]
        xa = np.asarray(x0)[:R]
        want = np.take_along_axis(xa, xa & (R - 1), axis=0) + 1
        print("a sublane-gather correct:", np.array_equal(got, want), flush=True)
        dt = timed(sub_step, x0)
        print(f"a sublane-gather: {dt*1e3:8.3f} ms  {N/dt/1e9:6.2f} Gelem/s", flush=True)
    except Exception as e:
        print("a FAILED:", str(e)[:300], flush=True)

    # ---- b+c+d+e+f combined: carry scratch, dyn sublane store, while, transpose, DMA out ----
    # kernel: per grid step t, add tile sum into carry[0,0]; store an 8-row slab into
    # scratch at dynamic row offset; every 4th step DMA a (32,128) block of scratch to
    # the output at dynamic row offset; last step writes carry into out[0,0].
    def k_mix(x_ref, o_hbm, carry, stg, sem):
        t = pl.program_id(0)
        nt = pl.num_programs(0)

        @pl.when(t == 0)
        def _():
            carry[0, 0] = 0

        s = jnp.sum(x_ref[:] & 7)
        carry[0, 0] = carry[0, 0] + s

        # d: dynamic-start sublane store of an 8-row slab (transposed via f)
        slab = x_ref[0:8, :]                      # (8,128)
        slab_t = slab.reshape(8, 128)             # keep 2d
        off = (t % 3) * 8
        stg[pl.ds(off, 8), :] = slab_t + carry[0, 0]

        # e: while loop issuing c: DMA scratch block -> HBM at dynamic offset
        def cond(st):
            return st[0] < st[1]

        def body(st):
            i, n = st
            blk = t % (nt // 4)
            cp = pltpu.make_async_copy(
                stg.at[pl.ds(0, 8), :],
                o_hbm.at[pl.ds(blk * 32 + i * 8, 8), :],
                sem,
            )
            cp.start()
            cp.wait()
            return (i + 1, n)

        @pl.when(t % 4 == 0)
        def _():
            jax.lax.while_loop(cond, body, (0, (t % 2) + 1))

        # f: transpose inside kernel
        tt = jnp.transpose(x_ref[0:32, 0:128].reshape(32, 128))  # (128, 32)
        stg[pl.ds(16, 8), 0:32] = tt[0:8, :] * 0 + tt[8:16, :]

    def mix_step(x):
        return pl.pallas_call(
            k_mix,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.SMEM((1, 1), jnp.int32),
                pltpu.VMEM((32, L), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)

    try:
        out = jax.jit(mix_step)(x0)
        jax.device_get(out[:1, :1])
        print("b-f combined kernel: COMPILES+RUNS", flush=True)
        dt = timed(mix_step, x0)
        print(f"b-f mixed: {dt*1e3:8.3f} ms", flush=True)
    except Exception as e:
        print("b-f FAILED:", str(e)[:400], flush=True)

    # ---- g. dynamic-start LANE store (is it allowed?) ----
    def k_lane(x_ref, o_ref):
        t = pl.program_id(0)
        o_ref[:, :] = x_ref[:]
        o_ref[0:8, pl.ds((t % 2) * 32, 32)] = x_ref[0:8, 0:32] + 1

    def lane_step(x):
        return pl.pallas_call(
            k_lane,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(x)

    try:
        jax.device_get(jax.jit(lane_step)(x0)[:1, :1])
        print("g dyn-lane store: OK", flush=True)
    except Exception as e:
        print("g dyn-lane store FAILED:", str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
