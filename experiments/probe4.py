"""Probe v4 — per-primitive costs with K-chained in-jit timing (noise-proof).

Each candidate op is wrapped as x -> x (same shape/dtype) and run K times
inside one jit via fori_loop with a data dependency; per-iter time from the
difference between K and 3K runs. K large enough that per-iter >> RPC noise.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 64, 128
T = 2048                      # tiles
N = T * R * L                 # 2^24


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


def report(name, secs, n=N):
    print(f"{name:50s} {secs*1e3:9.3f} ms  {n/secs/1e9:8.2f} Gelem/s", flush=True)


def pcall(kernel, x, extra_in=(), out_dtype=jnp.int32):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T * R, L), out_dtype),
        grid=(T,),
        in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM)]
        + list(extra_in),
        out_specs=pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
    )(x, *())


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)
    x0 = jnp.asarray(rng.integers(0, 2**31, size=(T * R, L), dtype=np.int32))

    # 0. pallas copy baseline
    def k_copy(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1
    report("Q0 pallas add-copy", timed(lambda x: pcall(k_copy, x), x0))

    # 1. lane-gather self (dest idx = x & 127)
    def k_gather(x_ref, o_ref):
        idx = (x_ref[:] & 127).astype(jnp.int32)
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=1) + 1
    try:
        report("Q1 lane-gather take_along_axis(ax1)", timed(lambda x: pcall(k_gather, x), x0))
    except Exception as e:
        print("Q1 FAILED:", str(e)[:160], flush=True)

    # 2. dynamic roll by traced scalar per tile
    def k_roll(x_ref, o_ref):
        s = x_ref[0, 0] & 127
        o_ref[:] = pltpu.roll(x_ref[:], shift=s, axis=1) + 1
    try:
        report("Q2 dynamic lane roll (whole tile)", timed(lambda x: pcall(k_roll, x), x0))
    except Exception as e:
        print("Q2 FAILED:", str(e)[:160], flush=True)

    # 3. flat-shift composite: roll lanes + roll sublanes + select
    def k_flat(x_ref, o_ref):
        s = x_ref[0, 0] & 127
        a = pltpu.roll(x_ref[:], shift=s, axis=1)
        b = pltpu.roll(a, shift=1, axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        o_ref[:] = jnp.where(lane >= s, a, b) + 1
    try:
        report("Q3 flat-shift (2 rolls + select)", timed(lambda x: pcall(k_flat, x), x0))
    except Exception as e:
        print("Q3 FAILED:", str(e)[:160], flush=True)

    # 4. 13-step log-shift split emulation (ops cost only)
    def k_split(x_ref, o_ref):
        y = x_ref[:]
        d = y & 0x1FFF
        for k in range(13):
            m = ((d >> k) & 1) == 1
            r = pltpu.roll(y, shift=1 << k if k < 7 else 0, axis=1)
            r = pltpu.roll(r, shift=(1 << k) // 128, axis=0) if k >= 7 else r
            y = jnp.where(m, r, y)
        o_ref[:] = y + 1
    try:
        report("Q4 13-step log-shift route", timed(lambda x: pcall(k_split, x), x0))
    except Exception as e:
        print("Q4 FAILED:", str(e)[:160], flush=True)

    # 5. per-row nibble one-hot + batched MXU count (histogram cost, 1 pass of 8 bits)
    def k_hist(x_ref, o_ref):
        d = x_ref[:] & 0xFF
        hi = (d >> 4)[:, :, None]
        lo = (d & 0xF)[:, :, None]
        i16 = jax.lax.broadcasted_iota(jnp.int32, (R, L, 16), 2)
        A = (hi == i16).astype(jnp.float32).reshape(R * L, 16)
        B = (lo == i16).astype(jnp.float32).reshape(R * L, 16)
        cnt = jax.lax.dot_general(A, B, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # (16,16)
        o_ref[:] = x_ref[:] + cnt.sum().astype(jnp.int32)
    try:
        report("Q5 one-hot MXU 256-bin histogram", timed(lambda x: pcall(k_hist, x), x0))
    except Exception as e:
        print("Q5 FAILED:", str(e)[:160], flush=True)

    # 6. 16-bin lane-prefix rank via Tri matmul per bin
    tri = jnp.tril(jnp.ones((L, L), jnp.float32), -1)

    def k_rank(x_ref, o_ref):
        d = x_ref[:] & 0xF
        rank = jnp.zeros((R, L), jnp.int32)
        for b in range(16):
            m = (d == b).astype(jnp.float32)
            pref = jax.lax.dot_general(m, tri, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            rank = jnp.where(d == b, pref.astype(jnp.int32), rank)
        o_ref[:] = x_ref[:] + rank
    try:
        report("Q6 16-bin Tri-matmul lane rank", timed(lambda x: pcall(k_rank, x), x0))
    except Exception as e:
        print("Q6 FAILED:", str(e)[:160], flush=True)

    # 7. 16-bin log-step lane prefix (VPU only): 7 shifts per bin
    def k_rank7(x_ref, o_ref):
        d = x_ref[:] & 0xF
        rank = jnp.zeros((R, L), jnp.int32)
        for b in range(16):
            m = (d == b).astype(jnp.int32)
            s = m
            for k in range(7):
                sh = pltpu.roll(s, shift=1 << k, axis=1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
                s = s + jnp.where(lane >= (1 << k), sh, 0)
            rank = jnp.where(d == b, s - m, rank)
        o_ref[:] = x_ref[:] + rank
    try:
        report("Q7 16-bin log-step lane rank", timed(lambda x: pcall(k_rank7, x), x0))
    except Exception as e:
        print("Q7 FAILED:", str(e)[:160], flush=True)

    # 8. DMA issue rate: 16 chunk copies of 4 rows HBM->HBM per tile, rotated sems
    CH = 4
    NB = R // CH  # 16 DMAs per tile

    def k_dma(x_hbm, o_hbm, sem):
        t = pl.program_id(0)
        def body(i, _):
            slot = i % 4
            src = x_hbm.at[pl.ds(t * R + ((i * 7) % NB) * CH, CH), :]
            dst = o_hbm.at[pl.ds(t * R + i * CH, CH), :]
            cp = pltpu.make_async_copy(src, dst, sem.at[slot])
            @pl.when(i >= 4)
            def _():
                pltpu.make_async_copy(src, dst, sem.at[slot]).wait()
            cp.start()
            return 0
        jax.lax.fori_loop(0, NB, body, 0)
        def tail(i, _):
            pltpu.make_async_copy(x_hbm.at[pl.ds(0, CH), :], o_hbm.at[pl.ds(0, CH), :], sem.at[i]).wait()
            return 0
        jax.lax.fori_loop(0, min(4, NB), tail, 0)

    def dma_step(x):
        return pl.pallas_call(
            k_dma,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)
    try:
        report("Q8 4-row DMA x16/tile (pipelined)", timed(dma_step, x0))
    except Exception as e:
        print("Q8 FAILED:", str(e)[:300], flush=True)


if __name__ == "__main__":
    main()
