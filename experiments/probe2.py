"""Probe v2 — trustworthy timing (per-iter block, distinct inputs) + verification."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, make_args, iters=10, warmup=2):
    args_list = [make_args(i) for i in range(4)]
    for i in range(warmup):
        jax.block_until_ready(fn(*args_list[i % 4]))
    times = []
    for i in range(iters):
        a = args_list[i % 4]
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        times.append(time.perf_counter() - t0)
    return min(times)


def report(name, secs, n):
    print(f"{name:48s} {secs*1e3:9.3f} ms   {n/secs/1e9:8.3f} Gelem/s", flush=True)


rng = np.random.default_rng(0)


def main():
    print("backend:", jax.default_backend(), flush=True)

    n = 1 << 24
    # ---------------- A. XLA baselines (fixed harness) ----------------
    f = jax.jit(jnp.sort)
    report("A1 xla sort u32 n=2^24",
           bench(f, lambda i: (jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32)),)), n)

    f2 = jax.jit(lambda p, v: jnp.zeros_like(v).at[p].set(v, unique_indices=True))
    report("A2 xla scatter-perm n=2^24",
           bench(f2, lambda i: (jnp.asarray(rng.permutation(n).astype(np.int32)),
                                jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32)))), n)

    f3 = jax.jit(lambda p, v: v[p])
    report("A3 xla gather-perm  n=2^24",
           bench(f3, lambda p_i: (jnp.asarray(rng.permutation(n).astype(np.int32)),
                                  jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32)))), n)

    f4 = jax.jit(lambda x: x + 1)
    report("A4 xla elementwise add (HBM r+w bound)",
           bench(f4, lambda i: (jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32)),)), n)

    # ---------------- B. Pallas lane gather, verified ----------------
    R, L, T = 64, 128, 2048

    def lane_gather_kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    def run_lane(x, i):
        return pl.pallas_call(
            lane_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(x, i)

    x0 = jnp.asarray(rng.integers(0, 2**31, size=(T * R, L), dtype=np.int32))
    i0 = jnp.asarray(rng.integers(0, L, size=(T * R, L), dtype=np.int32))
    got = np.asarray(jax.jit(run_lane)(x0, i0))
    want = np.take_along_axis(np.asarray(x0), np.asarray(i0), axis=1)
    print("B1 lane-gather correct:", np.array_equal(got, want), flush=True)
    report("B1 pallas lane-gather",
           bench(jax.jit(run_lane), lambda _: (x0, i0)), T * R * L)

    # B2: gather from wider table: x (R, 512), idx (R, 128) -> out (R,128)
    def table_gather_kernel(tab_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    def run_tab(tab, i):
        return pl.pallas_call(
            table_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, 512), lambda t: (t, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(tab, i)

    tab0 = jnp.asarray(rng.integers(0, 2**31, size=(T * R, 512), dtype=np.int32))
    i2 = jnp.asarray(rng.integers(0, 512, size=(T * R, L), dtype=np.int32))
    try:
        got = np.asarray(jax.jit(run_tab)(tab0, i2))
        want = np.take_along_axis(np.asarray(tab0), np.asarray(i2), axis=1)
        print("B2 table-gather(512) correct:", np.array_equal(got, want), flush=True)
        report("B2 pallas 512-table gather", bench(jax.jit(run_tab), lambda _: (tab0, i2)), T * R * L)
    except Exception as e:
        print("B2 FAILED:", str(e)[:200], flush=True)

    # ---------------- F. two-nibble MXU histogram ----------------
    NP_ = 4  # fused passes

    def hist_kernel(x_ref, hist_ref):
        x = x_ref[:].reshape(R * L // 128, 128)  # (rows,128) u32 as i32
        accum = jnp.zeros((NP_ * 16, 16), jnp.float32)
        for p in range(NP_):
            d = (x >> (8 * p)) & 0xFF
            hi = (d >> 4).astype(jnp.int32)
            lo = (d & 0xF).astype(jnp.int32)
            bh = jax.lax.broadcasted_iota(jnp.int32, (R, L, 1), 2) // 1
            A = (hi[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (R, L, 16), 2)).astype(jnp.float32)
            Bm = (lo[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (R, L, 16), 2)).astype(jnp.float32)
            # contract over (R, L): count[bh, bl] = sum A[..,bh] * B[..,bl]
            cnt = jax.lax.dot_general(A.reshape(R * L, 16), Bm.reshape(R * L, 16),
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            accum = accum.at[p * 16:(p + 1) * 16, :].set(cnt)
        hist_ref[:] = accum.astype(jnp.int32)

    def run_hist(x):
        return pl.pallas_call(
            hist_kernel,
            out_shape=jax.ShapeDtypeStruct((T, NP_ * 16, 16), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, NP_ * 16, 16), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        )(x)

    try:
        got = np.asarray(jax.jit(run_hist)(x0))
        xa = np.asarray(x0).reshape(T, R * L)
        ok = True
        for p in range(NP_):
            d = (xa[0] >> (8 * p)) & 0xFF
            want = np.bincount(d, minlength=256).reshape(16, 16)
            ok &= np.array_equal(got[0, p * 16:(p + 1) * 16, :], want)
        print("F1 nibble-hist correct:", ok, flush=True)
        report("F1 pallas 4-pass fused histogram", bench(jax.jit(run_hist), lambda _: (x0,)), T * R * L)
    except Exception as e:
        print("F1 FAILED:", str(e)[:300], flush=True)

    # ---------------- E. dynamic roll (2D block) ----------------
    def roll_kernel(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=s_ref[0, 0], axis=1)

    def run_roll(x, s):
        return pl.pallas_call(
            roll_kernel,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1), lambda t: (t, 0), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(x, s)

    s0 = jnp.asarray(rng.integers(0, L, size=(T, 1), dtype=np.int32))
    try:
        got = np.asarray(jax.jit(run_roll)(x0, s0))
        print("E1 dyn roll compiled; sample ok:",
              np.array_equal(got[:R], np.roll(np.asarray(x0)[:R], -int(s0[0, 0]), axis=1))
              or np.array_equal(got[:R], np.roll(np.asarray(x0)[:R], int(s0[0, 0]), axis=1)), flush=True)
        report("E1 pallas dynamic roll", bench(jax.jit(run_roll), lambda _: (x0, s0)), T * R * L)
    except Exception as e:
        print("E1 FAILED:", str(e)[:300], flush=True)

    # ---------------- G. DMA issue rate: copy 8-row chunks VMEM->HBM at dyn offsets ----
    CH = 8  # rows per DMA

    def dma_kernel(x_ref, off_ref, o_hbm, sem):
        def body(i, _):
            src = x_ref.at[pl.ds(i * CH, CH), :]
            dst = o_hbm.at[pl.ds(off_ref[i, 0] * CH, CH), :]
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()
            return 0
        jax.lax.fori_loop(0, R // CH, body, 0)

    def run_dma(x, off):
        return pl.pallas_call(
            dma_kernel,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((R // CH, 1), lambda t: (t, 0), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x, off)

    off0 = jnp.asarray(rng.permutation(T * R // CH).astype(np.int32).reshape(T, R // CH, 1)).reshape(T * (R // CH), 1)
    try:
        got = jax.jit(run_dma)(x0, off0)
        jax.block_until_ready(got)
        report("G1 8-row DMA scatter (serial wait)", bench(jax.jit(run_dma), lambda _: (x0, off0)), T * R * L)
    except Exception as e:
        print("G1 FAILED:", str(e)[:300], flush=True)


if __name__ == "__main__":
    main()
