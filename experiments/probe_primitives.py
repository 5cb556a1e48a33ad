"""Probe TPU primitives to choose the scatter-kernel architecture.

Measures, on the attached chip:
  A. XLA baselines: lax.sort, 1-D scatter (.at[perm].set), 1-D gather (take)
  B. in-Pallas lane gather (jnp.take_along_axis axis=-1)
  C. in-Pallas sublane gather (dynamic row indexing / take_along_axis axis=0)
  D. one-hot matmul permutation throughput (MXU)
  E. pltpu.roll with traced shift
Results inform NOTES.md. Run: python experiments/probe_primitives.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def report(name, secs, n):
    print(f"{name:46s} {secs*1e3:9.3f} ms   {n/secs/1e9:8.3f} Gelem/s")


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)

    # ---------------- A. XLA baselines ----------------
    for n in (1 << 24, 1 << 26):
        x = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        f = jax.jit(jnp.sort)
        report(f"A1 xla sort u32 n=2^{n.bit_length()-1}", bench(f, x), n)

        perm = jnp.asarray(rng.permutation(n).astype(np.int32))
        f2 = jax.jit(lambda p, v: jnp.zeros_like(v).at[p].set(v, unique_indices=True))
        report(f"A2 xla scatter-perm n=2^{n.bit_length()-1}", bench(f2, perm, x), n)

        f3 = jax.jit(lambda p, v: v[p])
        report(f"A3 xla gather-perm  n=2^{n.bit_length()-1}", bench(f3, perm, x), n)

    # ---------------- B. Pallas lane gather ----------------
    R, L = 64, 128  # tile
    T = 2048        # grid size

    def lane_gather_kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    n = T * R * L
    x = jnp.asarray(rng.integers(0, 2**31, size=(T * R, L), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, L, size=(T * R, L), dtype=np.int32))
    try:
        f = jax.jit(lambda x, i: pl.pallas_call(
            lane_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(x, i))
        report("B1 pallas lane-gather (take_along_axis ax1)", bench(f, x, idx), n)
    except Exception as e:
        print("B1 pallas lane-gather FAILED:", str(e)[:300])

    # ---------------- C. Pallas sublane gather ----------------
    def sublane_gather_kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    idx0 = jnp.asarray(rng.integers(0, R, size=(T * R, L), dtype=np.int32))
    try:
        f = jax.jit(lambda x, i: pl.pallas_call(
            sublane_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(x, idx0))
        report("C1 pallas sublane-gather (ax0)", bench(f, x, idx0), n)
    except Exception as e:
        print("C1 pallas sublane-gather FAILED:", str(e)[:300])

    # C2: full-tile flat gather via one axis: gather rows R*? try x_ref[idx] rows
    def row_gather_kernel(x_ref, idx_ref, o_ref):
        # gather whole rows by dynamic row index, one row at a time
        def body(i, _):
            o_ref[i, :] = x_ref[idx_ref[i, 0], :]
            return 0
        jax.lax.fori_loop(0, R, body, 0)

    idxr = jnp.asarray(rng.integers(0, R, size=(T * R, L), dtype=np.int32))
    try:
        f = jax.jit(lambda x, i: pl.pallas_call(
            row_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(x, idxr))
        report("C2 pallas row-at-a-time dyn row gather", bench(f, x, idxr), n)
    except Exception as e:
        print("C2 pallas row dyn gather FAILED:", str(e)[:300])

    # ---------------- D. one-hot matmul permutation ----------------
    def onehot_perm_kernel(x_ref, rank_ref, o_ref):
        nloc = R * L
        xf = x_ref[:].reshape(nloc, 1)
        # split i32 key into two exact f32 halves
        hi = (x_ref[:].reshape(nloc, 1) >> 16).astype(jnp.float32)
        lo = (x_ref[:].reshape(nloc, 1) & 0xFFFF).astype(jnp.float32)
        rhs = jnp.concatenate([hi, lo] * 64, axis=1)  # fake 128-wide payload
        dest = rank_ref[:].reshape(nloc, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (nloc, nloc), 1)
        P = (cols == dest).astype(jnp.float32)  # row i -> one-hot at dest[i]
        out = jax.lax.dot_general(P, rhs, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[:] = out[:, 0:1].astype(jnp.int32).reshape(R, L) * 65536 + out[:, 1:2].astype(jnp.int32).reshape(R, L)

    RR, LL = 8, 128  # 1024-elem tile for the n^2 one-hot
    def onehot_small(x_ref, rank_ref, o_ref):
        nloc = RR * LL
        hi = (x_ref[:].reshape(nloc, 1) >> 16).astype(jnp.float32)
        lo = (x_ref[:].reshape(nloc, 1) & 0xFFFF).astype(jnp.float32)
        rhs = jnp.concatenate([hi, lo], axis=1)
        dest = rank_ref[:].reshape(nloc, 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nloc, nloc), 0)
        P = (rows == dest).astype(jnp.float32).T  # out[j] = sum_i P[j,i] x[i]
        out = jax.lax.dot_general(P, rhs, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[:] = (out[:, 0].astype(jnp.int32).reshape(RR, LL) * 65536
                    + out[:, 1].astype(jnp.int32).reshape(RR, LL))

    Tn = T * R // RR
    xs = jnp.asarray(rng.integers(0, 2**31, size=(Tn * RR, LL), dtype=np.int32))
    pr = np.stack([rng.permutation(RR * LL) for _ in range(64)])
    ranks = jnp.asarray(pr[rng.integers(0, 64, size=Tn)].reshape(Tn * RR, LL).astype(np.int32))
    try:
        f = jax.jit(lambda x, r: pl.pallas_call(
            onehot_small,
            out_shape=jax.ShapeDtypeStruct((Tn * RR, LL), jnp.int32),
            grid=(Tn,),
            in_specs=[pl.BlockSpec((RR, LL), lambda t: (t, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((RR, LL), lambda t: (t, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((RR, LL), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(x, r))
        out = f(xs, ranks)
        # verify
        want = np.zeros(RR * LL, np.int32)
        xin = np.asarray(xs[:RR * RR and RR, :]).reshape(-1)
        report("D1 pallas one-hot perm (1024-tile)", bench(f, xs, ranks), n)
    except Exception as e:
        print("D1 one-hot perm FAILED:", str(e)[:300])

    # ---------------- E. dynamic roll ----------------
    def roll_kernel(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=s_ref[0], axis=1)

    s = jnp.asarray(rng.integers(0, L, size=(T,), dtype=np.int32))
    try:
        f = jax.jit(lambda x, s: pl.pallas_call(
            roll_kernel,
            out_shape=jax.ShapeDtypeStruct((T * R, L), jnp.int32),
            grid=(T,),
            in_specs=[pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1,), lambda t: (t,), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((R, L), lambda t: (t, 0), memory_space=pltpu.VMEM),
        )(x, s))
        report("E1 pallas dynamic roll (lanes)", bench(f, x, s), n)
    except Exception as e:
        print("E1 dynamic roll FAILED:", str(e)[:300])


if __name__ == "__main__":
    main()
