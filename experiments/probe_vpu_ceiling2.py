"""VPU ceiling round 2: medians, non-foldable ALU chain, plus IN-SITU
per-stage costs of the real tile-sort / merge / span kernels at 2^24."""
import sys, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from cuda.radixsort_tpu.utils.profiling import timed_chain

_I32 = jnp.int32
LANES = 128
ROWS = 256
N = 1 << 24
UNIT = N / (1024 * 0.94e9)


def med(f, x, reps=3):
    return float(np.median([timed_chain(f, x, k=6) for _ in range(reps)]))


def _lane_body(K, x_ref, o_ref):
    x = x_ref[...]
    lane = jax.lax.broadcasted_iota(_I32, x.shape, 1)
    for j in range(K):
        s = 1 << (j % 7)
        idx = lane ^ s
        p = jnp.take_along_axis(x, idx, axis=-1)
        hi = ((lane & s) != 0) ^ ((j & 8) != 0)
        x = jnp.where(hi, jnp.maximum(x, p), jnp.minimum(x, p))
    o_ref[...] = x


def _row_body(K, x_ref, o_ref):
    x = x_ref[...]
    row = jax.lax.broadcasted_iota(_I32, x.shape, 0)
    for j in range(K):
        rs = 1 << (j % 8)
        hi = ((row & rs) != 0) ^ ((j & 8) != 0)
        p = jnp.where(hi, pltpu.roll(x, shift=jnp.int32(rs), axis=0),
                      pltpu.roll(x, shift=jnp.int32(ROWS - rs), axis=0))
        x = jnp.where(hi, jnp.maximum(x, p), jnp.minimum(x, p))
    o_ref[...] = x


def _alu_body(K, x_ref, o_ref):
    x = x_ref[...]
    for j in range(K):  # xorshift: 6 non-foldable vector ops per iter
        x = x ^ (x << 13)
        x = x ^ jax.lax.shift_right_logical(x, 17)
        x = x ^ (x << 5)
    o_ref[...] = x


def run(body, K):
    nrows = N // LANES
    spec = pl.BlockSpec((ROWS, LANES), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(body, K),
        grid=(nrows // ROWS,),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nrows, LANES), _I32),
        input_output_aliases={0: 0},
    )
    return jax.jit(lambda v: f(v.reshape(nrows, LANES)).reshape(-1)
                   ^ _I32(1))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**31, size=N).astype(np.int32))
    print(f"UNIT (1 op/elem @2^24, 1/cycle/lane): {UNIT*1e6:.1f} us")
    for name, body, opsper in (("alu", _alu_body, 6),
                               ("lane", _lane_body, 1),
                               ("row", _row_body, 1)):
        t8, t40 = med(run(body, 8), x), med(run(body, 40), x)
        slope = (t40 - t8) / 32
        print(f"{name}: t(8)={t8*1e3:.2f} t(40)={t40*1e3:.2f} ms  "
              f"slope={slope*1e6:.1f} us/stage = "
              f"{slope/UNIT:.2f} op-units/stage "
              f"({slope/UNIT/opsper:.2f} per static op)", flush=True)

    # in-situ: the real kernels at 2^24, 1 plane
    from cuda.radixsort_tpu.kernels import bitonic as B

    u = jnp.asarray(rng.integers(0, 2**32, size=N).astype(np.uint64)
                    .astype(np.uint32))
    nrows = N // LANES

    def tile_sort(lt):
        rows = 1 << (lt - 7)
        f = B._tile_call(functools.partial(B._tile_sort_body, lt, 1, 1),
                         1, nrows, rows, False)
        return jax.jit(lambda v: f(v.reshape(nrows, LANES))[0]
                       .reshape(-1) ^ jnp.uint32(1))

    t14, t16 = med(tile_sort(14), u), med(tile_sort(16), u)
    # stage counts: sum k=1..lt
    s14, s16 = 14 * 15 // 2, 16 * 17 // 2
    print(f"tile_sort lt=14: {t14*1e3:.2f} ms ({s14} st) lt=16: "
          f"{t16*1e3:.2f} ms ({s16} st)  in-situ slope="
          f"{(t16-t14)/(s16-s14)/UNIT:.2f} units/stage", flush=True)

    def merge_level(lm, k):
        rows = 1 << (lm - 7)
        f = B._tile_call(functools.partial(B._tile_merge_body, lm, k, 1, 1),
                         1, nrows, rows, False)
        return jax.jit(lambda v: f(v.reshape(nrows, LANES))[0]
                       .reshape(-1) ^ jnp.uint32(1))

    tm = med(merge_level(20, 24), u)  # 20 stages (13 row + 7 lane)
    print(f"merge lm=20 k=24 (20 st): {tm*1e3:.2f} ms = "
          f"{tm/20/UNIT:.2f} units/stage", flush=True)

    def span(c, k=24):
        # strides k-1 .. k-c (all >= 2^17): one grouped span pass
        def g(v):
            xs = B._cross_span_pallas([v.reshape(nrows, LANES)], k,
                                      k - 1, k - c, 1, False)
            return xs[0].reshape(-1) ^ jnp.uint32(1)
        return jax.jit(g)

    for c in (1, 3, 5):
        ts = med(span(c), u)
        print(f"span c={c} ({c} st): {ts*1e3:.2f} ms = "
              f"{ts/c/UNIT:.2f} units/stage", flush=True)


if __name__ == "__main__":
    main()
