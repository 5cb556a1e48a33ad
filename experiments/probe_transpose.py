"""Cost of an in-kernel (128,128) transpose on v5e — decides whether the
bitonic engine should transpose around lane-stride phases (row rolls cost
0.53 units/stage vs lane gathers 2.37)."""
import sys, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from cuda.radixsort_tpu.utils.profiling import timed_chain

_I32 = jnp.int32
LANES = 128
ROWS = 512
N = 1 << 24
UNIT = N / (1024 * 0.94e9)


def med(f, x, reps=3):
    return float(np.median([timed_chain(f, x, k=6) for _ in range(reps)]))


def _xpose_body(K, x_ref, o_ref):
    x = x_ref[...]          # (512,128)
    for j in range(K):
        y = x.reshape(4, 128, 128)
        y = jnp.swapaxes(y, 1, 2)
        x = y.reshape(ROWS, LANES) + _I32(j)  # dependence
    o_ref[...] = x


def _roll_small_body(K, x_ref, o_ref):
    # roll cost when the rolled block is (128,128) sub-views
    x = x_ref[...]
    row = jax.lax.broadcasted_iota(_I32, x.shape, 0)
    for j in range(K):
        rs = 1 << (j % 7)
        hi = ((row & rs) != 0) ^ ((j & 8) != 0)
        p = jnp.where(hi, pltpu.roll(x, shift=jnp.int32(rs), axis=0),
                      pltpu.roll(x, shift=jnp.int32(ROWS - rs), axis=0))
        x = jnp.where(hi, jnp.maximum(x, p), jnp.minimum(x, p))
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
    # correctness: double transpose is identity (check via K=2 vs K=0 diff)
    try:
        t8, t24 = med(run(_xpose_body, 8), x), med(run(_xpose_body, 24), x)
        slope = (t24 - t8) / 16
        print(f"xpose(4x128x128): slope={slope*1e6:.1f} us = "
              f"{slope/UNIT:.2f} units/transpose", flush=True)
    except Exception as e:
        print("xpose FAILED:", str(e)[:300], flush=True)
    t8, t24 = med(run(_roll_small_body, 8), x), med(run(_roll_small_body, 24), x)
    print(f"roll512 recheck: {((t24-t8)/16)/UNIT:.2f} units/stage",
          flush=True)
    # XLA-level whole-array bit-swap un-permute cost (fallback path)
    def unperm(v):
        return (v.reshape(-1, 128, 512 // 4, 4)  # placeholder shape probe
                ).reshape(-1) ^ _I32(1)
    hi = N >> 16
    def unpermute(v):
        y = v.reshape(hi, 512, 128)          # (tile, i_lo(9b), i_mid(7b))
        y = y.reshape(hi, 4, 128, 128)
        y = jnp.swapaxes(y, 2, 3)            # -> (hi, lo_hi(2b), mid, lo_low)
        y = jnp.swapaxes(y, 1, 2)            # -> (hi, mid, lo_hi, lo_low)
        return y.reshape(-1) ^ _I32(1)
    t = med(jax.jit(unpermute), x)
    print(f"XLA un-permute pass @2^24: {t*1e3:.2f} ms = "
          f"{t/UNIT:.1f} units", flush=True)


if __name__ == "__main__":
    main()
