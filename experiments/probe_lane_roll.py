"""Can lane-dim XOR partners come from lane ROLLS instead of gathers?
partner[i] = x[i^s] == where(bit_s(i)==0, x[i+s], x[i-s]) — two cyclic
lane rotations + select, the same shape as the row stage. Measure vs the
gather formulation, and verify numerically."""
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


def med(f, x, reps=3):
    return float(np.median([timed_chain(f, x, k=6) for _ in range(reps)]))


def _roll_lane_body(K, x_ref, o_ref):
    x = x_ref[...]
    lane = jax.lax.broadcasted_iota(_I32, x.shape, 1)
    for j in range(K):
        s = 1 << (j % 7)
        hi = ((lane & s) != 0)
        p = jnp.where(hi, pltpu.roll(x, shift=jnp.int32(s), axis=1),
                      pltpu.roll(x, shift=jnp.int32(LANES - s), axis=1))
        d = hi ^ ((j & 8) != 0)
        x = jnp.where(d, jnp.maximum(x, p), jnp.minimum(x, p))
    o_ref[...] = x


def _gather_lane_body(K, x_ref, o_ref):
    x = x_ref[...]
    lane = jax.lax.broadcasted_iota(_I32, x.shape, 1)
    for j in range(K):
        s = 1 << (j % 7)
        idx = lane ^ s
        p = jnp.take_along_axis(x, idx, axis=-1)
        d = ((lane & s) != 0) ^ ((j & 8) != 0)
        x = jnp.where(d, jnp.maximum(x, p), jnp.minimum(x, p))
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
    # correctness: both bodies must agree exactly
    a = np.asarray(run(_roll_lane_body, 14)(x))
    b = np.asarray(run(_gather_lane_body, 14)(x))
    print("roll == gather:", np.array_equal(a, b), flush=True)
    unit = N / (1024 * 0.94e9)
    for name, body in (("gather", _gather_lane_body),
                       ("roll", _roll_lane_body)):
        t8, t40 = med(run(body, 8), x), med(run(body, 40), x)
        slope = (t40 - t8) / 32
        print(f"{name}: slope={slope*1e6:.1f} us/st = "
              f"{slope/unit:.2f} units/stage", flush=True)


if __name__ == "__main__":
    main()
