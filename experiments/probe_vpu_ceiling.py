"""VPU ceiling derivation (VERDICT r2 Next #2): measure the per-stage cost
of the exact bitonic compare-exchange primitives in isolation, so the
engine's throughput can be reconciled against a DERIVED floor instead of
an asserted one.

Kernels: a VMEM-resident tile runs K chained stages (data-dependent, so
nothing folds); slope of t(K) = cost per stage per element. Three bodies:
  * lane stage: XOR lane gather + min + max + select (strides 1..64)
  * row stage:  two sublane rolls + select partner + min + max + select
  * alu:        multiply-add chain (the raw issue-rate yardstick)
"""
import sys, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from cuda.radixsort_tpu.utils.profiling import timed_chain

_I32 = jnp.int32
LANES = 128
ROWS = 256  # 2^15-elem tile


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
    r = ROWS
    for j in range(K):
        rs = 1 << (j % 8)
        hi = ((row & rs) != 0) ^ ((j & 8) != 0)
        p = jnp.where(hi, pltpu.roll(x, shift=jnp.int32(rs), axis=0),
                      pltpu.roll(x, shift=jnp.int32(r - rs), axis=0))
        x = jnp.where(hi, jnp.maximum(x, p), jnp.minimum(x, p))
    o_ref[...] = x


def _alu_body(K, x_ref, o_ref):
    x = x_ref[...]
    for j in range(K):
        x = x * _I32(1664525) + _I32(1013904223 + j)
    o_ref[...] = x


def run(body, K, n):
    nrows = n // LANES
    spec = pl.BlockSpec((ROWS, LANES), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(body, K),
        grid=(nrows // ROWS,),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nrows, LANES), _I32),
        input_output_aliases={0: 0},
    )
    g = jax.jit(lambda v: f(v.reshape(nrows, LANES)).reshape(-1)
                ^ _I32(1))
    return g


def main():
    n = 1 << 24
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**31, size=n).astype(np.int32))
    unit = n / (1024 * 0.94e9)  # seconds per 1 op/elem at 1 op/cycle/lane
    print(f"1 op/elem @2^24 at 1/cycle/lane = {unit*1e6:.1f} us")
    for name, body in (("alu", _alu_body), ("lane", _lane_body),
                       ("row", _row_body)):
        ts = {}
        for K in (4, 16, 32):
            f = run(body, K, n)
            ts[K] = timed_chain(f, x, k=4)
        slope = (ts[32] - ts[4]) / 28
        print(f"{name}: t(4)={ts[4]*1e3:.2f} t(16)={ts[16]*1e3:.2f} "
              f"t(32)={ts[32]*1e3:.2f} ms  slope={slope*1e6:.1f} us/stage "
              f"= {slope/unit:.2f} op-units/stage", flush=True)


if __name__ == "__main__":
    main()
