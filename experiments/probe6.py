"""Probe v6 — 256-wide dim1 gather, dyn sublane load, in-kernel transpose shapes."""
import jax, time
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)

def try_case(name, kernel, out_shape, x_shapes, grid=None, **kw):
    xs = [jnp.asarray(rng.integers(0, hi, size=s, dtype=np.int32)) for s, hi in x_shapes]
    try:
        f = jax.jit(lambda *a: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(*out_shape),
            **kw,
        )(*a))
        out = f(*xs)
        jax.device_get(out.reshape(-1)[:4])
        print(f"{name}: OK", flush=True)
        return np.asarray(out), [np.asarray(x) for x in xs]
    except Exception as e:
        msg = str(e).replace("\n", " ")[:200]
        print(f"{name}: FAIL {msg}", flush=True)
        return None, None

# a. 256-wide dim1 gather
def k_g256(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
out, xs = try_case("a g256", k_g256, ((64, 256), jnp.int32),
                   [((64, 256), 2**31), ((64, 256), 256)])
if out is not None:
    want = np.take_along_axis(xs[0], xs[1], axis=1)
    print("a correct:", np.array_equal(out, want), flush=True)

# b. 512-wide dim1 gather
def k_g512(x_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
out, xs = try_case("b g512", k_g512, ((32, 512), jnp.int32),
                   [((32, 512), 2**31), ((32, 512), 512)])
if out is not None:
    want = np.take_along_axis(xs[0], xs[1], axis=1)
    print("b correct:", np.array_equal(out, want), flush=True)

# c. dynamic sublane LOAD (1 row at traced idx) from a VMEM input
def k_dynrow(x_ref, i_ref, o_ref):
    r = i_ref[0] & 63
    row = x_ref[pl.ds(r, 1), :]          # (1, 256)
    o_ref[:] = jnp.broadcast_to(row, o_ref.shape)
_, _ = try_case("c dynrow-load", k_dynrow, ((64, 256), jnp.int32),
                [((64, 256), 2**31), ((8,), 64)],
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))

# d. transpose (256,128)->(128,256) in kernel
def k_tr(x_ref, o_ref):
    o_ref[:] = jnp.transpose(x_ref[:])
out, xs = try_case("d transpose", k_tr, ((128, 256), jnp.int32), [((256, 128), 2**31)])
if out is not None:
    print("d correct:", np.array_equal(out, xs[0].T), flush=True)

# e. reshape (8,128) -> (4,256) in kernel (row-major relayout)
def k_rs(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(4, 256)
out, xs = try_case("e reshape", k_rs, ((4, 256), jnp.int32), [((8, 128), 2**31)])
if out is not None:
    print("e correct:", np.array_equal(out, xs[0].reshape(4, 256)), flush=True)

# f. variable per-element shift (<<) and popcount
def k_shift(x_ref, o_ref):
    s = (x_ref[:] & 3) * 8
    o_ref[:] = ((jnp.int32(1) << s) | jax.lax.population_count(x_ref[:]))
_, _ = try_case("f varshift+popcount", k_shift, ((64, 256), jnp.int32), [((64, 256), 2**31)])
