"""On-device correctness + timing check for the lm=22 1B configuration.

Sortedness + multiset preservation (sum/xor checksums) checked on device —
no 4 GB host transfer through the relay. Run with span env knobs as
desired; prints one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cuda.radixsort_tpu.kernels.bitonic import sort_planes_bitonic
from cuda.radixsort_tpu.utils.profiling import timed_chain

LOGN = int(os.environ.get("RS_LOGN", "30"))
LM = int(os.environ.get("RS_LM", "22"))
N = 1 << LOGN
key = jax.random.PRNGKey(1)


def fill(buf):
    chunk = 1 << 27

    def body(i, b):
        piece = jax.random.fold_in(key, i)
        bits = jax.random.bits(piece, (chunk,), jnp.uint32)
        return jax.lax.dynamic_update_slice(b, bits, (i * chunk,))

    return jax.lax.fori_loop(0, N // chunk, body, buf)


x = jax.jit(fill)(jnp.zeros((N,), jnp.uint32)) if N >= (1 << 28) \
    else jax.random.bits(key, (N,), jnp.uint32)


@jax.jit
def checksums(v):
    # x64 is off on this backend: wrap-mod-2^32 i32 sums (deterministic
    # two's-complement wraparound) + an xor fold — multiset-sensitive
    lo = jnp.sum((v & jnp.uint32(0xFFFF)).astype(jnp.int32),
                 dtype=jnp.int32)
    hi = jnp.sum((v >> jnp.uint32(16)).astype(jnp.int32), dtype=jnp.int32)
    xr = jax.lax.reduce(v, jnp.uint32(0), jax.lax.bitwise_xor, (0,))
    return lo, hi, xr


@jax.jit
def sort1(v):
    return sort_planes_bitonic([v], n_cmp=1, log_merge=LM)[0]


y = sort1(x)
ok_sorted = bool(jax.jit(lambda v: jnp.all(v[1:] >= v[:-1]))(y))
l0, h0, x0 = checksums(x)
l1, h1, x1 = checksums(y)
ok_multiset = (int(l0) == int(l1) and int(h0) == int(h1)
               and int(x0) == int(x1))
del y


def rot(v):
    return (v >> jnp.uint32(7)) | (v << jnp.uint32(25))


t = timed_chain(lambda v: rot(sort1(v)), x, k=1)
print(json.dumps({
    "logn": LOGN, "lm": LM, "sorted": ok_sorted, "multiset": ok_multiset,
    "ms": round(t * 1e3, 2), "g_per_s": round(N / t / 1e9, 3),
    "cmax": os.environ.get("RS_SPAN_CMAX", "default"),
    "log_block": os.environ.get("RS_SPAN_LOG_BLOCK", "default"),
}), flush=True)
