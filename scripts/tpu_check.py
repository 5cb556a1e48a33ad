import time
import jax, jax.numpy as jnp, numpy as np
import cuda.radixsort_tpu as rs

rng = np.random.default_rng(0)
P = rs.SortConfig(engine="pallas")

# correctness small
n = 100_000
keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
t0 = time.perf_counter()
got = np.asarray(rs.sort(jnp.asarray(keys), config=P))
print(f"compile+run 100K: {time.perf_counter()-t0:.0f}s correct:",
      np.array_equal(got, np.sort(keys)), flush=True)

# pairs
vals = np.arange(n, dtype=np.int32)
gk, gv = rs.sort_pairs(jnp.asarray(keys), jnp.asarray(vals), config=P)
perm = np.argsort(keys, kind="stable")
print("pairs correct:", np.array_equal(np.asarray(gk), keys[perm]) and
      np.array_equal(np.asarray(gv), vals[perm]), flush=True)

# speed 16M full sort
n = 1 << 24
keys = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
f = jax.jit(lambda x: rs.sort(x, config=P))
g = jax.jit(lambda x, k: jax.lax.fori_loop(0, k, lambda i, y: f(y) ^ jnp.uint32(i), x))
_ = jax.device_get(jnp.sum(g(keys, 1)[:1]))
t0 = time.perf_counter(); _ = jax.device_get(jnp.sum(g(keys, 2)[:1])); t1 = time.perf_counter()
_ = jax.device_get(jnp.sum(g(keys, 6)[:1])); t2 = time.perf_counter()
dt = ((t2-t1)-(t1-t0))/4
print(f"pallas full u32 sort @16M: {dt*1e3:.1f} ms  {n/dt/1e9:.3f} Gkeys/s", flush=True)

# bitonic engine (the default full-sort path on TPU)
from cuda.radixsort_tpu.utils.profiling import timed_chain

keys_h = np.asarray(keys)
got = np.asarray(rs.sort(keys))
print("bitonic default correct:", np.array_equal(got, np.sort(keys_h)), flush=True)
def _rot_sorted(v):
    y = rs.sort(v)
    return (y >> jnp.uint32(7)) | (y << jnp.uint32(25))
dt = timed_chain(_rot_sorted, keys, k=4)
print(f"bitonic full u32 sort @16M: {dt*1e3:.1f} ms  {n/dt/1e9:.3f} Gkeys/s", flush=True)

perm = np.asarray(rs.argsort(keys[: 1 << 22]))
print("bitonic argsort correct:",
      np.array_equal(perm, np.argsort(keys_h[: 1 << 22], kind="stable")), flush=True)

# partition-class routing (pallas radix by default on TPU)
(fout,), cnt = rs.filter_columns(keys > jnp.uint32(1 << 31), (keys,))
print("filter default correct:",
      np.array_equal(np.asarray(fout)[: int(cnt)], keys_h[keys_h > (1 << 31)]),
      flush=True)
