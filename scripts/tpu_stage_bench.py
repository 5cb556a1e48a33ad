"""Compile + correctness + speed of partition_stage on real TPU."""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from cuda.radixsort_tpu.kernels import stage as stage_lib
from cuda.radixsort_tpu.kernels import histogram as hist_lib

TILE = stage_lib.ROWS * 128
rng = np.random.default_rng(0)

# correctness at 2 tiles
n = 2 * TILE
keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
kp = jnp.asarray(keys).reshape(n // 128, 128)
d = keys & 15
hist = np.bincount(d, minlength=16).astype(np.int32)
gb = jnp.asarray(np.cumsum(hist) - hist, dtype=jnp.int32)
t0 = time.perf_counter()
out = stage_lib.partition_stage([kp], gb, shift=0)
got = np.asarray(out[0]).reshape(-1)
print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
want = keys[np.argsort(d, kind="stable")]
ok = np.array_equal(got, want)
print("correct:", ok, flush=True)
if not ok:
    bad = np.nonzero(got != want)[0]
    print("mismatches:", len(bad), "first:", bad[:8], got[bad[:4]], want[bad[:4]])
    sys.exit(1)

# speed at 16M (chained)
n = 1 << 24
keys = rng.integers(0, 2**32, size=n, dtype=np.uint32)
kp = jnp.asarray(keys).reshape(n // 128, 128)
hist8 = hist_lib.digit_histograms(kp)
bases = hist_lib.stage_bases(hist8)

@jax.jit
def one_pass(x):
    o = stage_lib.partition_stage([x], bases[0], shift=0)[0]
    return o

@jax.jit
def chain(x, k):
    return jax.lax.fori_loop(0, k, lambda i, x: one_pass(x), x)

_ = jax.device_get(jnp.sum(chain(kp, 1)[:1, :1]))
t0 = time.perf_counter(); _ = jax.device_get(jnp.sum(chain(kp, 4)[:1,:1])); t1 = time.perf_counter()
_ = jax.device_get(jnp.sum(chain(kp, 12)[:1,:1])); t2 = time.perf_counter()
dt = ((t2-t1)-(t1-t0))/8
print(f"stage pass @16M: {dt*1e3:.2f} ms  {n/dt/1e9:.3f} Gelem/s", flush=True)

# histogram kernel speed
@jax.jit
def hchain(x, k):
    def body(i, c):
        h = hist_lib.digit_histograms(x + c.astype(jnp.uint32))
        return h[0,0].astype(jnp.int32) * 0
    return jax.lax.fori_loop(0, k, body, jnp.int32(0))
_ = jax.device_get(hchain(kp, 1))
t0 = time.perf_counter(); _ = jax.device_get(hchain(kp, 4)); t1 = time.perf_counter()
_ = jax.device_get(hchain(kp, 12)); t2 = time.perf_counter()
dt = ((t2-t1)-(t1-t0))/8
print(f"fused hist @16M: {dt*1e3:.2f} ms", flush=True)
