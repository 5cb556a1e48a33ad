"""Route measurement: scan_by_key engines at 2^24 on the chip."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from cuda.radixsort_tpu.utils.profiling import timed_chain
from cuda.radixsort_tpu.ops.scan import (_segmented_cumsum,
                                         _segmented_doubling, _head_flags)
from cuda.radixsort_tpu.kernels.scan import segmented_scan_pallas

rng = np.random.default_rng(0)
n = 1 << 24
keys = rng.integers(0, 1 << 12, size=n).astype(np.uint32)  # random (~len-1 runs)
vals = rng.integers(-99, 99, size=n).astype(np.int32)
kj, vj = jnp.asarray(keys), jnp.asarray(vals)

flags = jax.jit(lambda k: _head_flags(k, n, None))(kj)
jax.block_until_ready(flags)

def rot(v):
    return (v >> jnp.int32(7)) | (v << jnp.int32(25))

for name, fn in [
    ("cumsum+gather", lambda v: rot(_segmented_cumsum(v, flags))),
    ("doubling-sum", lambda v: rot(_segmented_doubling(v, flags, jnp.add))),
    ("pallas", lambda v: rot(segmented_scan_pallas(v, flags, "sum"))),
    ("pallas-min", lambda v: rot(segmented_scan_pallas(v, flags, "min"))),
    ("doubling-min",
     lambda v: rot(_segmented_doubling(v, flags, jnp.minimum))),
]:
    f = jax.jit(fn)
    dt = timed_chain(f, vj, k=4)
    print(f"{name}: {dt*1e3:.2f} ms  ({n/dt/1e9:.2f} G rows/s)", flush=True)

# also: flags computed inline (not constant-folded) — the honest config
def full_sum(v):
    fl = _head_flags(kj, n, None)
    return rot(_segmented_doubling(v, fl, jnp.add))
print("doubling-sum+flags:",
      f"{timed_chain(jax.jit(full_sum), vj, k=4)*1e3:.2f} ms", flush=True)

def full_pallas(v):
    fl = _head_flags(kj, n, None)
    return rot(segmented_scan_pallas(v, fl, "sum"))
print("pallas+flags:",
      f"{timed_chain(jax.jit(full_pallas), vj, k=4)*1e3:.2f} ms", flush=True)
