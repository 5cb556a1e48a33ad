"""Chip measurement: gather-free groupby/quantile/scan_by_key (round 3)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from cuda.radixsort_tpu.utils.profiling import timed_chain
from cuda.radixsort_tpu.ops.aggregate import groupby, groupby_quantile
from cuda.radixsort_tpu.ops.scan import scan_by_key

rng = np.random.default_rng(0)

def rot32(v):
    return (v >> jnp.uint32(7)) | (v << jnp.uint32(25))

# groupby_quantile @4M, 4096 groups (the bench_suite config)
n = 1 << 22
qk = jnp.asarray(rng.integers(0, 1 << 12, size=n).astype(np.uint32))
def quant_step(k_):
    v = (k_ * jnp.uint32(2654435761)).astype(jnp.int32)
    gk_, qs_, cnt_ = groupby_quantile(k_, v, (0.25, 0.5, 0.9))
    return rot32(k_ ^ cnt_.astype(jnp.uint32))
t = timed_chain(jax.jit(quant_step), qk, k=4)
print(f"groupby_quantile_4M: {t*1e3:.1f} ms ({n/t/1e6:.0f} M rows/s)",
      flush=True)

# correctness spot check vs oracle
ks = np.asarray(qk[: 1 << 16])
vs = (ks * np.uint32(2654435761)).astype(np.int32)
gk_, (q25, q50, q90), cnt_ = groupby_quantile(
    jnp.asarray(ks), jnp.asarray(vs), (0.25, 0.5, 0.9))
cnt_ = int(cnt_)
gk_h = np.asarray(gk_)[:cnt_]
ok = cnt_ == len(np.unique(ks))
for i in (0, cnt_ // 2, cnt_ - 1):
    grp = vs[ks == gk_h[i]]
    ok &= abs(float(np.asarray(q50)[i]) - np.quantile(grp, 0.5)) < 1e-3
    ok &= abs(float(np.asarray(q90)[i]) - np.quantile(grp, 0.9)) < 1e-3
print("quantile correct on chip:", ok, flush=True)

# groupby sum @4M
def gb_step(k_):
    v = (k_ % jnp.uint32(97)).astype(jnp.int32)
    gk_, gv_, cnt_ = groupby(k_, v, agg="sum")
    return rot32(k_ ^ cnt_.astype(jnp.uint32))
t = timed_chain(jax.jit(gb_step), qk, k=4)
print(f"groupby_sum_4M: {t*1e3:.1f} ms ({n/t/1e6:.0f} M rows/s)", flush=True)

gkk, gvv, gcc = groupby(jnp.asarray(ks), jnp.asarray(vs), agg="sum")
uk = np.unique(ks)
want = np.array([vs[ks == u].sum() for u in uk[:5]])
print("groupby sum correct on chip:",
      int(gcc) == uk.shape[0]
      and np.array_equal(np.asarray(gvv)[:5], want), flush=True)

# groupby mean @4M (exercises count arithmetic + sums via reversed scan)
def gbm_step(k_):
    v = (k_ % jnp.uint32(97)).astype(jnp.int32)
    gk_, gv_, cnt_ = groupby(k_, v, agg="mean")
    return rot32(k_ ^ cnt_.astype(jnp.uint32))
t = timed_chain(jax.jit(gbm_step), qk, k=4)
print(f"groupby_mean_4M: {t*1e3:.1f} ms", flush=True)

# scan_by_key @16M through the public op (auto engine)
n2 = 1 << 24
sk = jnp.asarray(rng.integers(0, 1 << 12, size=n2).astype(np.uint32))
def sbk_step(k_):
    v = (k_ % jnp.uint32(97)).astype(jnp.int32)
    return rot32(k_ ^ scan_by_key(k_, v).astype(jnp.uint32))
t = timed_chain(sbk_step, sk, k=4)
print(f"scan_by_key_16M: {t*1e3:.1f} ms ({n2/t/1e6:.0f} M rows/s)",
      flush=True)
