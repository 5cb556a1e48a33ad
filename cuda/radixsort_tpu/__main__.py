"""`python -m cuda.radixsort_tpu` — one-command self-test.

Sorts 1M random u32 on the default backend, verifies against numpy, runs a
tiny end-to-end query plan, and prints a JSON status line. The moral
equivalent of the reference repo's main.cu PASS/FAIL check."""

import json
import sys
import time


def main() -> int:
    import numpy as np

    import jax
    import jax.numpy as jnp

    import cuda.radixsort_tpu as rs

    t0 = time.time()
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**32, size=1 << 20, dtype=np.uint64).astype(
        np.uint32)
    out = np.asarray(rs.sort(jnp.asarray(keys)))
    sort_ok = bool(np.array_equal(out, np.sort(keys)))

    t = rs.table(k=jnp.asarray(keys[: 1 << 16] % np.uint32(100)),
                 v=jnp.asarray((keys[: 1 << 16] % np.uint32(1000))
                               .astype(np.int32)))
    q = (rs.Query(t).where(lambda t: t["v"] > 500)
         .groupby("k", "v", agg="mean").order_by("v", descending=True)
         .limit(3))
    _, cnt, _ = q.run()
    query_ok = bool(int(cnt) == 3)

    print(json.dumps({
        "version": rs.__version__,
        "backend": jax.default_backend(),
        "sort_1M_ok": sort_ok,
        "query_plan_ok": query_ok,
        "seconds": round(time.time() - t0, 1),
    }))
    return 0 if (sort_ok and query_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
