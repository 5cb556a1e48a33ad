"""Span-geometry sweep for the big-N bitonic configs (round 3).

The NOTES ceiling derivation puts 2^30 keys 16% above the VPU floor with
the slack attributed to span-kernel DMA exposure (c=1 trips cost 13.8
op-units vs 3.3 at c=5). This sweep measures the two big-N contract
configs under the span knobs:

  RS_SPAN_CMAX       max stages fused per HBM round trip
  RS_SPAN_DB_PLANES  plane cap for the double-buffered span body
  RS_SPAN_LOG_BLOCK  sub-block size (smaller -> wider c at equal VMEM)
  RS_LM              log_merge override (this script's own knob)

Env knobs are read at TRACE time, so each config runs in its own process:
  python experiments/sweep_span_geometry.py <config>        # one point
  python experiments/sweep_span_geometry.py --sweep <config> # all points
configs: keys_1b (2^30 u32 keys), pairs_contract (2^28 4-plane u64+pay),
         keys_64m (2^26 — fast smoke).
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POINTS = {
    # (cmax, db_planes, log_block, log_merge or 0=default)
    "keys_1b": [
        (5, 2, 17, 0),   # current default
        (6, 2, 17, 0),
        (7, 2, 16, 0),
        (5, 2, 18, 0),
        (6, 2, 16, 0),
        (5, 2, 17, 22),  # bigger merge block (r2: lm=22 failed to compile;
                         # retry now that span bodies changed)
    ],
    "pairs_contract": [
        # round A (measured): (3,2,17)=1179ms (old default), (4,2,17)=1152,
        # (5,2,17)=1121, (4,4,17)=1081.6 <- DB at 4 planes now compiles,
        # (4,2,16)=1138, lm=20 still fails to compile.
        # round B: push the DB win — smaller sub-blocks admit wider
        # double-buffered spans at the same VMEM (2 x 2^c x blk x 4 planes).
        (5, 4, 16, 0),   # 64 MB scratch
        (3, 4, 17, 0),
        (6, 4, 15, 0),   # 64 MB scratch, 0.125 MB DMAs
        (4, 4, 16, 0),   # 32 MB scratch
    ],
    "keys_64m": [
        (5, 2, 17, 0),
        (6, 2, 17, 0),
    ],
    # 3-plane stable u32 pairs at the r1/r2 gate size (2x lax.sort bar).
    # lm=22 compiles with the round-3 bodies (stale r2 limit) and wins
    # 1-plane at BOTH 2^24 (8.19 ms) and 2^30 (937 ms) — probe lm here.
    "pairs_25": [
        (5, 4, 16, 0),   # baked round-3 defaults (db spans, c=5, lm=20)
        (5, 4, 16, 21),
        (5, 4, 16, 22),
    ],
    # keys at the 2^24 headline size: does lm=23 beat lm=22's 8.19 ms?
    "keys_24": [
        (5, 2, 17, 23),
    ],
    # 2-plane (key, idx) stable argsort class @2^25: lm upside?
    "pairs2_25": [
        (4, 2, 17, 0),   # baked defaults (2-plane: c=4, lb=17, db)
        (4, 2, 17, 21),
        (4, 2, 17, 22),
    ],
}


def run_one(config: str) -> None:
    import jax
    import jax.numpy as jnp
    from cuda.radixsort_tpu.kernels.bitonic import sort_planes_bitonic
    from cuda.radixsort_tpu.utils.profiling import timed_chain

    lm = int(os.environ.get("RS_LM", "0")) or None
    key = jax.random.PRNGKey(0)

    def rot(y):
        return (y >> jnp.uint32(7)) | (y << jnp.uint32(25))

    if config.startswith("keys"):
        n = 1 << {"keys_1b": 30, "keys_64m": 26, "keys_24": 24}[config]
        if n >= (1 << 28):
            # bench.py::gen_chunked — random.bits at 2^30 OOMs via its
            # generation transients; scan 2^27 chunks into one buffer
            chunk = 1 << 27

            @jax.jit
            def fill(buf):
                def body(i, b):
                    piece = jax.random.fold_in(key, i)
                    bits = jax.random.bits(piece, (chunk,), jnp.uint32)
                    return jax.lax.dynamic_update_slice(b, bits, (i * chunk,))
                return jax.lax.fori_loop(0, n // chunk, body, buf)

            x = fill(jnp.zeros((n,), jnp.uint32))
        else:
            x = jax.random.bits(key, (n,), jnp.uint32)

        def step(v):
            return rot(sort_planes_bitonic([v], n_cmp=1, log_merge=lm)[0])

        t = timed_chain(step, x, k=1 if n >= (1 << 30) else 2)
    elif config == "pairs_25":
        n = 1 << 25
        x = jax.random.bits(key, (n,), jnp.uint32)

        def step(v):
            idx = jnp.arange(n, dtype=jnp.uint32)
            pay = v ^ jnp.uint32(0x9E3779B9)
            a, b, c = sort_planes_bitonic([v, idx, pay], n_cmp=2,
                                          log_merge=lm)
            return rot(a ^ c)

        t = timed_chain(step, x, k=2)
    elif config == "pairs2_25":
        n = 1 << 25
        x = jax.random.bits(key, (n,), jnp.uint32)

        def step(v):
            idx = jnp.arange(n, dtype=jnp.uint32)
            a, b = sort_planes_bitonic([v, idx], n_cmp=2, log_merge=lm)
            return rot(a ^ b)

        t = timed_chain(step, x, k=2)
    else:
        n = 1 << 28
        x = jax.random.bits(key, (n,), jnp.uint32)

        def step(v):
            lo = v * jnp.uint32(2654435761)
            idx = jnp.arange(v.shape[0], dtype=jnp.uint32)
            pay = v ^ jnp.uint32(0x9E3779B9)
            a, b, c, d = sort_planes_bitonic([v, lo, idx, pay], n_cmp=3,
                                             log_merge=lm)
            return rot(a ^ d)

        t = timed_chain(step, x, k=1)
    print(json.dumps({
        "config": config, "n": n, "ms": round(t * 1e3, 2),
        "g_per_s": round(n / t / 1e9, 3),
        "cmax": os.environ.get("RS_SPAN_CMAX", "default"),
        "db_planes": os.environ.get("RS_SPAN_DB_PLANES", "2"),
        "log_block": os.environ.get("RS_SPAN_LOG_BLOCK", "17"),
        "lm": os.environ.get("RS_LM", "default"),
    }), flush=True)


def sweep(config: str) -> None:
    for cmax, dbp, lb, lm in POINTS[config]:
        env = dict(os.environ,
                   RS_SPAN_CMAX=str(cmax), RS_SPAN_DB_PLANES=str(dbp),
                   RS_SPAN_LOG_BLOCK=str(lb), RS_LM=str(lm))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), config],
            env=env, capture_output=True, text=True, timeout=3600)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if r.returncode != 0:
            tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
            print(json.dumps({"config": config, "cmax": cmax,
                              "db_planes": dbp, "log_block": lb, "lm": lm,
                              "error": " | ".join(tail)[:300]}), flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "--sweep":
        sweep(sys.argv[2])
    else:
        run_one(sys.argv[1])
