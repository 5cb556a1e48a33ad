"""Adaptive span-plan sweep (round 4, VERDICT r3 #2/#3).

Round-3 measured per-span cost nearly CONSTANT in span width c (c=1 trips
13.8 op-units vs c=5 16.5 total) — each span is one N-read + N-write HBM
round trip, so span COUNT is the traffic knob and narrow spans are
issue-latency-bound at 0.5 MB sub-blocks. The round-4 planner
(kernels/bitonic.py::_plan_spans, RS_SPAN_PLAN=adaptive) therefore
(a) widens c until the 2-slot scratch budget is hit at >=0.25 MB blocks
    (1 plane -> c<=7: 2^30 lm=22 drops 11 spans -> 9), and
(b) gives narrow remainder spans the biggest sub-block that fits (<=8 MB)
    so their DMA count collapses.

Points run in subprocesses (env is read at trace time; a same-process env
flip would hit the stale jit cache).

  python experiments/sweep_span_plan.py --sweep keys_268m
  python experiments/sweep_span_plan.py --sweep pairs_contract
configs: keys_268m (2^28 u32), keys_1b (2^30), keys_24 (regression),
         pairs_contract (2^28 4-plane u64+payload), pairs_25 (3-plane).
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POINTS = {
    # (RS_SPAN_PLAN, extra env)
    "keys_268m": [("fixed", {}), ("adaptive", {})],
    "keys_1b": [("adaptive", {})],          # fixed = 937 ms (NOTES r3)
    "keys_24": [("fixed", {}), ("adaptive", {})],
    "pairs_contract": [("adaptive", {})],   # fixed = 1067 ms (NOTES r3)
    "pairs_25": [("fixed", {}), ("adaptive", {})],
}


def run_one(config: str) -> None:
    import jax
    import jax.numpy as jnp

    from cuda.radixsort_tpu.kernels.bitonic import (_plan_spans,
                                                    resolve_log_merge,
                                                    sort_planes_bitonic)
    from cuda.radixsort_tpu.utils.profiling import timed_chain

    key = jax.random.PRNGKey(0)

    def rot(y):
        return (y >> jnp.uint32(7)) | (y << jnp.uint32(25))

    if config.startswith("keys"):
        logn = {"keys_1b": 30, "keys_268m": 28, "keys_24": 24}[config]
        n = 1 << logn
        n_planes = 1
        if n >= (1 << 28):
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
            return rot(sort_planes_bitonic([v], n_cmp=1)[0])

        t = timed_chain(step, x, k=1 if n >= (1 << 30) else 2)
    elif config == "pairs_25":
        logn, n_planes = 25, 3
        n = 1 << logn
        x = jax.random.bits(key, (n,), jnp.uint32)

        def step(v):
            idx = jnp.arange(n, dtype=jnp.uint32)
            pay = v ^ jnp.uint32(0x9E3779B9)
            a, b, c = sort_planes_bitonic([v, idx, pay], n_cmp=2)
            return rot(a ^ c)

        t = timed_chain(step, x, k=2)
    else:  # pairs_contract
        logn, n_planes = 28, 4
        n = 1 << logn
        x = jax.random.bits(key, (n,), jnp.uint32)

        def step(v):
            lo = v * jnp.uint32(2654435761)
            idx = jnp.arange(v.shape[0], dtype=jnp.uint32)
            pay = v ^ jnp.uint32(0x9E3779B9)
            a, b, c, d = sort_planes_bitonic([v, lo, idx, pay], n_cmp=3)
            return rot(a ^ d)

        t = timed_chain(step, x, k=1)

    lm = resolve_log_merge(logn, n_planes)
    nspans = sum(len(_plan_spans(k, lm, n_planes))
                 for k in range(17, logn + 1))
    print(json.dumps({
        "config": config, "n": n, "ms": round(t * 1e3, 2),
        "g_per_s": round(n / t / 1e9, 3),
        "plan": os.environ.get("RS_SPAN_PLAN", "adaptive"),
        "spans": nspans,
    }), flush=True)


def sweep(config: str) -> None:
    for plan, extra in POINTS[config]:
        env = dict(os.environ, RS_SPAN_PLAN=plan, **extra)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), config],
            env=env, capture_output=True, text=True, timeout=5400)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if r.returncode != 0:
            tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
            print(json.dumps({"config": config, "plan": plan,
                              "error": " | ".join(tail)[:300]}), flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "--sweep":
        sweep(sys.argv[2])
    else:
        run_one(sys.argv[1])
