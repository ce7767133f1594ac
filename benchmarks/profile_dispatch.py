"""Measure the axon dev-tunnel's per-dispatch overhead and whether async
dispatch pipelines across calls. Informs how to read every other benchmark:
if each jitted call costs ~10 ms of RTT regardless of device work, measured
QPS at small device times is tunnel-bound, not TPU-bound.

Two probes:
  - independent: N calls on the same input, sync once at the end. If
    dispatch pipelines, per-call cost approaches device time.
  - chained: N calls each consuming the previous output (true serial
    dependency) — the per-call floor including any enqueue latency.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def run(reps_list=(1, 4, 16, 64)):
    q = jax.random.normal(jax.random.PRNGKey(0), (1024, 1024), jnp.float32)
    jax.block_until_ready(q)

    if "--ballast" in sys.argv:
        # reproduce the benchmark environment: several GB resident in HBM
        ballast = [
            jax.random.normal(jax.random.PRNGKey(i), (1 << 20, 1024),
                              jnp.float32)
            for i in range(1, 2)
        ]
        ballast.append(jnp.zeros((1 << 20, 1024), jnp.int8))
        jax.block_until_ready(ballast)
        print("ballast: ~5 GB resident", flush=True)

    tiny = jax.jit(lambda x: x[:8, :8] * 1.0001)
    jax.block_until_ready(tiny(q))

    for reps in reps_list:
        t0 = time.perf_counter()
        outs = [tiny(q) for _ in range(reps)]
        jax.block_until_ready(outs[-1])
        dt = (time.perf_counter() - t0) / reps
        print(f"independent x{reps}: {dt*1e3:.2f} ms/call", flush=True)

    small = jax.jit(lambda x: x * 1.0001)
    y = small(q)
    jax.block_until_ready(y)
    for reps in reps_list:
        y = q
        t0 = time.perf_counter()
        for _ in range(reps):
            y = small(y)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / reps
        print(f"chained     x{reps}: {dt*1e3:.2f} ms/call", flush=True)


if __name__ == "__main__":
    run()
