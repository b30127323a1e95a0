#!/usr/bin/env python
"""Headline benchmark: single-chip partitioned hash join throughput.

Workload: the reference's self-validating join (dense unique keys both sides,
reference main.cpp:70-98) scaled to the chip.  Metric: joined tuples/s
(2N tuples processed end-to-end: histogram + partition + build/probe), as
M-tuples/s.  vs_baseline: fraction of the BASELINE.json target, which is 70%
of the HBM-bound two-pass-partition speed-of-light for the measured chip
(BASELINE.md: ">70% of HBM-bound partition speed-of-light per chip").

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_hbm_gbps(n_bytes: int = 1 << 30) -> float:
    """Copy bandwidth (read+write) of one device."""
    n = n_bytes // 4
    x = jnp.zeros((n,), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    reps = 5
    y = x
    for _ in range(reps):
        y = f(y)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / reps
    return 2 * n_bytes / dt / 1e9


def bench_join(n: int, reps: int = 3):
    from radixjoin_tpu import JoinConfig
    from radixjoin_tpu.data import relation as gen
    from radixjoin_tpu.engine.join import join_count, total_matches

    cfg = JoinConfig(use_pallas=jax.default_backend() == "tpu")
    r = gen.fill_unique(n, jax.random.key(0))
    s = gen.fill_unique(n, jax.random.key(1))
    jax.block_until_ready((r.keys, s.keys))

    res = join_count(r, s, cfg)  # compile + warm
    jax.block_until_ready(res.matches)
    assert total_matches(res) == n, "oracle mismatch"
    assert bool(res.ok)

    t0 = time.perf_counter()
    for _ in range(reps):
        res = join_count(r, s, cfg)
        jax.block_until_ready(res.matches)
    dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    if backend == "tpu":
        n = 1 << 26          # 67M tuples per side
        hbm = measure_hbm_gbps()
    else:
        n = 1 << 20          # CPU smoke
        hbm = 50.0
    log(f"n={n} hbm={hbm:.0f} GB/s")

    try:
        dt = bench_join(n)
    except Exception as e:  # OOM etc: scale down once
        log(f"bench at n={n} failed ({e}); retrying n={n >> 2}")
        n >>= 2
        dt = bench_join(n)

    mtps = 2 * n / dt / 1e6
    # HBM-bound speed of light for a two-pass partition + probe engine:
    # per tuple per relation: 2 passes * (8B read + 8B write) + 8B probe read
    # = 40 bytes  ->  joined-tuples/s SoL = BW / 40 * 2 relations / 2.
    sol_mtps = hbm * 1e9 / 40.0 / 1e6
    target = 0.70 * sol_mtps
    log(f"join: {dt*1e3:.1f} ms  {mtps:.1f} Mt/s  "
        f"SoL={sol_mtps:.0f} Mt/s target={target:.0f} Mt/s")

    print(json.dumps({
        "metric": "join_throughput_1chip",
        "value": round(mtps, 2),
        "unit": "Mtuples/s",
        "vs_baseline": round(mtps / target, 4),
    }))


if __name__ == "__main__":
    main()
