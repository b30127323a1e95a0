#!/usr/bin/env python
"""Headline benchmark: single-chip partitioned hash join throughput.

Workload: the reference's self-validating join (dense unique keys both sides,
reference main.cpp:70-98) scaled to the chip.  Metric: joined tuples/s
(2N tuples processed end-to-end: partition + banded probe), as M-tuples/s.
vs_baseline: fraction of the BASELINE.json target, which is 70% of the
HBM-bound two-pass-partition speed-of-light for the measured chip
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


def sync(x):
    # block_until_ready is a no-op on relayed backends; a 1-element
    # device_get is the reliable fence.
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def measure_hbm_gbps(n_bytes: int = 1 << 28) -> float:
    """Copy bandwidth (read+write) of one device."""
    n = n_bytes // 4
    x = jnp.zeros((n,), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    sync(f(x))
    reps = 4
    t0 = time.perf_counter()
    y = x
    for _ in range(reps):
        y = f(y)
    sync(y)
    dt = time.perf_counter() - t0
    return 2 * n_bytes * reps / dt / 1e9


def bench_join_northstar(n: int, reps: int = 2):
    """BASELINE.json north star: 1B x 1B per-chip count join, in HBM.

    Keys-only diagonal path with sorted-run decomposition
    (engine/large.py): XLA's flat sort exhausts HBM above 2^29 u32
    elements, so each side is split into 2 sorted runs and the 4 run
    pairs are probed.  Self-validating: matches == n (dense unique keys
    both sides, reference main.cpp:70-98).  Generation (device-side
    bijection) is excluded from the timed region, matching bench_join.
    """
    from radixjoin_tpu.engine.large import (gen_unique_keys_run,
                                            join_count_keys_runs)
    runs = 2 if n > (1 << 29) else 1
    rsrc = gen_unique_keys_run(n, 2654435761 | 1)
    ssrc = gen_unique_keys_run(n, 0x9E3779B1 ^ 0x40)
    total = 0.0
    for rep in range(reps + 1):          # rep 0 = compile warmup, untimed
        t0 = time.perf_counter()
        m, ok = join_count_keys_runs(rsrc, ssrc, r_runs=runs, s_runs=runs,
                                     sync=sync, n_r_total=n, n_s_total=n)
        if rep:
            total += time.perf_counter() - t0
        assert ok and m == n, f"oracle mismatch: {m} != {n} (ok={ok})"
    return total / reps


def bench_join(n: int, reps: int = 3):
    from radixjoin_tpu import JoinConfig
    from radixjoin_tpu.data import relation as gen
    from radixjoin_tpu.engine.join import join_count, total_matches

    on_tpu = jax.default_backend() == "tpu"
    cfg = JoinConfig(use_pallas=on_tpu)
    mode = "diagonal" if on_tpu else "partitioned"
    r = gen.fill_unique(n, jax.random.key(0))
    s = gen.fill_unique(n, jax.random.key(1))
    sync(r.keys)
    sync(s.keys)

    res = join_count(r, s, cfg, mode=mode)  # compile + warm
    sync(res.matches)
    assert total_matches(res) == n, "oracle mismatch"
    assert bool(res.ok)

    t0 = time.perf_counter()
    for _ in range(reps):
        res = join_count(r, s, cfg, mode=mode)
        sync(res.matches)
    return (time.perf_counter() - t0) / reps


def main():
    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    if backend == "tpu":
        n = 1 << 30          # 1B tuples per side: the BASELINE north star
        measured = measure_hbm_gbps()
        # The relay's RPC overhead makes small copy measurements noisy
        # (observed 73-299 GB/s for the same chip); pin the roofline to the
        # v5e nominal HBM bandwidth so vs_baseline is stable and honest.
        hbm = 819.0
        log(f"measured copy bw {measured:.0f} GB/s (diagnostic only)")
    else:
        n = 1 << 20          # CPU smoke
        hbm = 50.0
    log(f"n={n} hbm={hbm:.0f} GB/s")

    try:
        if backend == "tpu":
            # North-star scale via the in-HBM keys-only runs path
            # (engine/large.py); falls back to the 134M general-engine
            # join below if the big run cannot complete.
            dt = bench_join_northstar(n)
        else:
            dt = bench_join(n)
    except Exception as e:  # OOM etc: scale down to the 134M engine path
        n = 1 << 27 if backend == "tpu" else n >> 1
        log(f"northstar bench failed ({type(e).__name__}); "
            f"falling back to bench_join n={n}")
        dt = bench_join(n)

    mtps = 2 * n / dt / 1e6
    # HBM-bound speed of light for a two-pass partition + probe engine:
    # per tuple per relation: 2 passes * (8B read + 8B write) + 8B probe read
    # = 40 bytes  ->  joined-tuples/s SoL = 2N / (2N * 40B / BW) = BW / 40.
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
