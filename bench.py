#!/usr/bin/env python
"""Headline benchmark: single-chip partitioned hash join throughput.

Workload: the reference's self-validating join (dense unique keys both sides,
reference main.cpp:70-98) scaled to the chip: 1B x 1B count join IN HBM.
Metric: joined tuples/s (2N tuples processed end-to-end), as M-tuples/s.

vs_baseline: fraction of the defended per-chip target (BASELINE.md §"Per-chip
target, revised"): 70% of the COMPARISON-SORT floor measured on this same
chip in this same run.  The engine orders both relations with XLA's sort
(every cheaper partitioner was priced or measured out — docs/ROADMAP.md §1b:
crossbar digit sort 0.313 ns/elem/bit, batched-sort cascades lose, TPU has
no efficient large-N scatter), so the lowest reachable end-to-end time for a
2N-tuple count join is 2N * t_sort_per_elem; target = 70% of that
throughput.  The old 40 B/tuple HBM roofline (a radix engine's bound, not a
comparison sort's) is still reported as `sol_hbm_mtps` for transparency.

Prints exactly ONE JSON line on stdout (with a per-phase breakdown, cf.
reference MEASUREMENT_DETAILS tiers, performance/Measurements.cpp:247-541);
diagnostics go to stderr.
"""

import json
import os
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


def measure_sort_floor_ns(n: int = 1 << 28, reps: int = 3) -> float:
    """ns/element of XLA's unstable u32 sort on THIS chip — the engine's
    measured algorithmic floor (docs/ROADMAP.md §1b).  MEDIAN of ``reps``
    timed sorts: the relay adds tens of ms of RPC jitter per synced call,
    so a single timing is not a defensible baseline denominator."""
    from radixjoin_tpu.engine.large import gen_unique_keys_run
    keys = gen_unique_keys_run(n, 2654435761 | 1)(0, 1)
    srt = jax.jit(lambda k: jax.lax.sort(k, is_stable=False))
    sync(srt(keys))                      # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(srt(keys))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / n * 1e9


def bench_join_northstar_fused(n: int, reps: int, meas, k_drift: int,
                               run_shift: int):
    """North star via the FUSED ranged-runs path (round 4): the whole 1B
    join is ONE XLA executable — a fori_loop over value-range-partitioned
    run pairs, each iteration generating + sorting + diagonal-probing one
    pair (engine/large.join_count_keys_ranged_fused).  Two measured facts
    make this the fastest formulation (benchmarks/tpu_sort_scaling.py):
    XLA's sort costs ~0.8 ns/elem effective at 2^20-2^22 operands inside
    a fused step vs 1.85 ns/elem at 2^28 (comparison-sort pass count
    grows with log n and small working sets stay cache-resident), and a
    single executable pays ONE relay round-trip instead of one per pair.
    Self-validating: matches == n; range + coverage checks on device."""
    from radixjoin_tpu.engine.large import join_count_keys_ranged_fused
    runs = n >> run_shift
    r_mult, s_mult = 2654435761 | 1, 0x9E3779B1 ^ 0x40
    # gr=64 measured ~1.5% over 32 at the 2^17 knee (round-4 tuning,
    # BENCH_NOTES); 96 regresses.
    gr = int(os.environ.get("BENCH_ROWS_PER_GROUP", "64"))
    # rep 0 = compile warmup, untimed
    m, ok = join_count_keys_ranged_fused(n, runs, r_mult, s_mult,
                                         k_drift=k_drift,
                                         rows_per_group=gr)
    if not ok and k_drift < 32:
        log(f"fused k_drift={k_drift} check tripped; escalating "
            f"to {k_drift * 2}")
        return bench_join_northstar_fused(n, reps, meas, k_drift * 2,
                                          run_shift)
    assert ok and m == n, f"oracle mismatch: {m} != {n} (ok={ok})"
    total = 0.0
    for _ in range(reps):
        with meas.phase("JOIN_FUSED", tuples=2 * n):
            t0 = time.perf_counter()
            m, ok = join_count_keys_ranged_fused(n, runs, r_mult, s_mult,
                                                 k_drift=k_drift,
                                                 rows_per_group=gr)
            total += time.perf_counter() - t0
        assert ok and m == n, f"oracle mismatch: {m} != {n} (ok={ok})"
    return total / reps


def bench_join_northstar(n: int, reps: int, meas, k_drift: int,
                         blocked: bool | None = None):
    """BASELINE.json north star: 1B x 1B per-chip count join, in HBM.

    Keys-only diagonal path with sorted-run decomposition
    (engine/large.py): XLA's flat sort exhausts HBM above 2^29 u32
    elements, so each side is split into 2 sorted runs.  Runs are
    VALUE-RANGE-partitioned at generation (the single-chip mirror of
    data arriving through the reference's network-partitioning phase,
    tasks/NetworkPartitioning.cpp — local processing there always sees
    partition-contiguous tuples), so only the ``runs`` diagonal run
    pairs can hold matches instead of runs^2 — the engine VERIFIES the
    range claim on-device after each sort and falls back to all-pairs
    if violated.  Self-validating: matches == n (dense unique keys both
    sides, reference main.cpp:70-98).  Generation (a device-side
    bijection, ~1% of e2e) is part of the timed region.
    """
    from radixjoin_tpu.engine.large import (gen_unique_keys_ranged_run,
                                            join_count_keys_runs)
    # 2^28 runs: XLA's sort is measurably cheaper per element there than
    # at its 2^29 HBM-scratch limit (1.851 vs 2.006 ns/elem, tuning matrix
    # in BENCH_NOTES.md), and ranged probing makes run count free on the
    # probe side (always `runs` diagonal pairs of n/runs rows).
    runs = max(1, n >> 28)
    rsrc = gen_unique_keys_ranged_run(n, 2654435761 | 1)
    ssrc = gen_unique_keys_ranged_run(n, 0x9E3779B1 ^ 0x40)
    # Sublane-blocked probe kernel (measured faster on-chip; see
    # BENCH_NOTES.md round 3): the +-K shift loop batched over (8, 128)
    # row blocks.  BENCH_BLOCKED_PROBE=0 falls back to the v2 kernel.
    if blocked is None:
        blocked = os.environ.get("BENCH_BLOCKED_PROBE", "1") == "1"
    total = 0.0
    for rep in range(reps + 1):          # rep 0 = compile warmup, untimed
        t0 = time.perf_counter()
        m, ok = join_count_keys_runs(rsrc, ssrc, r_runs=runs, s_runs=runs,
                                     sync=sync, n_r_total=n, n_s_total=n,
                                     k_drift=k_drift, ranged_domain=n,
                                     meas=meas if rep else None,
                                     blocked=blocked)
        if not ok and k_drift < 32:
            # diagonal drift/coverage tripped at this K: escalate once
            # (the engine ladder's bench-side mirror) and restart timing
            log(f"k_drift={k_drift} coverage tripped; escalating to "
                f"{k_drift * 2}")
            return bench_join_northstar(n, reps, meas, k_drift * 2, blocked)
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
    from radixjoin_tpu.perf.measurements import Measurements

    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")
    reps = int(os.environ.get("BENCH_REPS", "2"))
    # K=8 beat 4 and 16 in the on-chip tuning matrix (BENCH_NOTES.md);
    # a tripped coverage check escalates K automatically.
    k_drift = int(os.environ.get("BENCH_K_DRIFT", "8"))

    if backend == "tpu":
        n = 1 << 30          # 1B tuples per side: the BASELINE north star
        measured = measure_hbm_gbps()
        # The relay's RPC overhead makes small copy measurements noisy
        # (observed 73-299 GB/s for the same chip); pin the HBM roofline to
        # the v5e nominal bandwidth for the secondary sol_hbm metric.
        hbm = 819.0
        sort_ns = measure_sort_floor_ns()
        log(f"measured copy bw {measured:.0f} GB/s (diagnostic only); "
            f"sort floor {sort_ns:.2f} ns/elem")
    else:
        n = 1 << 20          # CPU smoke
        hbm = 50.0
        sort_ns = measure_sort_floor_ns(1 << 22)
    log(f"n={n} hbm={hbm:.0f} GB/s reps={reps} k_drift={k_drift}")

    meas = Measurements()
    try:
        if backend == "tpu":
            # North-star scale via the FUSED ranged-runs path; falls back
            # to the round-3 per-pair dispatch path, then to the 134M
            # general-engine join, if anything fails to compile/run.
            # 2^17-element runs sit at the measured knee (sweep in
            # BENCH_NOTES round 4: 2^20 914 -> 2^17 980 -> 2^15 948 Mt/s).
            run_shift = int(os.environ.get("BENCH_RUN_SHIFT", "17"))
            try:
                dt = bench_join_northstar_fused(n, reps, meas, k_drift,
                                                run_shift)
            except Exception as e:
                log(f"northstar (fused) failed "
                    f"({type(e).__name__}: {e}); retrying per-pair path")
                meas.phases.clear()
                try:
                    dt = bench_join_northstar(n, reps, meas, k_drift)
                except Exception as e2:
                    # A blocked-kernel failure must not cost the
                    # north-star scale: retry with the proven v2 kernel.
                    log(f"northstar (blocked probe) failed "
                        f"({type(e2).__name__}: {e2}); "
                        f"retrying blocked=False")
                    meas.phases.clear()
                    dt = bench_join_northstar(n, reps, meas, k_drift,
                                              blocked=False)
        else:
            dt = bench_join(n)
    except Exception as e:  # OOM etc: scale down to the 134M engine path
        n = 1 << 27 if backend == "tpu" else n >> 1
        log(f"northstar bench failed ({type(e).__name__}: {e}); "
            f"falling back to bench_join n={n}")
        dt = bench_join(n)

    mtps = 2 * n / dt / 1e6

    # Primary target: 70% of the measured comparison-sort floor — the
    # defended per-chip SoL for a sort-based join engine (BASELINE.md).
    # 2N tuples must pass one sort each => floor throughput = 1/sort_ns.
    sol_sort_mtps = 1e3 / sort_ns
    target = 0.70 * sol_sort_mtps
    # Secondary (reported, not the target): HBM roofline of a hypothetical
    # 2-pass radix engine, 40 B/tuple — unreachable for a comparison sort.
    sol_hbm_mtps = hbm * 1e9 / 40.0 / 1e6

    # per-rep ms per phase (phases accumulated over `reps` timed reps)
    phases = {name: round(st.seconds * 1e3 / reps, 1)
              for name, st in meas.phases.items()}
    # Per-phase SoL fractions (reference MEASUREMENT_DETAILS tier,
    # performance/Measurements.cpp:247-541): sort phases against the
    # measured comparison-sort floor (each tuple passes exactly one
    # sort), probe phases against the HBM roofline (>= one 4 B key read
    # per tuple).  Note the deferred-pull attribution: probe execution
    # partly bills into the next pair's GEN_SORT fence (BENCH_NOTES.md),
    # so sort-phase fractions are conservative lower bounds.
    phase_sol = {}
    for name, st in meas.phases.items():
        if st.seconds <= 0 or not st.tuples:
            continue
        if name.startswith("GEN_SORT"):
            bound = st.tuples * sort_ns / 1e9
        elif name.startswith("PROBE"):
            bound = st.tuples * 4 / (hbm * 1e9)
        else:
            continue
        frac = bound / st.seconds
        # Deferred-pull attribution makes some phases dispatch-only (e.g.
        # PROBE at <1 ms while its execution bills into the next fence);
        # a fraction > 1 is physically impossible, so drop it rather than
        # report a nonsense number.
        if frac <= 1.0:
            phase_sol[name] = round(frac, 3)

    log(f"join: {dt*1e3:.1f} ms  {mtps:.1f} Mt/s  "
        f"sort-floor SoL={sol_sort_mtps:.0f} Mt/s target={target:.0f} Mt/s "
        f"(hbm roofline {sol_hbm_mtps:.0f} Mt/s)  phases={phases}")

    print(json.dumps({
        "metric": "join_throughput_1chip",
        "value": round(mtps, 2),
        "unit": "Mtuples/s",
        "vs_baseline": round(mtps / target, 4),
        # vs_baseline changed meaning in round 2 (sort-floor SoL target,
        # generation inside the timed region) — the model tag keeps
        # round-over-round JSONs from being silently compared across
        # incompatible denominators.
        "baseline_model": "sort-floor-v2",
        "sort_floor_ns_per_elem": round(sort_ns, 3),
        "sol_sort_mtps": round(sol_sort_mtps, 1),
        "sol_hbm_mtps": round(sol_hbm_mtps, 1),
        "phase_ms_per_rep": phases,
        "phase_sol_fraction": phase_sol,
    }))


if __name__ == "__main__":
    main()
