"""Benchmark driver — the reference's ``main.cpp`` as a configurable harness.

Mirrors the reference driver's structure (main.cpp:28-149: init, relation
generation, distribute, barrier, join, measurement aggregation + storage)
for each BASELINE.json config:

  small        1M >< 1M uniform, single-pass partition + probe
  onechip      two-pass radix join sized to one chip (default 64M><64M)
  skew         Zipf(1.05) skewed probe side, skew-aware heavy-hitter path
  distributed  N-device mesh: 4-phase distributed join (virtual CPU mesh on
               a single-chip host; real chips when available)
  pipeline     filter -> join -> aggregate (TPC-H-style shape)

Usage: python -m benchmarks.run --config onechip [--n 26] [--reps 3]
Artifacts: experiment-<nodes>-<id>/<rank>.perf|.info|.json (reference
Measurements::storeAllMeasurements, Measurements.cpp:707-776).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _sync(x):
    # block_until_ready is a no-op on some remote backends; a 1-element
    # device_get is the reliable fence.
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def run_join_config(n: int, reps: int, skew: bool, meas, cfg):
    from radixjoin_tpu import native
    from radixjoin_tpu.data.tuples import Relation
    from radixjoin_tpu.engine.join import join_count, total_matches

    # Diagonal suits near-uniform balanced workloads; Zipf's mid-tail (post
    # heavy-key removal) exceeds any rank band / banded window and would
    # just escalate, so the skew config goes straight to mergecount — the
    # gather-free concat-sort count, exact under arbitrary skew (measured
    # 2.5x over the tiered path at 16.7M: 171 ms vs 426 ms).
    on_tpu = jax.default_backend() == "tpu"
    mode = "mergecount" if skew else ("diagonal" if on_tpu else "partitioned")
    with meas.phase("GENERATE", tuples=2 * n):
        # Host-side native generation (the reference also generates on the
        # host, main.cpp:94-98), then one H2D transfer.
        rk, rr = native.fill_unique(n, 0, seed=1234)
        if skew:
            sk, sr = native.fill_zipf(n, domain=n, theta=1.05, seed=1235)
        else:
            sk, sr = native.fill_unique(n, 0, seed=1235)
        r = Relation(jnp.asarray(rk), jnp.asarray(rr))
        s = Relation(jnp.asarray(sk), jnp.asarray(sr))
        _sync(r.keys); _sync(s.keys)

    with meas.phase("COMPILE"):
        res = join_count(r, s, cfg, skew_aware=skew, mode=mode)
        _sync(res.matches)

    got = total_matches(res)
    if not bool(res.ok):
        from radixjoin_tpu.engine.join import join_count_checked
        got = join_count_checked(r, s, cfg, skew_aware=skew, mode=mode)
    if not skew:
        assert got == n, f"oracle mismatch: {got} != {n}"

    per_pass_bytes = 2 * n * 8  # two SoA u32 arrays read+written
    with meas.phase("JOIN", tuples=2 * n * reps,
                    hbm_bytes=reps * per_pass_bytes * 5):
        for _ in range(reps):
            res = join_count(r, s, cfg, skew_aware=skew, mode=mode)
            _sync(res.matches)
    return got


def run_distributed_config(n_per_shard: int, n_devices: int, reps: int,
                           meas, cfg):
    from jax.sharding import Mesh
    from radixjoin_tpu.data import relation as gen
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join, total_distributed_matches)

    devs = jax.devices()
    if len(devs) < n_devices:
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.extend.backend.clear_backends()
        except Exception:
            pass
        devs = jax.devices()
    n_devices = min(n_devices, len(devs))
    mesh = Mesh(np.asarray(devs[:n_devices]), ("nodes",))
    n = n_per_shard * n_devices

    with meas.phase("GENERATE", tuples=2 * n):
        r = gen.fill_unique(n, jax.random.key(0))
        s = gen.fill_unique(n, jax.random.key(1))
        _sync(r.keys)

    run = make_distributed_join(mesh, n_per_shard, n_per_shard, cfg,
                                shuffle_rounds=2)
    with meas.phase("COMPILE"):
        res = run(r, s)
        _sync(res.partial_matches)
    got = total_distributed_matches(res)
    assert got == n, f"distributed oracle mismatch: {got} != {n}"

    shuffle_bytes = 2 * n * 8  # each tuple crosses the interconnect once
    with meas.phase("JOIN", tuples=2 * n * reps,
                    ici_bytes=reps * shuffle_bytes):
        for _ in range(reps):
            res = run(r, s)
            _sync(res.partial_matches)
    return got, n_devices


def run_pipeline_config(n: int, reps: int, meas):
    from radixjoin_tpu import native
    from radixjoin_tpu.data.tuples import Relation
    from radixjoin_tpu.engine.pipeline import filter_join_aggregate

    with meas.phase("GENERATE", tuples=3 * n):
        ok_, or_ = native.fill_unique(n, 0, seed=10)
        lk, lr = native.fill_modulo(2 * n, n, seed=11)
        orders = Relation(jnp.asarray(ok_), jnp.asarray(or_))
        lineitem = Relation(jnp.asarray(lk), jnp.asarray(lr))
        _sync(orders.keys)

    pred = lambda k, rid: k < jnp.uint32(n // 10)   # 10% selectivity filter
    with meas.phase("COMPILE"):
        res = filter_join_aggregate(orders, lineitem, pred, None,
                                    max_out=max(1024, n // 2),
                                    max_groups=max(256, n // 8))
        _sync(res.group_sums)
    with meas.phase("PIPELINE", tuples=3 * n * reps):
        for _ in range(reps):
            res = filter_join_aggregate(orders, lineitem, pred, None,
                                        max_out=max(1024, n // 2),
                                        max_groups=max(256, n // 8))
            _sync(res.group_sums)
    return int(res.join_count)


def run_northstar_config(n: int, reps: int, meas):
    """BASELINE.json north star: 1B x 1B per-chip count join, in HBM.

    Keys-only diagonal path with sorted-run decomposition
    (engine/large.py): device-side dense-unique generation, 4 B/tuple/side
    resident, no host spill.  Runs = 2 per side above 2^29 because XLA's
    flat sort exhausts HBM beyond 2^29 u32 elements (measured).
    """
    from radixjoin_tpu.engine.large import (join_count_keys_runs,
                                            gen_unique_keys_run)
    runs = 2 if n > (1 << 29) else 1
    rsrc = gen_unique_keys_run(n, 2654435761 | 1)
    ssrc = gen_unique_keys_run(n, 0x9E3779B1 ^ 0x40)
    got = None
    with meas.phase("JOIN", tuples=2 * n * reps):
        for _ in range(reps):
            got, ok = join_count_keys_runs(rsrc, ssrc, r_runs=runs,
                                           s_runs=runs, sync=_sync,
                                           n_r_total=n, n_s_total=n)
            assert ok and got == n, f"oracle mismatch: {got} != {n}"
    return got


def run_northstar64_config(n: int, reps: int, meas, runs_shift: int = 28):
    """Wide-key north star: n x n count join with 64-bit keys, in HBM.

    The reference's native key width (data/Tuple.h:15-22) at beyond-
    single-sort scale: (hi, lo) uint32 planes, sorted-run decomposition
    with the two-plane diagonal kernel (engine/large.py
    join64_count_keys_runs).  Runs sized so each per-run TWO-OPERAND sort
    stays inside XLA's HBM scratch wall (half the 32-bit element cap).
    Oracle: both sides enumerate the same dense-unique 64-bit key set =>
    matches == n exactly.
    """
    from radixjoin_tpu.engine.large import (join64_count_keys_runs,
                                            gen_unique_keys64_run)
    runs = max(1, n >> runs_shift)
    rsrc = gen_unique_keys64_run(n, 2654435761 | 1)
    ssrc = gen_unique_keys64_run(n, 0x9E3779B1 ^ 0x40)
    # k_drift=16 (not the 16.7M default 64): gr scales as 512//k and the
    # per-group SMEM prefetch array caps at ~240K groups — at 2^28-element
    # runs only k<=16 (gr=32) fits (K=64 fails Mosaic compile by 1.1 KB),
    # and the well-spread hi plane keeps rank drift well inside +-16.
    # The threshold is the PER-RUN element count, not the run count.
    k = 16 if (n // runs) > (1 << 24) else 64
    got = None
    with meas.phase("JOIN", tuples=2 * n * reps):
        for _ in range(reps):
            got, ok = join64_count_keys_runs(rsrc, ssrc, runs, runs,
                                             n, n, k_drift=k, sync=_sync)
            assert ok and got == n, f"oracle mismatch: {got} != {n}"
    return got


def run_northstar_skew_config(n: int, reps: int, meas):
    """BASELINE.json: 1B x 1B Zipf(1.05) skew-aware single-host, in HBM.

    Pair-decomposed skew-aware mergecount (engine/large.py).  Runs per
    side sized so each pair's concat-sort stays within the 2^29 flat-sort
    limit.  Oracle: R dense-unique over [0, n), S Zipf keys within
    [0, n) => matches == n exactly.
    """
    from radixjoin_tpu.engine.large import (join_count_keys_skew_runs,
                                            gen_unique_keys_run,
                                            gen_zipf_keys_run)
    runs = max(1, n >> 28)
    rsrc = gen_unique_keys_run(n, 2654435761 | 1)
    ssrc = gen_zipf_keys_run(n, domain=n, theta=1.05, seed=1235)
    got = None
    with meas.phase("JOIN", tuples=2 * n * reps):
        for _ in range(reps):
            got, ok = join_count_keys_skew_runs(
                rsrc, ssrc, runs, runs, n, n, sync=_sync)
            assert ok and got == n, f"oracle mismatch: {got} != {n}"
    return got


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="onechip",
                    choices=["small", "onechip", "skew", "distributed",
                             "pipeline", "northstar", "northstar-skew",
                             "northstar64"])
    ap.add_argument("--n", type=int, default=None,
                    help="log2 tuples per relation (per shard for distributed)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--store", action="store_true",
                    help="write experiment-*/ measurement artifacts")
    args = ap.parse_args(argv)

    from radixjoin_tpu import JoinConfig
    from radixjoin_tpu.perf.measurements import Measurements

    on_tpu = jax.default_backend() == "tpu"
    cfg = JoinConfig(use_pallas=on_tpu)
    meas = Measurements()
    meas.meta["CONFIG"] = args.config
    meas.meta["BACKEND"] = jax.default_backend()

    defaults = {"small": 20, "onechip": 26 if on_tpu else 20,
                "skew": 24 if on_tpu else 18,
                "distributed": 11, "pipeline": 20 if on_tpu else 16,
                "northstar": 30 if on_tpu else 16,
                "northstar-skew": 30 if on_tpu else 16,
                "northstar64": 29 if on_tpu else 15}
    logn = args.n if args.n is not None else defaults[args.config]
    n = 1 << logn
    meas.meta["LOG2N"] = logn

    if args.config == "distributed":
        got, ndev = run_distributed_config(n, args.devices, args.reps, meas,
                                           cfg.replace(use_pallas=False
                                                       if not on_tpu else
                                                       cfg.use_pallas))
        meas.n_nodes = ndev
        print(f"matches={got} devices={ndev}", file=sys.stderr)
    elif args.config == "pipeline":
        got = run_pipeline_config(n, args.reps, meas)
        print(f"join_count={got}", file=sys.stderr)
    elif args.config == "northstar":
        got = run_northstar_config(n, args.reps, meas)
        print(f"matches={got}", file=sys.stderr)
    elif args.config == "northstar-skew":
        got = run_northstar_skew_config(n, args.reps, meas)
        print(f"matches={got}", file=sys.stderr)
    elif args.config == "northstar64":
        got = run_northstar64_config(n, args.reps, meas)
        print(f"matches={got}", file=sys.stderr)
    else:
        got = run_join_config(n, args.reps, skew=(args.config == "skew"),
                              meas=meas, cfg=cfg)
        print(f"matches={got}", file=sys.stderr)

    meas.print_summary()
    if args.store:
        d = meas.store()
        print(f"stored measurements in {d}", file=sys.stderr)


if __name__ == "__main__":
    main()
