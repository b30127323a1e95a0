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


def run_distributed_1dev_config(n: int, reps: int, meas, cfg,
                                mat_logn: int | None = None):
    """Distributed engine AT SCALE on the real chip (VERDICT r3 item 3):
    the full 4-phase SPMD join — metadata collectives, all_to_all shuffle,
    local diagonal probe — on a 1-device TPU mesh at ``n`` tuples/side
    (reference workload is 20M/node, main.cpp:70-71; default here is
    128M/side, 6.4x that).  A 1-device mesh makes every collective a
    self-copy but compiles and executes the identical program the
    multi-chip mesh runs, so shuffle/metadata/local-probe code paths are
    exercised at real size on real hardware.

    Also runs the MATERIALISING variant (row triples, reference `probe`
    kernels.cu:199-246) at ``mat_logn`` (default n/4 — round 5 lifted
    the post-crash guard after the gather-free join_materialize rewrite;
    see benchmarks/tpu_mat25_check.py).
    """
    from jax.sharding import Mesh
    from radixjoin_tpu.data import relation as gen
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join, total_distributed_matches)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("nodes",))

    with meas.phase("GENERATE", tuples=2 * n):
        r = gen.fill_unique(n, jax.random.key(0))
        s = gen.fill_unique(n, jax.random.key(1))
        _sync(r.keys); _sync(s.keys)

    run = make_distributed_join(mesh, n, n, cfg, local_probe="diagonal")
    with meas.phase("COMPILE"):
        res = run(r, s)
        _sync(res.partial_matches)
    got = total_distributed_matches(res)
    assert np.asarray(res.ok).all(), "overflow/drift at scale"
    assert got == n, f"distributed-1dev oracle mismatch: {got} != {n}"

    with meas.phase("JOIN", tuples=2 * n * reps):
        for _ in range(reps):
            res = run(r, s)
            _sync(res.partial_matches)

    # DENSE materialising rung at FULL size (round 4): sort + windowed
    # emit per shard — no max_out bound, no gather assembly.
    totd = -1
    try:
        rund = make_distributed_join(mesh, n, n, cfg,
                                     materialize_dense=True)
        with meas.phase("COMPILE_MAT_DENSE"):
            rows = rund(r, s)
            _sync(rows.counts)
        assert np.asarray(rows.ok).all()
        totd = int(np.sum(np.asarray(rows.counts, dtype=np.int64)))
        assert totd == n, f"dense materialising rows {totd} != {n}"
        with meas.phase("JOIN_MAT_DENSE", tuples=2 * n * reps):
            for _ in range(reps):
                rows = rund(r, s)
                _sync(rows.counts)
        del rows, rund
    except Exception as e:
        print(f"dense materialising variant failed: "
              f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)

    # max_out row-triple variant at reduced size (static max_out
    # rows/device).  Round 5 lifted the 2^22 guard: the round-4 2^25
    # relay crash did not reproduce after join_materialize's three
    # searchsorted storms became sort + cummax forward-fills (the probe
    # benchmarks/tpu_mat25_check.py runs 2^25 and 2^26 clean:
    # logs/r5_mat25.log, 33.5M/67M rows exact) — default now n/4.
    nm = 1 << (mat_logn if mat_logn is not None
               else max(10, n.bit_length() - 3))
    totm = -1
    try:
        rm = gen.fill_unique(nm, jax.random.key(2))
        sm = gen.fill_unique(nm, jax.random.key(3))
        _sync(rm.keys)
        runm = make_distributed_join(mesh, nm, nm, cfg,
                                     materialize_max_out=nm + (nm >> 2))
        with meas.phase("COMPILE_MAT"):
            rows = runm(rm, sm)
            _sync(rows.counts)
        assert np.asarray(rows.ok).all()
        totm = int(np.sum(np.asarray(rows.counts, dtype=np.int64)))
        assert totm == nm, f"materialising rows {totm} != {nm}"
        with meas.phase("JOIN_MAT", tuples=2 * nm * reps):
            for _ in range(reps):
                rows = runm(rm, sm)
                _sync(rows.counts)
    except Exception as e:
        print(f"materialising variant (2^{nm.bit_length() - 1}) failed: "
              f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)
    return got, totm


def run_matchrate_config(n: int, reps: int, meas,
                         m_values=(2, 4, 8), dup_extra: int = 0):
    """Match-rate sweep (reference ``probe_match_rate`` protocol,
    kernels.cu:314-411; ``args_t.matchRate`` data.hpp:67-90 with
    MAX_MATCH_RATE=8, data.hpp:28): each fact row matches exactly ``m``
    dim rows, for m in ``m_values``.  Runs the fused ranged pipeline in
    BOTH modes per m: counting (single-plane emit — exact counts at any
    match rate, no multi-round protocol needed) and payload aggregation
    through the M-plane kernel with max_matches=m.  Oracle closed-form:
    join rows == n * m; every group sums to per_key * m."""
    from radixjoin_tpu.engine.pipeline import (
        filter_join_aggregate_ranged_fused)

    runs = max(1, n >> 22)
    nf = n // runs
    span = max(1024, nf // 16)
    domain = span * runs
    odd_d, odd_f = 2654435761 | 1, 0x9E3779B1 ^ 0x40
    per_key = nf // span

    def make_sources(m):
        def r_source(k, n_runs):
            i = jnp.arange(span, dtype=jnp.uint32)
            keys = jnp.uint32(k * span) \
                + ((i * jnp.uint32(odd_d)) & jnp.uint32(span - 1))
            keys = jnp.tile(keys, m)
            return keys, jnp.arange(keys.shape[0], dtype=jnp.uint32)

        def s_source(k, n_runs):
            i = jnp.arange(nf, dtype=jnp.uint32)
            keys = jnp.uint32(k * span) \
                + ((i * jnp.uint32(odd_f)) & jnp.uint32(span - 1))
            return keys, i
        return r_source, s_source

    value_of = lambda rr, sr: ((rr % 7) + (sr % 5)).astype(jnp.int32)
    for m in m_values:
        r_source, s_source = make_sources(m)
        want = n * m

        def one(vo, mm):
            return filter_join_aggregate_ranged_fused(
                r_source, s_source, runs, domain, nf, span * m,
                max_groups=span, value_of=vo, max_matches=mm,
                max_out=(m + 1) * nf)

        with meas.phase(f"COMPILE_M{m}"):
            total, ngroups, ok = one(None, None)
            assert ok and total == want and ngroups == span * runs, \
                (m, total, want, ngroups)
        with meas.phase(f"COUNT_M{m}", tuples=n * reps):
            for _ in range(reps):
                total, ngroups, ok = one(None, None)
                assert ok and total == want
        with meas.phase(f"COMPILE_PAYLOAD_M{m}"):
            total, ngroups, ok = one(value_of, m)
            assert ok and total == want, (m, total, want)
        with meas.phase(f"PAYLOAD_M{m}", tuples=n * reps):
            for _ in range(reps):
                total, ngroups, ok = one(value_of, m)
                assert ok and total == want
        print(f"m={m}: rows={total} groups={ngroups} ok={ok}",
              file=sys.stderr, flush=True)
    return n * m_values[-1]


def run_distributed_ranged_config(n: int, reps: int, meas, cfg,
                                  variants=((64, 128, "diagonal", 1.15),
                                            (64, 256, "mergecount", 1.35))):
    """Fused RANGED distributed join at scale on the real chip (round 5,
    VERDICT r4 item 2): the relabel-spread range partition + chunk-sorted
    send + fori_loop local mergecount, swept over (send_chunks,
    local_ranges) variants.  Oracle: dense unique keys both sides =>
    matches == n.  Phase names carry the variant, e.g. JOIN_C64_B64."""
    from jax.sharding import Mesh
    from radixjoin_tpu.data import relation as gen
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join_ranged, total_distributed_matches_ranged,
        ranged_ok)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("nodes",))
    with meas.phase("GENERATE", tuples=2 * n):
        r = gen.fill_unique(n, jax.random.key(0))
        s = gen.fill_unique(n, jax.random.key(1))
        _sync(r.keys); _sync(s.keys)

    best = None
    for chunks, ranges, probe, slack in variants:
        tag = f"C{chunks}_B{ranges}_{probe[:4]}_s{int(slack*100)}"
        run = make_distributed_join_ranged(mesh, n, n, cfg,
                                           local_ranges=ranges,
                                           send_chunks=chunks,
                                           local_probe=probe,
                                           range_slack=slack)
        with meas.phase(f"COMPILE_{tag}"):
            res = run(r.keys, s.keys)
            _sync(res.merged_lo)
        got = total_distributed_matches_ranged(res)
        assert ranged_ok(res), f"{tag}: capacity/invariant trip"
        assert got == n, f"{tag}: {got} != {n}"
        t0 = time.perf_counter()
        with meas.phase(f"JOIN_{tag}", tuples=2 * n * reps):
            for _ in range(reps):
                res = run(r.keys, s.keys)
                _sync(res.merged_lo)
        dt = (time.perf_counter() - t0) / reps
        mtps = 2 * n / dt / 1e6
        print(f"{tag}: {dt*1e3:.0f} ms/rep  {mtps:.1f} Mt/s",
              file=sys.stderr, flush=True)
        if best is None or dt < best[1]:
            best = (tag, dt)
        del run, res
    print(f"best={best[0]} {2*n/best[1]/1e6:.1f} Mt/s", file=sys.stderr)
    return n


def run_distributed_ranged_rows_config(n: int, reps: int, meas, cfg,
                                       variants=((64, 128, 1.15, 32),)):
    """MATERIALISING fused ranged distributed join on the real chip
    (round 5, the rows form of run_distributed_ranged_config): rid planes
    ride the chunk sorts and the wire; each local sub-range runs the
    emit kernel (diagonal by default — the prep-free rung; see the
    maker's ``emit`` knob) inside the fori_loop executable.  Oracle: dense
    unique keys both sides — every R row matches exactly once, so the
    light counts + heavy 1x1 blocks total n, and the rid checksums equal
    n(n-1)/2 per side (each rid appears exactly once in the output)."""
    from jax.sharding import Mesh
    from radixjoin_tpu.data import relation as gen
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join_ranged_rows, total_distributed_rows_ranged,
        ranged_rows_ok, heavy_row_blocks, _fetch)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("nodes",))
    with meas.phase("GENERATE", tuples=2 * n):
        r = gen.fill_unique(n, jax.random.key(0))
        s = gen.fill_unique(n, jax.random.key(1))
        _sync(r.keys); _sync(s.keys)

    best = None
    for chunks, ranges, slack, rpg in variants:
        tag = f"C{chunks}_B{ranges}_s{int(slack*100)}_g{rpg}"
        run = make_distributed_join_ranged_rows(mesh, n, n, cfg,
                                                local_ranges=ranges,
                                                send_chunks=chunks,
                                                range_slack=slack,
                                                rows_per_group=rpg)
        with meas.phase(f"COMPILE_{tag}"):
            res = run(r, s)
            _sync(res.counts)
        assert ranged_rows_ok(res), f"{tag}: capacity/emit trip"
        got = total_distributed_rows_ranged(res)
        assert got == n, f"{tag}: {got} != {n}"
        # rid checksums: every rid 0..n-1 appears exactly once per side
        cnt = _fetch(res.counts)
        mask = cnt == 1
        sum_r = int(_fetch(res.r_rids)[mask].astype(np.int64).sum())
        sum_s = int(_fetch(res.s_rids)[mask].astype(np.int64).sum())
        for _k, (hr, hs) in heavy_row_blocks(res).items():
            assert len(hr) <= 1 and len(hs) <= 1, "unique keys: 1x1 blocks"
            sum_r += int(hr.astype(np.int64).sum()) * len(hs)
            sum_s += int(hs.astype(np.int64).sum()) * len(hr)
        want_sum = n * (n - 1) // 2
        assert sum_r == want_sum and sum_s == want_sum, (
            f"{tag}: rid checksums {sum_r}/{sum_s} != {want_sum}")
        t0 = time.perf_counter()
        with meas.phase(f"JOIN_MAT_{tag}", tuples=2 * n * reps):
            for _ in range(reps):
                res = run(r, s)
                _sync(res.counts)
        dt = (time.perf_counter() - t0) / reps
        mtps = 2 * n / dt / 1e6
        print(f"{tag}: {dt*1e3:.0f} ms/rep  {mtps:.1f} Mt/s (materialise)",
              file=sys.stderr, flush=True)
        if best is None or dt < best[1]:
            best = (tag, dt)
        del run, res
    print(f"best={best[0]} {2*n/best[1]/1e6:.1f} Mt/s", file=sys.stderr)
    return n


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


def run_pipeline_sf100_config(n: int, reps: int, meas, dup: int = 2):
    """Pipeline at TPC-H SF100-ish scale (VERDICT r1 item 2): ``n`` fact
    rows (default 2^29 ~ SF100 lineitem's 600M) through the ranged-runs
    pipeline — per-run 2-operand sorts stay under the 2^28 sort cap, the
    windowed emit kernel runs at full run size (coarse row-head search in
    _windowed_prep keeps its prep linear), and the ``dup``-duplicated dim
    side forces the M-plane rung with a PAYLOAD aggregation: the M-plane
    kernel's at-scale Mosaic validation, phase-timed.

    Per run: n/runs fact rows vs (n/runs)/16 * dup dim rows; fact keys hit
    every dim key exactly (n/runs)/span times, so totals and per-group
    counting sums are closed-form (asserted on device)."""
    from radixjoin_tpu.engine.pipeline import (
        filter_join_aggregate_ranged_fused)

    # sub-run size 2^22 puts every sort (fact 2-operand + the aggregate's
    # compaction) in the small-operand regime inside the fused loop
    runs = max(1, n >> 22)
    nf = n // runs
    span = max(1024, nf // 16)
    domain = span * runs
    odd_d, odd_f = 2654435761 | 1, 0x9E3779B1 ^ 0x40
    per_key = nf // span

    def r_source(k, n_runs):
        i = jnp.arange(span, dtype=jnp.uint32)
        keys = jnp.uint32(k * span) \
            + ((i * jnp.uint32(odd_d)) & jnp.uint32(span - 1))
        if dup > 1:
            keys = jnp.tile(keys, dup)
        return keys, jnp.arange(keys.shape[0], dtype=jnp.uint32)

    def s_source(k, n_runs):
        i = jnp.arange(nf, dtype=jnp.uint32)
        keys = jnp.uint32(k * span) \
            + ((i * jnp.uint32(odd_f)) & jnp.uint32(span - 1))
        return keys, i

    check = jax.jit(lambda gs, gv: (
        jnp.min(jnp.where(gv, gs, per_key * dup)),
        jnp.max(jnp.where(gv, gs, per_key * dup)),
        jnp.sum(gv.astype(jnp.int32))))

    def consume_counting(k, gk, gs, gvalid):
        lo, hi, ng = (int(x) for x in jax.device_get(
            check(gs, gvalid != 0)))
        assert lo == hi == per_key * dup and ng == span, (k, lo, hi, ng)

    def one(value_of, consume, max_matches=None):
        # round 5: the FUSED ranged pipeline — all runs in one
        # executable, aggregate inside the loop step (VERDICT r4 item 5)
        return filter_join_aggregate_ranged_fused(
            r_source, s_source, runs, domain, nf, span * dup,
            max_groups=span, value_of=value_of, max_matches=max_matches,
            max_out=4 * nf, consume=consume)

    want = n * dup
    with meas.phase("COMPILE"):
        total, ngroups, ok = one(None, consume_counting)
        assert ok and total == want and ngroups == span * runs
    with meas.phase("PIPELINE_COUNT", tuples=n * reps):
        for _ in range(reps):
            total, ngroups, ok = one(None, None)
            assert ok and total == want and ngroups == span * runs

    value_of = lambda rr, sr: ((rr % 7) + (sr % 5)).astype(jnp.int32)
    with meas.phase("COMPILE_MPLANE"):
        total, ngroups, ok = one(value_of, None, max_matches=dup)
        assert ok and total == want and ngroups == span * runs
    with meas.phase("PIPELINE_MPLANE", tuples=n * reps):
        for _ in range(reps):
            total, ngroups, ok = one(value_of, None, max_matches=dup)
            assert ok and total == want and ngroups == span * runs
    return total


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


def run_northstar64_fused_config(n: int, reps: int, meas,
                                 run_shift: int = 17):
    """Fused 64-bit north star (round 4): the wide-key join as one
    executable over 2^run_shift-element ranged run pairs (two-operand lex
    sorts + diagonal64 probes, engine/large.join64_count_keys_ranged_
    fused).  Self-validating duplicate-hi workload: matches == n."""
    from radixjoin_tpu.engine.large import join64_count_keys_ranged_fused
    runs = n >> run_shift
    got = None
    k = 16
    with meas.phase("COMPILE"):
        got, ok = join64_count_keys_ranged_fused(
            n, runs, 2654435761 | 1, 0x9E3779B1 ^ 0x40, k_drift=k)
        if not ok and k < 64:
            k *= 2
            got, ok = join64_count_keys_ranged_fused(
                n, runs, 2654435761 | 1, 0x9E3779B1 ^ 0x40, k_drift=k)
        assert ok and got == n, f"oracle mismatch: {got} != {n}"
    with meas.phase("JOIN", tuples=2 * n * reps):
        for _ in range(reps):
            got, ok = join64_count_keys_ranged_fused(
                n, runs, 2654435761 | 1, 0x9E3779B1 ^ 0x40, k_drift=k)
            assert ok and got == n, f"oracle mismatch: {got} != {n}"
    return got


def run_northstar_steady_fused_config(n: int, reps: int, meas,
                                      run_shift: int = 17):
    """Fused steady state (round 4): build side prepared ONCE as a
    stacked [runs, nr_pad] array of sorted+prepadded ranged runs
    (engine/large.prepare_ranged_fused, ~4.3 GB resident at 1B/2^17),
    then each rep pays only the probe side's fused gen+sort+probe loop.
    The deployment shape where a dimension relation is joined repeatedly."""
    from radixjoin_tpu.engine.large import (
        prepare_ranged_fused, join_count_keys_ranged_fused_steady)
    runs = n >> run_shift
    gr = 64            # round-4 tuning: gr=64 beats 32 at the 2^17 knee
    with meas.phase("PREPARE_BUILD", tuples=n):
        build, ok_b = prepare_ranged_fused(n, runs, 2654435761 | 1,
                                           rows_per_group=gr)
        _sync(build)
        assert bool(ok_b)
    with meas.phase("COMPILE"):
        got, ok = join_count_keys_ranged_fused_steady(
            build, n, runs, 0x9E3779B1 ^ 0x40, rows_per_group=gr)
        assert ok and got == n, f"oracle mismatch: {got} != {n}"
    with meas.phase("JOIN", tuples=2 * n * reps):
        for _ in range(reps):
            got, ok = join_count_keys_ranged_fused_steady(
                build, n, runs, 0x9E3779B1 ^ 0x40, rows_per_group=gr)
            assert ok and got == n, f"oracle mismatch: {got} != {n}"
    return got


def run_northstar_steady_config(n: int, reps: int, meas, k: int = 8):
    """Prepared-build steady state at north-star scale (VERDICT r1 item
    1b): the build side is sorted/prepadded ONCE and reused across reps —
    the deployment shape where a dimension side is joined repeatedly
    (engine/join.py prepare_build_sorted at small N; here the ranged-runs
    form).  Steady-state cost = S generation+sorts + diagonal pair probes.
    """
    from radixjoin_tpu.engine.large import (gen_unique_keys_ranged_run,
                                            _sort_biased)
    from radixjoin_tpu.ops.buildprobe import (diagonal_prepad,
                                              probe_count_diagonal)
    runs = max(1, n >> 28)
    nr = n // runs
    rsrc = gen_unique_keys_ranged_run(n, 2654435761 | 1)
    ssrc = gen_unique_keys_ranged_run(n, 0x9E3779B1 ^ 0x40)

    # Executables are shape-specific, so compile the gen+sort+prepad chain
    # on a throwaway run FIRST — otherwise PREPARE_BUILD absorbs the
    # process's first remote compile (~minutes over the relay) and the
    # phase number stops meaning "prepare" (the round-3 668 s artifact).
    with meas.phase("WARMUP_COMPILE"):
        wp = diagonal_prepad(_sort_biased(rsrc(0, runs)), "r", nr, nr,
                             k_drift=k, rows_per_group=32)
        _sync(wp)
        del wp

    with meas.phase("PREPARE_BUILD", tuples=n):
        rs_runs = []
        for i in range(runs):
            rp = diagonal_prepad(_sort_biased(rsrc(i, runs)), "r", nr, nr,
                                 k_drift=k, rows_per_group=32)
            _sync(rp)
            rs_runs.append(rp)

    def one_pass():
        total = 0
        all_ok = True
        for i in range(runs):
            sp = diagonal_prepad(_sort_biased(ssrc(i, runs)), "s", nr, nr,
                                 k_drift=k, rows_per_group=32)
            _sync(sp)
            m, okp = probe_count_diagonal(rs_runs[i], sp, k_drift=k,
                                          rows_per_group=32,
                                          prepadded=(nr, nr))
            _sync(m)
            total += int(m)
            all_ok = all_ok and bool(okp)
        return total, all_ok

    with meas.phase("COMPILE"):
        got, ok = one_pass()
        assert ok and got == n, f"oracle mismatch: {got} != {n}"
    with meas.phase("JOIN", tuples=2 * n * reps):
        for _ in range(reps):
            got, ok = one_pass()
            assert ok and got == n, f"oracle mismatch: {got} != {n}"
    return got


def run_northstar_rows_config(n: int, reps: int, meas):
    """Materialising join at scale (VERDICT r1 item 5): (r_rid, s_rid) row
    production through the emit kernels (diagonal by default on these
    balanced runs, windowed retry on a coverage trip) over ranged
    (key, rid) runs.  Rows stay on device (a full host pull is relay-bound here);
    benchmarks/tpu_rows_check.py is the verification twin that samples
    rows bit-exactly and checks rid checksums per pair.
    """
    from radixjoin_tpu.engine.large import (gen_unique_tuples_ranged_run,
                                            join_rows_keys_ranged_runs)
    runs = max(1, n >> 28)
    rsrc = gen_unique_tuples_ranged_run(n, 2654435761 | 1)
    ssrc = gen_unique_tuples_ranged_run(n, 0x9E3779B1 ^ 0x40)

    def consume(k, rrs, srid, cnt):
        pass                              # rows remain on device, dropped

    with meas.phase("COMPILE"):
        total, ok = join_rows_keys_ranged_runs(
            rsrc, ssrc, runs, n, n, n, consume, sync=_sync)
        assert ok and total == n, f"rows={total} ok={ok}"
    with meas.phase("JOIN", tuples=2 * n * reps):
        for _ in range(reps):
            total, ok = join_rows_keys_ranged_runs(
                rsrc, ssrc, runs, n, n, n, consume, sync=_sync)
            assert ok and total == n, f"rows={total} ok={ok}"
    return total


def run_northstar64_rows_config(n: int, reps: int, meas,
                                runs_shift: int = 26):
    """MATERIALISING 64-bit join at scale: hi-range-partitioned (hi, lo,
    rid) runs through dense-rank surrogates + the diagonal emit kernel
    (engine/large.join64_rows_keys_ranged_runs).  Oracle: both sides
    carry the same unique 64-bit key set per run (lo is a function of
    the hi offset) in different orders with different rids — total rows
    == n and each side's emitted rids sum to n(n-1)/2."""
    from radixjoin_tpu.engine.large import join64_rows_keys_ranged_runs
    runs = max(1, n >> runs_shift)
    nr = n // runs
    span = (1 << 32) // runs

    def source(order_mult):
        def src(k, n_runs):
            i = jnp.arange(nr, dtype=jnp.uint32)
            h = (i * jnp.uint32(order_mult)) & jnp.uint32(nr - 1)
            hi = jnp.uint32(k * span) + h
            lo = h * jnp.uint32(2654435761)
            rid = jnp.uint32(k * nr) + i
            return hi, lo, rid
        return src

    rsrc = source(2654435761 | 1)
    ssrc = source(0x9E3779B1 ^ 0x40)

    sums = [0, 0]

    def consume(k, rrs, srid, cnt):
        # mod-2^32 rid checksums: int64 is unavailable on device (x64
        # off), so sum the uint32 images with deliberate wraparound —
        # sums of per-run wrapped sums stay congruent mod 2^32
        one = cnt == 1
        sums[0] += int(jnp.sum(
            jnp.where(one, rrs, 0).astype(jnp.uint32), dtype=jnp.uint32))
        sums[1] += int(jnp.sum(
            jnp.where(one, srid, 0).astype(jnp.uint32), dtype=jnp.uint32))

    with meas.phase("COMPILE"):
        total, ok = join64_rows_keys_ranged_runs(
            rsrc, ssrc, runs, n, n, consume, sync=_sync)
        assert ok and total == n, f"rows={total} ok={ok}"
        want_sum = n * (n - 1) // 2
        assert (sums[0] - want_sum) % (1 << 32) == 0 \
            and (sums[1] - want_sum) % (1 << 32) == 0, sums
    def drop(*a):
        pass
    with meas.phase("JOIN", tuples=2 * n * reps):
        for _ in range(reps):
            total, ok = join64_rows_keys_ranged_runs(
                rsrc, ssrc, runs, n, n, drop, sync=_sync)
            assert ok and total == n
    return total


def run_northstar_skew_config(n: int, reps: int, meas):
    """BASELINE.json: 1B x 1B Zipf(1.05) skew-aware single-host, in HBM.

    Pair-decomposed skew-aware mergecount (engine/large.py).  Runs per
    side sized so each pair's concat-sort stays within the 2^29 flat-sort
    limit.  Oracle: R dense-unique over [0, n), S Zipf keys within
    [0, n) => matches == n exactly.
    """
    from radixjoin_tpu.engine.large import (join_count_keys_skew_hashed,
                                            join_count_keys_skew_runs,
                                            gen_unique_keys_run,
                                            gen_zipf_keys_run)
    runs = max(1, n >> 27)
    rsrc = gen_unique_keys_run(n, 2654435761 | 1)
    ssrc = gen_zipf_keys_run(n, domain=n, theta=1.05, seed=1235)
    got = None

    def one():
        # linear relabel-hashed path (round 4); ok=False (a range slice
        # over capacity) falls back to the quadratic pair decomposition
        # n_ranges = 8*runs: the phase-2 mergecount follows the sort
        # size curve — 64 ranges at 1B ran 13.2 s/rep vs 15.2 at 16
        # (logs/r5_skewtune.log)
        got, ok = join_count_keys_skew_hashed(
            rsrc, ssrc, runs, runs, n, n, n_ranges=max(4, runs * 8),
            sync=_sync)
        if not ok:
            print("hashed skew path overflowed a range slice; "
                  "falling back to pair decomposition", file=sys.stderr)
            got, ok = join_count_keys_skew_runs(
                rsrc, ssrc, max(1, n >> 28), max(1, n >> 28), n, n,
                sync=_sync)
        assert ok and got == n, f"oracle mismatch: {got} != {n}"
        return got

    with meas.phase("COMPILE"):
        got = one()
    with meas.phase("JOIN", tuples=2 * n * reps):
        for _ in range(reps):
            got = one()
    return got


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="onechip",
                    choices=["small", "onechip", "skew", "distributed",
                             "distributed-1dev", "distributed-ranged",
                             "distributed-ranged-rows", "matchrate",
                             "pipeline", "pipeline-sf100", "northstar",
                             "northstar-skew",
                             "northstar64", "northstar64-fused",
                             "northstar64-rows",
                             "northstar-steady", "northstar-steady-fused",
                             "northstar-rows"])
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
                "distributed": 11,
                "distributed-1dev": 27 if on_tpu else 16,
                "distributed-ranged": 27 if on_tpu else 16,
                "distributed-ranged-rows": 27 if on_tpu else 16,
                "matchrate": 24 if on_tpu else 14,
                "pipeline": 20 if on_tpu else 16,
                "northstar": 30 if on_tpu else 16,
                "northstar-skew": 30 if on_tpu else 16,
                "northstar64": 29 if on_tpu else 15,
                "northstar64-fused": 30 if on_tpu else 15,
                "northstar64-rows": 28 if on_tpu else 14,
                "northstar-steady": 30 if on_tpu else 16,
                "northstar-steady-fused": 30 if on_tpu else 16,
                "northstar-rows": 28 if on_tpu else 14,
                "pipeline-sf100": 29 if on_tpu else 14}
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
    elif args.config == "distributed-1dev":
        got, totm = run_distributed_1dev_config(n, args.reps, meas, cfg)
        print(f"matches={got} mat_rows={totm}", file=sys.stderr)
    elif args.config == "matchrate":
        got = run_matchrate_config(n, args.reps, meas)
        print(f"rows={got}", file=sys.stderr)
    elif args.config == "distributed-ranged":
        got = run_distributed_ranged_config(n, args.reps, meas, cfg)
        print(f"matches={got}", file=sys.stderr)
    elif args.config == "distributed-ranged-rows":
        got = run_distributed_ranged_rows_config(n, args.reps, meas, cfg)
        print(f"rows={got}", file=sys.stderr)
    elif args.config == "pipeline":
        got = run_pipeline_config(n, args.reps, meas)
        print(f"join_count={got}", file=sys.stderr)
    elif args.config == "pipeline-sf100":
        got = run_pipeline_sf100_config(n, args.reps, meas)
        print(f"join_count={got}", file=sys.stderr)
    elif args.config == "northstar":
        got = run_northstar_config(n, args.reps, meas)
        print(f"matches={got}", file=sys.stderr)
    elif args.config == "northstar-skew":
        got = run_northstar_skew_config(n, args.reps, meas)
        print(f"matches={got}", file=sys.stderr)
    elif args.config == "northstar-steady":
        got = run_northstar_steady_config(n, args.reps, meas)
        print(f"matches={got}", file=sys.stderr)
    elif args.config == "northstar-steady-fused":
        got = run_northstar_steady_fused_config(n, args.reps, meas)
        print(f"matches={got}", file=sys.stderr)
    elif args.config == "northstar-rows":
        got = run_northstar_rows_config(n, args.reps, meas)
        print(f"rows={got}", file=sys.stderr)
    elif args.config == "northstar64":
        got = run_northstar64_config(n, args.reps, meas)
        print(f"matches={got}", file=sys.stderr)
    elif args.config == "northstar64-fused":
        got = run_northstar64_fused_config(n, args.reps, meas)
        print(f"matches={got}", file=sys.stderr)
    elif args.config == "northstar64-rows":
        got = run_northstar64_rows_config(n, args.reps, meas)
        print(f"rows={got}", file=sys.stderr)
    else:
        got = run_join_config(n, args.reps, skew=(args.config == "skew"),
                              meas=meas, cfg=cfg)
        print(f"matches={got}", file=sys.stderr)

    meas.print_summary()
    if args.store:
        d = meas.store()
        print(f"stored measurements in {d}", file=sys.stderr)


def main_traced(argv=None):
    """RADIXJOIN_TRACE=1 entry: run the whole config under a
    jax.profiler trace and fold per-executable DEVICE ms into the
    measurement details (the PAPI-tier answer, perf/measurements.
    device_module_times) — .perf artifacts then carry DEV_* rows next to
    the wall-clock phases."""
    import os
    import tempfile
    from radixjoin_tpu.perf.measurements import trace, attribute_device_time
    from radixjoin_tpu.perf import measurements as _m
    log_dir = os.environ.get("RADIXJOIN_TRACE_DIR",
                             tempfile.mkdtemp(prefix="rjtrace-"))
    meas_box = []
    orig = _m.Measurements

    class _Capture(orig):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            meas_box.append(self)
    _m.Measurements = _Capture
    try:
        with trace(log_dir):
            main(argv)
    finally:
        _m.Measurements = orig
    if meas_box:
        mod = attribute_device_time(meas_box[0], log_dir)
        top = sorted(mod.items(), key=lambda kv: -kv[1])[:12]
        for name, ms in top:
            print(f"[DEVICE] {ms:10.1f} ms  {name}", file=sys.stderr)
        meas_box[0].store()


if __name__ == "__main__":
    import os as _os
    if _os.environ.get("RADIXJOIN_TRACE", "0") not in ("0", "", "false"):
        main_traced()
    else:
        main()
