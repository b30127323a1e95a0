"""Distributed 4-phase hash join over a TPU mesh.

TPU-native replacement for the reference's full distributed pipeline
(operators/HashJoin.cpp:45-223, call stack at SURVEY.md §3.1):

  phase 1  HistogramComputation  -> compute_metadata (psum/all_gather exscan)
  phase 2  Window allocation     -> implicit: the all_to_all's static recv
                                    buffers ARE the windows (no allocation
                                    phase; XLA pre-plans the exchange)
  phase 3  NetworkPartitioning   -> shuffle_by_destination (ICI all-to-all)
  phase 4  Local processing      -> local radix partition + tiered Pallas
                                    probe per shard; RESULT_COUNTER psum

The whole 4-phase program is ONE jit-compiled SPMD function over a 1-D mesh —
the reference's MPI barriers (HashJoin.cpp:50,120) dissolve into XLA's
dataflow; its serial per-rank task queue (HashJoin.cpp:187-204) becomes the
Pallas grid of the probe kernel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import JoinConfig, DEFAULT_CONFIG
from ..data.tuples import Relation, radix_bits
from ..ops import skew as skew_ops
from ..ops.buildprobe import (probe_count_tiered, probe_count_banded,
                              probe_count_diagonal, _merged_partials,
                              bias_keys, join_materialize,
                              join_materialize_windowed)
from ..ops.partition import partition_relation
from ..ops.wide import (Relation64, _merged_partials64,
                        probe_count_diagonal64)
from ..parallel.metadata import compute_metadata
from ..parallel.shuffle import (shuffle_by_destination, shuffle_chunked,
                                shuffle_multi)


class DistributedJoinResult(NamedTuple):
    partial_matches: jnp.ndarray  # int32[D] per-device partitioned matches
    ok: jnp.ndarray               # bool[D] no shuffle/tier overflow
    global_hist_r: jnp.ndarray    # int32[P_net] phase-1 observability
    global_hist_s: jnp.ndarray
    heavy_cr: jnp.ndarray         # int32[D, K] owner-masked heavy R freqs
    heavy_cs: jnp.ndarray         # int32[D, K] heavy S freqs
    # 15/15-bit split block partials of the mergecount rung (zeros for
    # every other local probe): a shard with >2^31 local matches — e.g.
    # ~46K duplicates of one key per side all routed to one device —
    # would silently wrap an int32 per-shard total while ok=True.  The
    # partials are provably overflow-free per block (ops/buildprobe.
    # _merged_partials) and recombine in int64 host-side.
    merged_lo: jnp.ndarray        # int32[D, NB]
    merged_hi: jnp.ndarray        # int32[D, NB]


class DistributedJoinRows(NamedTuple):
    """Materialised distributed join output, sharded by producing device:
    each device emits up to max_out (r_rid, s_rid, key) rows for the
    partitions it owns (reference `probe` kernels.cu:199-246, distributed)."""
    r_rids: jnp.ndarray   # uint32[D * max_out]
    s_rids: jnp.ndarray   # uint32[D * max_out]
    keys: jnp.ndarray     # uint32[D * max_out]
    valid: jnp.ndarray    # bool[D * max_out]
    counts: jnp.ndarray   # int32[D] rows produced per device
    ok: jnp.ndarray       # bool[D]


def _fetch(x) -> np.ndarray:
    """Device array -> host numpy, across processes if needed.

    Under multi-process ``jax.distributed`` (parallel/multihost.py) the
    P(axis)-sharded outputs are not fully addressable from one process;
    an all-gather over the process set (the reference's rank-0 metric
    aggregation, Measurements.cpp:567-590 — except every rank gets the
    total) assembles the global value."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def total_distributed_matches(res: DistributedJoinResult) -> int:
    """Host-side 64-bit aggregation at the 'result aggregation node'
    (reference Configuration.h:19, Measurements.cpp:546-606).  Heavy-key
    products multiply here in 64-bit (cr*cs overflows int32 under
    double-sided skew); cr rows are owner-masked so each key counts once."""
    heavy = np.sum(_fetch(res.heavy_cr).astype(np.int64)
                   * _fetch(res.heavy_cs).astype(np.int64))
    merged = (np.sum(_fetch(res.merged_lo).astype(np.int64))
              + (np.sum(_fetch(res.merged_hi).astype(np.int64)) << 15))
    return int(np.sum(_fetch(res.partial_matches).astype(np.int64))
               + heavy + merged)


def make_distributed_join(mesh: Mesh, n_r_shard: int, n_s_shard: int,
                          cfg: JoinConfig = DEFAULT_CONFIG,
                          local_bits: int | None = None,
                          shuffle_rounds: int = 1,
                          skew_aware: bool = False,
                          local_probe: str = "tiered",
                          materialize_max_out: int | None = None,
                          materialize_dense: bool = False,
                          full_capacity: bool = False):
    """Build the jitted SPMD join for given static per-shard sizes.

    Returns fn(r: Relation, s: Relation) -> DistributedJoinResult where the
    relations are sharded along the mesh axis (row-sharded SoA arrays).

    ``local_probe="mergecount"`` is the terminal distributed rung: the
    received shard is counted with the gather-free concat-sort mergecount
    (exact under arbitrary skew, no tier/window capacity to overflow).
    ``full_capacity=True`` sizes the shuffle so every tuple of a shard can
    target ONE device (capacity = per-shard size) — shuffle overflow
    becomes impossible by construction, at n_dev x receive-buffer cost.
    Together they make a distributed join whose only failure mode is the
    all-written invariant itself (reference data/Window.cpp:180-191).
    """
    axis = cfg.mesh_axis
    n_dev = mesh.devices.size
    net_bits = cfg.network_fanout_bits
    p_net = 1 << net_bits
    assert p_net >= n_dev, (
        f"network fanout {p_net} must cover {n_dev} devices")
    assert not (materialize_max_out is not None and skew_aware), (
        "materialising join emits rows; the heavy-hitter pre-pass only "
        "counts — use materialize_dense, whose skew form emits heavy "
        "rows as closed-form blocks")
    assert not (materialize_dense and materialize_max_out is not None), (
        "materialize_dense is its own output form (no max_out bound)")
    if full_capacity:
        from ..config import next_multiple
        cap_r = next_multiple(n_r_shard, 128)
        cap_s = next_multiple(n_s_shard, 128)
    else:
        cap_r = cfg.shuffle_capacity(n_r_shard, n_dev)
        cap_s = cfg.shuffle_capacity(n_s_shard, n_dev)
    if shuffle_rounds > 1:
        # round-sliced exchange needs divisibility
        cap_r = ((cap_r + shuffle_rounds - 1) // shuffle_rounds) * shuffle_rounds
        cap_s = ((cap_s + shuffle_rounds - 1) // shuffle_rounds) * shuffle_rounds

    if local_bits is None:
        recv_mean_r = cap_r * n_dev
        from .join import auto_fanout_bits
        local_bits = auto_fanout_bits(recv_mean_r)
    p_local = 1 << local_bits
    k_half = max(8, cfg.max_heavy_keys // (2 * n_dev))
    k_cand = 2 * k_half * n_dev

    def shard_fn(rk, rr, sk, sr):
        # ---- phase 0 (optional): distributed heavy-hitter pre-pass ----
        # Mirrors the single-chip skew path (engine/join.py) across the
        # mesh: per-shard sampled candidates -> all_gather + dedup ->
        # exact global frequencies by psum of local compare-counts ->
        # closed-form heavy match contribution; heavy rows never enter the
        # shuffle (the reference's skew kernels only act locally,
        # kernels_optimized.cu:301-457 — acting *before* the network phase
        # is the distributed upgrade: it also removes the shuffle hotspot).
        heavy_cr = jnp.zeros((k_cand,), jnp.int32)
        heavy_cs = jnp.zeros((k_cand,), jnp.int32)
        drop_r = drop_s = hh = None
        if skew_aware:
            my = jax.lax.axis_index(axis)
            key = jax.random.fold_in(jax.random.key(0), my)
            kr, ks = jax.random.split(key)
            hh_r = skew_ops.detect_heavy_keys(rk, kr, k_half)
            hh_s = skew_ops.detect_heavy_keys(sk, ks, k_half)
            cand_keys = jax.lax.all_gather(
                jnp.concatenate([hh_r.keys, hh_s.keys]), axis).reshape(-1)
            cand_valid = jax.lax.all_gather(
                jnp.concatenate([hh_r.valid, hh_s.valid]), axis).reshape(-1)
            hh = skew_ops.dedup_heavy(
                skew_ops.HeavyHitters(cand_keys, cand_valid))
            cr = jax.lax.psum(skew_ops.count_exact(rk, hh), axis)
            heavy_cs = jax.lax.psum(skew_ops.count_exact(sk, hh), axis)
            # Mask cr to this shard's owned keys so the host-side 64-bit
            # product sum (cr*cs can overflow int32 under double-sided
            # skew) counts each key exactly once globally.
            owner = (jnp.arange(cand_keys.shape[0], dtype=jnp.int32)
                     % jnp.int32(n_dev))
            heavy_cr = jnp.where(owner == my, cr, 0)
            drop_r = skew_ops.heavy_mask(rk, hh)
            drop_s = skew_ops.heavy_mask(sk, hh)

        # ---- phase 1: histograms / assignment / offsets ----
        # Heavy rows get the out-of-range id p_net: excluded from every
        # histogram bin and shuffled nowhere.
        pid_r = radix_bits(rk, net_bits)
        pid_s = radix_bits(sk, net_bits)
        if drop_r is not None:
            pid_r = jnp.where(drop_r, jnp.int32(p_net), pid_r)
            pid_s = jnp.where(drop_s, jnp.int32(p_net), pid_s)
        meta_r = compute_metadata(pid_r, p_net, axis)
        meta_s = compute_metadata(pid_s, p_net, axis)

        # ---- phase 3: network partitioning (ICI all-to-all) ----
        pid_r_c = jnp.minimum(pid_r, p_net - 1)
        pid_s_c = jnp.minimum(pid_s, p_net - 1)
        dest_r = meta_r.assignment[pid_r_c]
        dest_s = meta_s.assignment[pid_s_c]
        if shuffle_rounds > 1:
            shuf_r = shuffle_chunked(rk, rr, dest_r, cap_r, axis,
                                     shuffle_rounds, drop_r)
            shuf_s = shuffle_chunked(sk, sr, dest_s, cap_s, axis,
                                     shuffle_rounds, drop_s)
        else:
            shuf_r = shuffle_by_destination(rk, rr, dest_r, cap_r, axis,
                                            drop_r)
            shuf_s = shuffle_by_destination(sk, sr, dest_s, cap_s, axis,
                                            drop_s)

        # all-tuples-written invariant (data/Window.cpp:180-191, invoked
        # PER RELATION by NetworkPartitioning.cpp:220): every tuple this
        # shard received is valid-marked; counts must reconcile against
        # the owned-partition slice of the global histogram — for R AND
        # for S (an S-side put lost in the shuffle must trip ok exactly
        # like an R-side one).
        my_dev = jax.lax.axis_index(axis)
        recv_r = jnp.sum(shuf_r.valid.astype(jnp.int32))
        expected_r = jnp.sum(
            jnp.where(meta_r.assignment == my_dev, meta_r.global_hist, 0))
        recv_s = jnp.sum(shuf_s.valid.astype(jnp.int32))
        expected_s = jnp.sum(
            jnp.where(meta_s.assignment == my_dev, meta_s.global_hist, 0))
        ok = ((recv_r == expected_r) & (recv_s == expected_s)
              & ~shuf_r.overflow & ~shuf_s.overflow)

        if materialize_dense:
            # Dense materialising local rung (round 4): full key sort of
            # the received shard + the windowed emit kernel — the engine's
            # scatter-free output form at shard scale (reference `probe`
            # output claiming, kernels.cu:236-243, without the static
            # output bound or the gather assembly).  Invalid shuffle
            # slots sort to the tail as side-distinct sentinels and emit
            # count 0.
            from ..utils.backend import pallas_interpret
            rbk, rrs = jax.lax.sort(
                (bias_keys(shuf_r.keys, ~shuf_r.valid, 0xFFFFFFFF),
                 shuf_r.rids.astype(jnp.int32)), num_keys=1,
                is_stable=False)
            sbk, srs = jax.lax.sort(
                (bias_keys(shuf_s.keys, ~shuf_s.valid, 0xFFFFFFFE),
                 shuf_s.rids.astype(jnp.int32)), num_keys=1,
                is_stable=False)
            out_srid, cnt, win_ok, multi = join_materialize_windowed(
                rbk, sbk, srs,
                rows_per_group=8 if pallas_interpret() else 32)
            row_ok = ok & win_ok & ~multi
            if not skew_aware:
                return (rrs.astype(jnp.uint32)[None], out_srid[None],
                        cnt[None], row_ok[None])
            # Skew form (round 5, reference probe_skew emits pairs,
            # kernels_optimized.cu:364-457): heavy rows never entered
            # the shuffle; their output is the closed-form BLOCK product
            # per heavy key — all R rows of key k join all S rows of
            # key k — so emitting the per-side (candidate_index, rid)
            # lists IS the output, in O(rows) not O(rows^2).  Compaction
            # sort (no gather): rows sort by candidate index, heavy
            # prefix sliced at full shard capacity (overflow-free by
            # construction).
            def compact_heavy(keys, rids, drop):
                eq = (keys[None, :] == hh.keys[:, None]) \
                    & hh.valid[:, None]
                hix = jnp.where(drop,
                                jnp.argmax(eq, axis=0).astype(jnp.int32),
                                jnp.int32(0x7FFFFFFF))
                cnt_h = jnp.sum(drop.astype(jnp.int32))
                six, srid = jax.lax.sort((hix, rids), num_keys=1,
                                         is_stable=False)
                return six, srid, cnt_h

            hr_ix, hr_rid, hr_cnt = compact_heavy(rk, rr, drop_r)
            hs_ix, hs_rid, hs_cnt = compact_heavy(sk, sr, drop_s)
            return (rrs.astype(jnp.uint32)[None], out_srid[None],
                    cnt[None], row_ok[None],
                    hh.keys, hh.valid,
                    hr_ix[None], hr_rid[None], hr_cnt[None],
                    hs_ix[None], hs_rid[None], hs_cnt[None])

        # ---- phase 4: local processing (second radix pass + probe) ----
        # Local radix bits sit ABOVE the network bits (reference
        # LocalPartitioning's MASK over value bits [32..37),
        # tasks/LocalPartitioning.cpp:147-149): the network bits are constant
        # within an owned partition, so only higher bits spread the data.
        r_rel = Relation(shuf_r.keys, shuf_r.rids)
        s_rel = Relation(shuf_s.keys, shuf_s.rids)
        if local_probe == "mergecount" and materialize_max_out is None:
            # Terminal rung: concat-sort mergecount of the received shard
            # (engine/join.py mode="mergecount") — exact under arbitrary
            # skew/dup structure, nothing to overflow.  Invalid shuffle
            # slots get side-distinct out-of-domain sentinels (the key
            # domain is [0, 2^32-16)) so padding can never cross-match.
            rk_m = jnp.where(shuf_r.valid, shuf_r.keys,
                             jnp.uint32(0xFFFFFFFF))
            sk_m = jnp.where(shuf_s.valid, shuf_s.keys,
                             jnp.uint32(0xFFFFFFFE))
            # 15/15-bit block partials instead of an int32 sum: a shard
            # whose local matches exceed 2^31 must not wrap (the terminal
            # rung's whole point is "no input yields a wrong count").
            lo, hi = _merged_partials(rk_m, sk_m)
            return (jnp.zeros((1,), jnp.int32), ok[None],
                    meta_r.global_hist, meta_s.global_hist,
                    heavy_cr[None], heavy_cs[None],
                    lo[None], hi[None])
        if local_probe == "diagonal" and materialize_max_out is None:
            # Fastest local rung (engine/join.py mode="diagonal"): a full
            # key sort of the received shard replaces the second radix
            # pass entirely; invalid shuffle slots sentinel-sort to the
            # tail.  Shards are balanced by construction (same key
            # distribution both sides), the diagonal's requirement.
            from ..utils.backend import pallas_interpret
            rs = jax.lax.sort(bias_keys(shuf_r.keys, ~shuf_r.valid,
                                        0xFFFFFFFF), is_stable=False)
            ss = jax.lax.sort(bias_keys(shuf_s.keys, ~shuf_s.valid,
                                        0xFFFFFFFE), is_stable=False)
            matches, tiers_ok = probe_count_diagonal(
                rs, ss, k_drift=cfg.diagonal_k,
                rows_per_group=8 if pallas_interpret() else
                cfg.diagonal_rows_per_group)
            return (matches[None].astype(jnp.int32),
                    (ok & tiers_ok)[None],
                    meta_r.global_hist, meta_s.global_hist,
                    heavy_cr[None], heavy_cs[None],
                    jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.int32))
        r_part = partition_relation(r_rel, local_bits, net_bits, ~shuf_r.valid)
        s_part = partition_relation(s_rel, local_bits, net_bits, ~shuf_s.valid)
        if materialize_max_out is not None:
            # Materialising variant (reference `probe`, kernels.cu:199-246):
            # per-shard (r_rid, s_rid, key) row triples over the received
            # (valid-prefix) data.  Global rids survived the shuffle, so
            # outputs reference original relation rows.
            vr = jnp.sum(r_part.counts)
            vs = jnp.sum(s_part.counts)
            rk_m = jnp.where(jnp.arange(r_part.keys.shape[0]) < vr,
                             r_part.keys, jnp.uint32(0xFFFFFFFF))
            sk_m = jnp.where(jnp.arange(s_part.keys.shape[0]) < vs,
                             s_part.keys, jnp.uint32(0xFFFFFFFE))
            out_r, out_s, out_k, valid, total = join_materialize(
                rk_m, r_part.rids, sk_m, s_part.rids, materialize_max_out)
            row_ok = ok & (total <= materialize_max_out)
            return (out_r[None], out_s[None], out_k[None], valid[None],
                    total[None], row_ok[None])
        if local_probe == "banded":
            mean_s_rows = max(1, -(-(cap_s * n_dev) // (p_local * 128)))
            window = 2 + 4 * mean_s_rows
            gr = 32
            band = -(-(2 * gr * mean_s_rows + window + 8) // 8)
            matches, tiers_ok = probe_count_banded(
                r_part, s_part, window_rows=window, band_blocks=band,
                rows_per_group=gr)
        else:
            pcap_r = cfg.partition_capacity(cap_r * n_dev, p_local)
            pcap_s = cfg.partition_capacity(cap_s * n_dev, p_local)
            matches, tiers_ok = probe_count_tiered(
                r_part, s_part, pcap_r, pcap_s,
                tile=cfg.probe_tile, use_pallas=cfg.use_pallas)

        return (matches[None].astype(jnp.int32),
                (ok & tiers_ok)[None],
                meta_r.global_hist, meta_s.global_hist,
                heavy_cr[None], heavy_cs[None],
                jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.int32))

    sharded = NamedSharding(mesh, P(axis))

    if materialize_dense and skew_aware:
        out_specs = (P(axis),) * 4 + (P(), P()) + (P(axis),) * 6
    elif materialize_dense:
        out_specs = (P(axis),) * 4
    elif materialize_max_out is not None:
        out_specs = (P(axis),) * 6
    else:
        out_specs = (P(axis), P(axis), P(), P(), P(axis), P(axis),
                     P(axis), P(axis))

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=out_specs,
        # check_vma must be off: pallas_call out_shapes carry no varying-
        # mesh-axis annotation, and the replicated global histograms are
        # psum results the checker can't always prove replicated.
        check_vma=False,
    )

    @jax.jit
    def run(r: Relation, s: Relation):
        rk = jax.lax.with_sharding_constraint(r.keys, sharded)
        rr = jax.lax.with_sharding_constraint(r.rids, sharded)
        sk = jax.lax.with_sharding_constraint(s.keys, sharded)
        sr = jax.lax.with_sharding_constraint(s.rids, sharded)
        out = mapped(rk, rr, sk, sr)
        if materialize_dense and skew_aware:
            return DistributedJoinRowsDenseSkew(*out)
        if materialize_dense:
            return DistributedJoinRowsDense(*out)
        if materialize_max_out is not None:
            return DistributedJoinRows(*out)
        return DistributedJoinResult(*out)

    return run


class DistributedJoinRowsDense(NamedTuple):
    """Materialised distributed join in the engine's DENSE form (round 4):
    per shard, outputs are aligned to the received R rows in sorted-key
    order — R row i matched ``counts[i]`` S rows and, where counts == 1,
    its partner is ``s_rids[i]`` (the windowed emit kernel's convention,
    ops/buildprobe.join_materialize_windowed).  No static max_out bound,
    no gather-assembled row triples (the triple-producing variant's
    output gathers are the slowest op class on this chip and crashed the
    relay worker at 2^25/shard; this form scales with the shard).
    ``ok`` False on window overflow or a multi-match R row — escalate to
    the max_out variant."""
    r_rids: jnp.ndarray   # uint32[D * recv]  sorted-key-order R rids
    s_rids: jnp.ndarray   # int32[D * recv]   partner rid where count==1
    counts: jnp.ndarray   # int32[D * recv]   matches per R row
    ok: jnp.ndarray       # bool[D]


_DOMAIN_END = 0xFFFFFFF0      # key domain is [0, 2^32 - 16); top 16 = pads


class DistributedRangedResult(NamedTuple):
    """Output of :func:`make_distributed_join_ranged` — per-shard merged
    15/15-bit partials per local sub-range (overflow-free int32 blocks,
    recombined host-side in int64), plus the validity surface."""
    merged_lo: jnp.ndarray   # int32[D, B, NB]
    merged_hi: jnp.ndarray   # int32[D, B, NB]
    range_ok: jnp.ndarray    # int32[D, B]   per-sub-range capacity ok
    ok: jnp.ndarray          # bool[D]       all-written + no overflow
    heavy_cr: jnp.ndarray    # int32[D, K]   owner-masked heavy R freqs
    heavy_cs: jnp.ndarray    # int32[D, K]


def total_distributed_matches_ranged(res: DistributedRangedResult) -> int:
    heavy = np.sum(_fetch(res.heavy_cr).astype(np.int64)
                   * _fetch(res.heavy_cs).astype(np.int64))
    merged = (np.sum(_fetch(res.merged_lo).astype(np.int64))
              + (np.sum(_fetch(res.merged_hi).astype(np.int64)) << 15))
    return int(merged + heavy)


def ranged_ok(res: DistributedRangedResult) -> bool:
    return bool(np.all(_fetch(res.ok))
                and np.all(_fetch(res.range_ok) == 1))


def make_distributed_join_ranged(mesh: Mesh, n_r_shard: int, n_s_shard: int,
                                 cfg: JoinConfig = DEFAULT_CONFIG,
                                 local_ranges: int = 64,
                                 send_chunks: int = 1,
                                 range_slack: float = 1.35,
                                 skew_aware: bool = False,
                                 local_probe: str = "mergecount",
                                 k_drift: int = 8,
                                 rows_per_group: int = 64):
    """RANGE-partitioned fused distributed count join (round 5).

    The round-4 4-phase path radix-partitions on low key bits and then
    flat-sorts the whole received shard for the local diagonal probe —
    at 2^27/shard that sort runs in XLA's 1.85 ns/elem regime and is
    ~90% of the distributed wall (VERDICT r4 weak #2).  This variant
    applies the fused ranged-runs lessons (engine/large.py) to the whole
    distributed pipeline:

      * the network partition becomes a VALUE-RANGE partition on the
        high key bits with BLOCK ownership (device d owns the d-th
        contiguous slice of the key domain) — the reference's radix
        choice (key & 31, histograms/LocalHistogram.cpp:44-47) is
        hash-vs-range only; range keeps every per-device slice
        CONTIGUOUS in sorted order, which is what the fused local rung
        feeds on,
      * the send side sorts ``send_chunks`` position-slices of its shard
        independently (small-operand sorts run at ~0.8 ns/elem inside a
        fused executable vs 1.85 flat — the round-4 size-curve
        measurement), and every per-destination segment is then a
        CONTIGUOUS dynamic-slice of a sorted chunk (the round-4
        gather-free send rule),
      * the receiver gets n_dev*send_chunks sorted sub-segments; the
        local rung is ONE fori_loop executable over ``local_ranges``
        sub-ranges of its owned slice, assembling each sub-range from
        per-segment dynamic slices (searchsorted bounds) and counting
        with the overflow-free mergecount partials — exact under
        arbitrary duplicate structure, no flat receive sort at all.

    Keys are RELABELED by the equality-preserving multiplicative
    bijection k' = k * 0x9E3779B1 mod 2^32 before range routing (the
    round-4 skew-hashed trick, engine/large.py): any key distribution —
    including the engine's dense [0, n) benchmark keys, which would
    otherwise all land on device 0 — spreads uniformly over the
    relabeled domain, making this hash partitioning with per-device
    CONTIGUITY.  The 16 keys whose relabeled image falls in the
    sentinel zone [2^32-16, 2^32) are counted exactly through the
    heavy-key closed-form path and never shuffled.

    Validity travels as ORDER, not masks: segment tails are padded with
    side-distinct out-of-domain sentinels (R 0xFFFFFFFF, S 0xFFFFFFFE)
    that keep segments sorted and can never cross-match, so the wire
    carries keys only (the reference ships 8 B CompressedTuples for the
    same reason, NetworkPartitioning.cpp:128-129).  The all-written
    invariant (data/Window.cpp:180-191) is checked from psum'd send
    counts vs per-segment searchsorted totals, including the
    nothing-out-of-range condition.

    ``skew_aware`` runs the same phase-0 heavy-hitter pre-pass as
    :func:`make_distributed_join` — with range partitioning a heavy key
    is a hotspot for its owner device, so dropping heavy keys before the
    shuffle matters MORE here than for the radix path.

    Count-only (keys cross the wire).  Returns fn(r, s) ->
    :class:`DistributedRangedResult`; total via
    :func:`total_distributed_matches_ranged`; any range_ok==0 means a
    sub-range capacity overflowed — escalate (see
    make_distributed_join_ranged_checked).
    """
    from ..config import next_multiple
    from ..ops.buildprobe import _PARTIAL_BLOCK

    axis = cfg.mesh_axis
    n_dev = mesh.devices.size
    C = send_chunks
    B = local_ranges
    assert B >= 2, "local_ranges >= 2 (sub-edge arithmetic is uint32)"
    assert n_r_shard % C == 0 and n_s_shard % C == 0
    chunk_r = n_r_shard // C
    chunk_s = n_s_shard // C

    def chunk_cap(chunk):
        if n_dev == 1:
            return next_multiple(chunk, 128)
        import math
        return next_multiple(
            math.ceil(chunk / n_dev * cfg.allocation_factor), 128)

    cap_cr = chunk_cap(chunk_r)
    cap_cs = chunk_cap(chunk_s)
    n_seg = n_dev * C

    def sub_cap(chunk, cap_c):
        import math
        mean = max(1, math.ceil(chunk / (n_dev * B)))
        return min(next_multiple(math.ceil(mean * range_slack), 128),
                   next_multiple(cap_c, 128))

    cap_sr = sub_cap(chunk_r, cap_cr)
    cap_ss = sub_cap(chunk_s, cap_cs)
    assert local_probe in ("mergecount", "diagonal"), local_probe
    # diagonal rung returns per-range match counts in the lo slots
    # (hi stays 0) so the host-side total recombines identically
    nb = 1 if local_probe == "diagonal" else \
        -(-(n_seg * (cap_sr + cap_ss)) // _PARTIAL_BLOCK)

    # static device range edges over the key domain (block assignment:
    # the ranged mirror of AssignmentMap's round robin)
    span = (1 << 32) // n_dev
    edges_np = np.minimum(np.arange(n_dev + 1, dtype=np.int64) * span,
                          _DOMAIN_END).astype(np.uint32)
    edges_np[n_dev] = np.uint32(_DOMAIN_END)
    dev_edges = jnp.asarray(edges_np)

    k_half = max(8, cfg.max_heavy_keys // (2 * n_dev))
    # the 16 sentinel-zone preimages ride as always-valid heavy keys so
    # no real key relabels into [DOMAIN_END, 2^32) — mirror of
    # engine/large._SENT_PREIMAGES, widened to the whole pad zone
    _inv = pow(0x9E3779B1, -1, 1 << 32)
    preimgs_np = np.array(
        [((_DOMAIN_END + i) * _inv) % (1 << 32) for i in range(16)],
        np.uint32)
    k_cand = (2 * k_half * n_dev + 16) if skew_aware else 16

    def shard_fn(rk, sk):
        my = jax.lax.axis_index(axis)

        # ---- phase 0: heavy-hitter pre-pass (always runs with at least
        # the sentinel-zone preimages; full sampled detection when
        # skew_aware) ----
        fixed = skew_ops.HeavyHitters(jnp.asarray(preimgs_np),
                                      jnp.ones((16,), bool))
        if skew_aware:
            key = jax.random.fold_in(jax.random.key(0), my)
            kr, ks = jax.random.split(key)
            hh_r = skew_ops.detect_heavy_keys(rk, kr, k_half)
            hh_s = skew_ops.detect_heavy_keys(sk, ks, k_half)
            cand_keys = jax.lax.all_gather(
                jnp.concatenate([hh_r.keys, hh_s.keys]), axis).reshape(-1)
            cand_valid = jax.lax.all_gather(
                jnp.concatenate([hh_r.valid, hh_s.valid]), axis).reshape(-1)
            hh = skew_ops.dedup_heavy(skew_ops.HeavyHitters(
                jnp.concatenate([cand_keys, fixed.keys]),
                jnp.concatenate([cand_valid, fixed.valid])))
        else:
            hh = fixed
        cr = jax.lax.psum(skew_ops.count_exact(rk, hh), axis)
        heavy_cs = jax.lax.psum(skew_ops.count_exact(sk, hh), axis)
        owner = (jnp.arange(k_cand, dtype=jnp.int32) % jnp.int32(n_dev))
        heavy_cr = jnp.where(owner == my, cr, 0)
        # heavy rows -> own-side sentinel (never sent); everything else
        # relabels through the spreading bijection
        rk = jnp.where(skew_ops.heavy_mask(rk, hh),
                       jnp.uint32(0xFFFFFFFF),
                       rk * jnp.uint32(0x9E3779B1))
        sk = jnp.where(skew_ops.heavy_mask(sk, hh),
                       jnp.uint32(0xFFFFFFFE),
                       sk * jnp.uint32(0x9E3779B1))

        # ---- phases 1+3: chunk-sorted ranged send + all_to_all ----
        def ranged_send(keys, C_, chunk, cap_c, sentinel):
            slot = jnp.arange(cap_c, dtype=jnp.int32)
            per_dest = [[] for _ in range(n_dev)]
            counts = jnp.zeros((n_dev,), jnp.int32)
            overflow = jnp.bool_(False)
            for c in range(C_):
                ck = jax.lax.slice_in_dim(keys, c * chunk, (c + 1) * chunk)
                cs_ = jax.lax.sort(ck, is_stable=False)
                bnd = jnp.searchsorted(cs_, dev_edges).astype(jnp.int32)
                sizes = bnd[1:] - bnd[:-1]
                counts = counts + sizes
                overflow = overflow | jnp.any(sizes > jnp.int32(cap_c))
                src = jnp.concatenate(
                    [cs_, jnp.full((cap_c,), jnp.uint32(sentinel))])
                for d in range(n_dev):
                    sl = jax.lax.dynamic_slice_in_dim(src, bnd[d], cap_c)
                    per_dest[d].append(
                        jnp.where(slot < sizes[d], sl,
                                  jnp.uint32(sentinel)))
            send = jnp.stack([jnp.concatenate(p) if C_ > 1 else p[0]
                              for p in per_dest])
            return send, counts, overflow

        send_r, counts_r, ovf_r = ranged_send(rk, C, chunk_r, cap_cr,
                                              0xFFFFFFFF)
        send_s, counts_s, ovf_s = ranged_send(sk, C, chunk_s, cap_cs,
                                              0xFFFFFFFE)
        recv_r = jax.lax.all_to_all(send_r, axis, 0, 0,
                                    tiled=False).reshape(n_seg, cap_cr)
        recv_s = jax.lax.all_to_all(send_s, axis, 0, 0,
                                    tiled=False).reshape(n_seg, cap_cs)

        # ---- local sub-range bounds (B+2 queries: [my_lo + b*sspan],
        # my_hi, DOMAIN_END) per received segment ----
        # base = my * span read from the static edge table (min() never
        # binds for real device indices); computing my*span directly
        # would overflow uint32 at n_dev == 1 where span == 2^32.
        base = jax.lax.dynamic_index_in_dim(dev_edges, my, 0,
                                            keepdims=False)
        my_hi = jax.lax.dynamic_index_in_dim(dev_edges, my + 1, 0,
                                             keepdims=False)
        sspan = span // B     # B >= 2 keeps (B-1)*sspan inside uint32
        sub = base + (jnp.arange(B, dtype=jnp.uint32)
                      * jnp.uint32(sspan))
        queries = jnp.concatenate(
            [sub, my_hi[None],
             jnp.full((1,), _DOMAIN_END, jnp.uint32)])  # [B+2]

        def seg_bounds(segs2d):
            return jax.vmap(
                lambda seg: jnp.searchsorted(seg, queries)
                .astype(jnp.int32))(segs2d)          # [n_seg, B+2]

        qb_r = seg_bounds(recv_r)
        qb_s = seg_bounds(recv_s)

        # all-written + routing invariant (Window.cpp:180-191): every
        # tuple sent to me arrived (psum'd send counts == per-segment
        # valid totals), nothing below my range start, nothing in
        # [my_hi, DOMAIN_END)
        exp_r = jax.lax.psum(counts_r, axis)
        exp_s = jax.lax.psum(counts_s, axis)
        my_exp_r = jax.lax.dynamic_index_in_dim(exp_r, my, 0,
                                                keepdims=False)
        my_exp_s = jax.lax.dynamic_index_in_dim(exp_s, my, 0,
                                                keepdims=False)
        ok = ((jnp.sum(qb_r[:, B + 1]) == my_exp_r)
              & (jnp.sum(qb_s[:, B + 1]) == my_exp_s)
              & (jnp.sum(qb_r[:, 0]) == 0) & (jnp.sum(qb_s[:, 0]) == 0)
              & (jnp.sum(qb_r[:, B + 1] - qb_r[:, B]) == 0)
              & (jnp.sum(qb_s[:, B + 1] - qb_s[:, B]) == 0)
              & ~ovf_r & ~ovf_s)

        # ---- phase 4: fused fori_loop over B sub-ranges ----
        flat_r = jnp.concatenate(
            [recv_r.reshape(-1),
             jnp.full((cap_sr,), jnp.uint32(0xFFFFFFFF))])
        flat_s = jnp.concatenate(
            [recv_s.reshape(-1),
             jnp.full((cap_ss,), jnp.uint32(0xFFFFFFFE))])

        def assemble(flat, qb, cap_c, cap_sub, sentinel, rg):
            slot = jnp.arange(cap_sub, dtype=jnp.int32)
            parts = []
            ok_rg = jnp.bool_(True)
            for seg in range(n_seg):
                start = jax.lax.dynamic_index_in_dim(qb[seg], rg, 0,
                                                     keepdims=False)
                end = jax.lax.dynamic_index_in_dim(qb[seg], rg + 1, 0,
                                                   keepdims=False)
                size = end - start
                ok_rg = ok_rg & (size <= jnp.int32(cap_sub))
                sl = jax.lax.dynamic_slice_in_dim(
                    flat, seg * cap_c + start, cap_sub)
                parts.append(jnp.where(slot < size, sl,
                                       jnp.uint32(sentinel)))
            return (jnp.concatenate(parts) if n_seg > 1 else parts[0],
                    ok_rg)

        def body(rg, carry):
            lo_a, hi_a, oks = carry
            rr, ok_r = assemble(flat_r, qb_r, cap_cr, cap_sr,
                                0xFFFFFFFF, rg)
            ss, ok_s = assemble(flat_s, qb_s, cap_cs, cap_ss,
                                0xFFFFFFFE, rg)
            if local_probe == "diagonal":
                # near-uniform fast rung (the relabeled light domain IS
                # uniform): small-operand sorts + rank-diagonal Pallas
                # probe — ~2x over mergecount's sort+scan passes; a
                # tripped drift/coverage check (duplicate-heavy range)
                # flips range_ok -> checked wrapper escalates
                from ..utils.backend import pallas_interpret
                from ..ops.buildprobe import diagonal_prepad
                n_rr = n_seg * cap_sr
                n_ss = n_seg * cap_ss
                gr = 8 if pallas_interpret() else rows_per_group
                rsrt = jax.lax.sort(bias_keys(rr), is_stable=False)
                ssrt = jax.lax.sort(bias_keys(ss), is_stable=False)
                rp = diagonal_prepad(rsrt, "r", n_rr, n_ss,
                                     k_drift=k_drift, rows_per_group=gr)
                sp = diagonal_prepad(ssrt, "s", n_rr, n_ss,
                                     k_drift=k_drift, rows_per_group=gr)
                m, okp = probe_count_diagonal(
                    rp, sp, k_drift=k_drift, rows_per_group=gr,
                    prepadded=(n_rr, n_ss), blocked=True)
                ok_k = (ok_r & ok_s & okp).astype(jnp.int32)
                return (jax.lax.dynamic_update_slice_in_dim(
                            lo_a, m.astype(jnp.int32)[None, None], rg, 0),
                        hi_a,
                        jax.lax.dynamic_update_index_in_dim(
                            oks, ok_k, rg, 0))
            lo, hi = _merged_partials(rr, ss)
            ok_k = (ok_r & ok_s).astype(jnp.int32)
            return (jax.lax.dynamic_update_slice_in_dim(
                        lo_a, lo[None, :], rg, 0),
                    jax.lax.dynamic_update_slice_in_dim(
                        hi_a, hi[None, :], rg, 0),
                    jax.lax.dynamic_update_index_in_dim(oks, ok_k, rg, 0))

        lo_a, hi_a, roks = jax.lax.fori_loop(
            0, B, body,
            (jnp.zeros((B, nb), jnp.int32), jnp.zeros((B, nb), jnp.int32),
             jnp.zeros((B,), jnp.int32)))
        return (lo_a[None], hi_a[None], roks[None], ok[None],
                heavy_cr[None], heavy_cs[None])

    sharded = NamedSharding(mesh, P(axis))
    mapped = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=(P(axis),) * 6, check_vma=False)

    @jax.jit
    def run(r_keys: jnp.ndarray, s_keys: jnp.ndarray):
        rk = jax.lax.with_sharding_constraint(r_keys, sharded)
        sk = jax.lax.with_sharding_constraint(s_keys, sharded)
        return DistributedRangedResult(*mapped(rk, sk))

    return run


def make_distributed_join_ranged_checked(mesh: Mesh, n_r_shard: int,
                                         n_s_shard: int,
                                         cfg: JoinConfig = DEFAULT_CONFIG,
                                         **kw):
    """Escalating form of :func:`make_distributed_join_ranged`: a tripped
    sub-range capacity or all-written flag reruns the workload through
    the terminal radix rung (full-capacity shuffle + mergecount,
    :func:`make_distributed_join`) — count-exact under any input.
    Returns fn(r_keys, s_keys) -> (matches: int, escalated: bool)."""
    fast = make_distributed_join_ranged(mesh, n_r_shard, n_s_shard, cfg,
                                        **kw)
    skew = kw.get("skew_aware", False)
    terminal = None

    def run(r_keys, s_keys):
        nonlocal terminal
        res = fast(r_keys, s_keys)
        if ranged_ok(res):
            return total_distributed_matches_ranged(res), False
        if terminal is None:
            terminal = make_distributed_join(
                mesh, n_r_shard, n_s_shard, cfg,
                local_probe="mergecount", full_capacity=True,
                skew_aware=skew)
        rids = jnp.zeros_like(r_keys)
        res = terminal(Relation(r_keys, rids), Relation(s_keys, rids))
        assert bool(np.all(_fetch(res.ok))), (
            "all-written invariant failed in the terminal rung")
        return total_distributed_matches(res), True

    return run


class DistributedRangedRows(NamedTuple):
    """Materialising output of :func:`make_distributed_join_ranged_rows`
    (round 5, the rows form of the fused ranged path).  Light rows are per
    LOCAL SUB-RANGE in the engine's dense form (the windowed emit kernel's
    convention, ops/buildprobe.join_materialize_windowed): within range
    ``b`` of device ``d``, slot ``i`` is the i-th assembled R row in
    sorted-key order — it matched ``counts[d, b, i]`` S rows, its own rid
    is ``r_rids[d, b, i]``, and where the count is exactly 1 its partner's
    rid is ``s_rids[d, b, i]``.  Sentinel padding slots carry count 0.

    Heavy keys (the 16 sentinel-zone relabel preimages, plus sampled
    candidates when skew_aware) never enter the shuffle; their rows are
    the per-key closed-form block products carried as per-side
    (candidate_index, rid) lists — assemble with :func:`heavy_row_blocks`
    (field names match :class:`DistributedJoinRowsDenseSkew` so the
    helpers are shared).  ``range_ok[d, b] == 0`` on a sub-range capacity
    overflow, an emit-window overflow, or a multi-match R row (counts
    stay exact there, but emitted rids are rid-sums) — escalate via
    :func:`make_distributed_join_ranged_rows_checked`."""
    r_rids: jnp.ndarray       # uint32[D, B, cap_rng]
    s_rids: jnp.ndarray       # int32[D, B, cap_rng]
    counts: jnp.ndarray       # int32[D, B, cap_rng]
    light: jnp.ndarray        # int32[D, B]  per-sub-range sum of counts
    range_ok: jnp.ndarray     # int32[D, B]
    ok: jnp.ndarray           # bool[D]   all-written + no send overflow
    heavy_keys: jnp.ndarray   # uint32[K] replicated candidates
    heavy_valid: jnp.ndarray  # bool[K]
    hr_ix: jnp.ndarray        # int32[D * n_r_shard]  cand idx, sorted
    hr_rid: jnp.ndarray       # uint32[D * n_r_shard]
    hr_cnt: jnp.ndarray       # int32[D]
    hs_ix: jnp.ndarray        # int32[D * n_s_shard]
    hs_rid: jnp.ndarray       # uint32[D * n_s_shard]
    hs_cnt: jnp.ndarray       # int32[D]


def ranged_rows_ok(res: DistributedRangedRows) -> bool:
    return bool(np.all(_fetch(res.ok))
                and np.all(_fetch(res.range_ok) == 1))


def total_distributed_rows_ranged(res: DistributedRangedRows) -> int:
    """64-bit total join rows: dense light counts + heavy block products
    (counts are exact even where range_ok tripped only on multi-match).

    The light total reads the [D, B] ``light`` plane (per-sub-range
    sums computed INSIDE the fori_loop body, where the counts are
    already live) — fetching or re-reducing the full counts plane cost
    ~25 s per call over the relay at 2^27/shard, and an eager post-hoc
    device reduce can RESOURCE_EXHAUST a loaded chip.  The int32
    partials are safe whenever ranged_rows_ok holds (counts are then
    all <= 1, so a partial is bounded by the sub-range capacity); under
    a multi-match trip they hold up to per-sub-range row counts of
    2^31, far past the escalation threshold."""
    light = int(np.sum(_fetch(res.light).astype(np.int64)))
    heavy = sum(len(r) * len(s)
                for r, s in heavy_row_blocks(res).values())
    return light + heavy


def make_distributed_join_ranged_rows(mesh: Mesh, n_r_shard: int,
                                      n_s_shard: int,
                                      cfg: JoinConfig = DEFAULT_CONFIG,
                                      local_ranges: int = 64,
                                      send_chunks: int = 1,
                                      range_slack: float = 1.35,
                                      skew_aware: bool = False,
                                      window_rows: int = 4,
                                      rows_per_group: int = 32,
                                      emit: str | None = None,
                                      k_drift: int = 8):
    """MATERIALISING fused ranged distributed join (round 5 — the rows
    form of :func:`make_distributed_join_ranged`; reference `probe` emits
    (rId, sId) pairs at claimed slots, kernels.cu:236-243, and its skew
    probes emit pairs too, kernels_optimized.cu:364-457).

    Same pipeline as the count variant — relabel-spread range partition,
    chunk-sorted send, fused fori_loop local rung over ``local_ranges``
    sub-ranges — with rids riding the pipeline end-to-end:

      * every chunk sort and every per-destination dynamic slice becomes
        a 2-operand (key, rid) form; the wire carries a rid plane next to
        each key plane (2x bytes — the reference ships packed 8 B
        CompressedTuples for exactly this, NetworkPartitioning.cpp:128-129),
      * the per-sub-range local rung sorts the assembled (key, rid)
        planes (small-operand sorts at the fused-executable rate) and
        runs the proven windowed emit kernel per range — dense per-R-row
        output, no flat receive sort, no output gathers,
      * heavy keys (sentinel-zone preimages + skew candidates) never
        cross the wire; their rows are emitted as per-side
        (candidate_index, rid) lists whose per-key cross products ARE the
        output — O(rows) storage for O(rows^2) join rows.

    ``emit``: "diagonal" runs the prep-free diagonal emit kernel per
    sub-range (per-row alignment derived in the band — no window-prep
    sorts; needs locally balanced sides, the relabeled light domain's
    home regime); "windowed" keeps the windowed emit kernel (exact
    per-row offsets — robust to side imbalance).  Default auto-selects:
    diagonal for balanced non-skew workloads, windowed when skew_aware
    (the heavy pre-pass removes mass ONE-sidedly, skewing |R|/|S| per
    range past the diagonal's slope tolerance) or when the shard sizes
    differ.  Either kernel's coverage trip flips range_ok -> checked
    escalation.

    Returns fn(r: Relation, s: Relation) -> :class:`DistributedRangedRows`;
    totals via :func:`total_distributed_rows_ranged`, heavy blocks via
    :func:`heavy_row_blocks`, validity via :func:`ranged_rows_ok`.
    """
    from ..config import next_multiple

    if emit is None:
        emit = "windowed" if (skew_aware or n_r_shard != n_s_shard) \
            else "diagonal"
    assert emit in ("diagonal", "windowed"), emit

    axis = cfg.mesh_axis
    n_dev = mesh.devices.size
    C = send_chunks
    B = local_ranges
    assert B >= 2, "local_ranges >= 2 (sub-edge arithmetic is uint32)"
    assert n_r_shard % C == 0 and n_s_shard % C == 0
    chunk_r = n_r_shard // C
    chunk_s = n_s_shard // C

    def chunk_cap(chunk):
        if n_dev == 1:
            return next_multiple(chunk, 128)
        import math
        return next_multiple(
            math.ceil(chunk / n_dev * cfg.allocation_factor), 128)

    cap_cr = chunk_cap(chunk_r)
    cap_cs = chunk_cap(chunk_s)
    n_seg = n_dev * C

    def sub_cap(chunk, cap_c):
        import math
        mean = max(1, math.ceil(chunk / (n_dev * B)))
        return min(next_multiple(math.ceil(mean * range_slack), 128),
                   next_multiple(cap_c, 128))

    cap_sr = sub_cap(chunk_r, cap_cr)
    cap_ss = sub_cap(chunk_s, cap_cs)
    cap_rng = n_seg * cap_sr      # assembled R rows per sub-range

    span = (1 << 32) // n_dev
    edges_np = np.minimum(np.arange(n_dev + 1, dtype=np.int64) * span,
                          _DOMAIN_END).astype(np.uint32)
    edges_np[n_dev] = np.uint32(_DOMAIN_END)
    dev_edges = jnp.asarray(edges_np)

    k_half = max(8, cfg.max_heavy_keys // (2 * n_dev))
    _inv = pow(0x9E3779B1, -1, 1 << 32)
    preimgs_np = np.array(
        [((_DOMAIN_END + i) * _inv) % (1 << 32) for i in range(16)],
        np.uint32)
    k_cand = (2 * k_half * n_dev + 16) if skew_aware else 16

    def shard_fn(rk, rr, sk, sr):
        my = jax.lax.axis_index(axis)

        # ---- phase 0: heavy rows out of the pipeline, as block lists ----
        fixed = skew_ops.HeavyHitters(jnp.asarray(preimgs_np),
                                      jnp.ones((16,), bool))
        if skew_aware:
            key = jax.random.fold_in(jax.random.key(0), my)
            kr, ks = jax.random.split(key)
            hh_r = skew_ops.detect_heavy_keys(rk, kr, k_half)
            hh_s = skew_ops.detect_heavy_keys(sk, ks, k_half)
            cand_keys = jax.lax.all_gather(
                jnp.concatenate([hh_r.keys, hh_s.keys]), axis).reshape(-1)
            cand_valid = jax.lax.all_gather(
                jnp.concatenate([hh_r.valid, hh_s.valid]), axis).reshape(-1)
            hh = skew_ops.dedup_heavy(skew_ops.HeavyHitters(
                jnp.concatenate([cand_keys, fixed.keys]),
                jnp.concatenate([cand_valid, fixed.valid])))
        else:
            hh = fixed
        drop_r = skew_ops.heavy_mask(rk, hh)
        drop_s = skew_ops.heavy_mask(sk, hh)

        # heavy (candidate_index, rid) lists by compaction sort — the
        # radix dense-skew rung's gather-free form (see
        # make_distributed_join materialize_dense + skew_aware)
        def compact_heavy(keys, rids, drop):
            eq = (keys[None, :] == hh.keys[:, None]) & hh.valid[:, None]
            hix = jnp.where(drop,
                            jnp.argmax(eq, axis=0).astype(jnp.int32),
                            jnp.int32(0x7FFFFFFF))
            cnt_h = jnp.sum(drop.astype(jnp.int32))
            six, srid = jax.lax.sort((hix, rids), num_keys=1,
                                     is_stable=False)
            return six, srid, cnt_h

        hr_ix, hr_rid, hr_cnt = compact_heavy(rk, rr, drop_r)
        hs_ix, hs_rid, hs_cnt = compact_heavy(sk, sr, drop_s)
        # heavy rows -> own-side sentinel (never sent); light keys
        # relabel through the spreading bijection
        rk = jnp.where(drop_r, jnp.uint32(0xFFFFFFFF),
                       rk * jnp.uint32(0x9E3779B1))
        sk = jnp.where(drop_s, jnp.uint32(0xFFFFFFFE),
                       sk * jnp.uint32(0x9E3779B1))

        # ---- phases 1+3: 2-operand chunk-sorted ranged send ----
        def ranged_send(keys, rids, C_, chunk, cap_c, sentinel):
            slot = jnp.arange(cap_c, dtype=jnp.int32)
            per_k = [[] for _ in range(n_dev)]
            per_v = [[] for _ in range(n_dev)]
            counts = jnp.zeros((n_dev,), jnp.int32)
            overflow = jnp.bool_(False)
            for c in range(C_):
                ck = jax.lax.slice_in_dim(keys, c * chunk, (c + 1) * chunk)
                cv = jax.lax.slice_in_dim(rids, c * chunk, (c + 1) * chunk)
                cs_, vv_ = jax.lax.sort((ck, cv), num_keys=1,
                                        is_stable=False)
                bnd = jnp.searchsorted(cs_, dev_edges).astype(jnp.int32)
                sizes = bnd[1:] - bnd[:-1]
                counts = counts + sizes
                overflow = overflow | jnp.any(sizes > jnp.int32(cap_c))
                src_k = jnp.concatenate(
                    [cs_, jnp.full((cap_c,), jnp.uint32(sentinel))])
                src_v = jnp.concatenate(
                    [vv_, jnp.zeros((cap_c,), jnp.uint32)])
                for d in range(n_dev):
                    slk = jax.lax.dynamic_slice_in_dim(src_k, bnd[d],
                                                       cap_c)
                    slv = jax.lax.dynamic_slice_in_dim(src_v, bnd[d],
                                                       cap_c)
                    inside = slot < sizes[d]
                    per_k[d].append(jnp.where(inside, slk,
                                              jnp.uint32(sentinel)))
                    per_v[d].append(jnp.where(inside, slv, jnp.uint32(0)))
            send_k = jnp.stack([jnp.concatenate(p) if C_ > 1 else p[0]
                                for p in per_k])
            send_v = jnp.stack([jnp.concatenate(p) if C_ > 1 else p[0]
                                for p in per_v])
            return send_k, send_v, counts, overflow

        send_rk, send_rv, counts_r, ovf_r = ranged_send(
            rk, rr, C, chunk_r, cap_cr, 0xFFFFFFFF)
        send_sk, send_sv, counts_s, ovf_s = ranged_send(
            sk, sr, C, chunk_s, cap_cs, 0xFFFFFFFE)
        recv_rk = jax.lax.all_to_all(send_rk, axis, 0, 0,
                                     tiled=False).reshape(n_seg, cap_cr)
        recv_rv = jax.lax.all_to_all(send_rv, axis, 0, 0,
                                     tiled=False).reshape(n_seg, cap_cr)
        recv_sk = jax.lax.all_to_all(send_sk, axis, 0, 0,
                                     tiled=False).reshape(n_seg, cap_cs)
        recv_sv = jax.lax.all_to_all(send_sv, axis, 0, 0,
                                     tiled=False).reshape(n_seg, cap_cs)

        # ---- local sub-range bounds + all-written invariant ----
        base = jax.lax.dynamic_index_in_dim(dev_edges, my, 0,
                                            keepdims=False)
        my_hi = jax.lax.dynamic_index_in_dim(dev_edges, my + 1, 0,
                                             keepdims=False)
        sspan = span // B
        sub = base + (jnp.arange(B, dtype=jnp.uint32)
                      * jnp.uint32(sspan))
        queries = jnp.concatenate(
            [sub, my_hi[None],
             jnp.full((1,), _DOMAIN_END, jnp.uint32)])  # [B+2]

        def seg_bounds(segs2d):
            return jax.vmap(
                lambda seg: jnp.searchsorted(seg, queries)
                .astype(jnp.int32))(segs2d)          # [n_seg, B+2]

        qb_r = seg_bounds(recv_rk)
        qb_s = seg_bounds(recv_sk)

        exp_r = jax.lax.psum(counts_r, axis)
        exp_s = jax.lax.psum(counts_s, axis)
        my_exp_r = jax.lax.dynamic_index_in_dim(exp_r, my, 0,
                                                keepdims=False)
        my_exp_s = jax.lax.dynamic_index_in_dim(exp_s, my, 0,
                                                keepdims=False)
        ok = ((jnp.sum(qb_r[:, B + 1]) == my_exp_r)
              & (jnp.sum(qb_s[:, B + 1]) == my_exp_s)
              & (jnp.sum(qb_r[:, 0]) == 0) & (jnp.sum(qb_s[:, 0]) == 0)
              & (jnp.sum(qb_r[:, B + 1] - qb_r[:, B]) == 0)
              & (jnp.sum(qb_s[:, B + 1] - qb_s[:, B]) == 0)
              & ~ovf_r & ~ovf_s)

        # ---- phase 4: fused fori_loop, per-range 2-op sort + emit ----
        flat_rk = jnp.concatenate(
            [recv_rk.reshape(-1),
             jnp.full((cap_sr,), jnp.uint32(0xFFFFFFFF))])
        flat_rv = jnp.concatenate(
            [recv_rv.reshape(-1), jnp.zeros((cap_sr,), jnp.uint32)])
        flat_sk = jnp.concatenate(
            [recv_sk.reshape(-1),
             jnp.full((cap_ss,), jnp.uint32(0xFFFFFFFE))])
        flat_sv = jnp.concatenate(
            [recv_sv.reshape(-1), jnp.zeros((cap_ss,), jnp.uint32)])

        def assemble(flat_k, flat_v, qb, cap_c, cap_sub, sentinel, rg):
            slot = jnp.arange(cap_sub, dtype=jnp.int32)
            parts_k, parts_v = [], []
            ok_rg = jnp.bool_(True)
            for seg in range(n_seg):
                start = jax.lax.dynamic_index_in_dim(qb[seg], rg, 0,
                                                     keepdims=False)
                end = jax.lax.dynamic_index_in_dim(qb[seg], rg + 1, 0,
                                                   keepdims=False)
                size = end - start
                ok_rg = ok_rg & (size <= jnp.int32(cap_sub))
                slk = jax.lax.dynamic_slice_in_dim(
                    flat_k, seg * cap_c + start, cap_sub)
                slv = jax.lax.dynamic_slice_in_dim(
                    flat_v, seg * cap_c + start, cap_sub)
                inside = slot < size
                parts_k.append(jnp.where(inside, slk,
                                         jnp.uint32(sentinel)))
                parts_v.append(jnp.where(inside, slv, jnp.uint32(0)))
            if n_seg > 1:
                return (jnp.concatenate(parts_k),
                        jnp.concatenate(parts_v), ok_rg)
            return parts_k[0], parts_v[0], ok_rg

        from ..utils.backend import pallas_interpret
        gr = 8 if pallas_interpret() else rows_per_group

        def body(rg, carry):
            rra, sra, cnta, lighta, oks = carry
            rk_a, rv_a, ok_r = assemble(flat_rk, flat_rv, qb_r, cap_cr,
                                        cap_sr, 0xFFFFFFFF, rg)
            sk_a, sv_a, ok_s = assemble(flat_sk, flat_sv, qb_s, cap_cs,
                                        cap_ss, 0xFFFFFFFE, rg)
            rbk, rrs = jax.lax.sort(
                (bias_keys(rk_a), rv_a.astype(jnp.int32)), num_keys=1,
                is_stable=False)
            sbk, srs = jax.lax.sort(
                (bias_keys(sk_a), sv_a.astype(jnp.int32)), num_keys=1,
                is_stable=False)
            if emit == "diagonal":
                from ..ops.buildprobe import join_materialize_diagonal
                out_srid, cnt, win_ok, multi = join_materialize_diagonal(
                    rbk, sbk, srs, k_drift=k_drift, rows_per_group=gr)
            else:
                out_srid, cnt, win_ok, multi = join_materialize_windowed(
                    rbk, sbk, srs, window_rows=window_rows,
                    rows_per_group=gr)
            ok_k = (ok_r & ok_s & win_ok & ~multi).astype(jnp.int32)
            return (jax.lax.dynamic_update_slice_in_dim(
                        rra, rrs.astype(jnp.uint32)[None], rg, 0),
                    jax.lax.dynamic_update_slice_in_dim(
                        sra, out_srid[None], rg, 0),
                    jax.lax.dynamic_update_slice_in_dim(
                        cnta, cnt[None], rg, 0),
                    jax.lax.dynamic_update_index_in_dim(
                        lighta, jnp.sum(cnt), rg, 0),
                    jax.lax.dynamic_update_index_in_dim(oks, ok_k, rg, 0))

        rra, sra, cnta, lighta, roks = jax.lax.fori_loop(
            0, B, body,
            (jnp.zeros((B, cap_rng), jnp.uint32),
             jnp.zeros((B, cap_rng), jnp.int32),
             jnp.zeros((B, cap_rng), jnp.int32),
             jnp.zeros((B,), jnp.int32),
             jnp.zeros((B,), jnp.int32)))
        return (rra[None], sra[None], cnta[None], lighta[None],
                roks[None], ok[None],
                hh.keys, hh.valid,
                hr_ix[None], hr_rid[None], hr_cnt[None],
                hs_ix[None], hs_rid[None], hs_cnt[None])

    sharded = NamedSharding(mesh, P(axis))
    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis),) * 4,
        out_specs=(P(axis),) * 6 + (P(), P()) + (P(axis),) * 6,
        check_vma=False)

    @jax.jit
    def run(r: Relation, s: Relation):
        rk = jax.lax.with_sharding_constraint(r.keys, sharded)
        rr = jax.lax.with_sharding_constraint(r.rids, sharded)
        sk = jax.lax.with_sharding_constraint(s.keys, sharded)
        sr = jax.lax.with_sharding_constraint(s.rids, sharded)
        return DistributedRangedRows(*mapped(rk, rr, sk, sr))

    return run


def make_distributed_join_ranged_rows_checked(mesh: Mesh, n_r_shard: int,
                                              n_s_shard: int,
                                              cfg: JoinConfig =
                                              DEFAULT_CONFIG, **kw):
    """Escalating form of :func:`make_distributed_join_ranged_rows`: a
    tripped sub-range (capacity, emit window, or multi-match R row) or
    all-written flag reruns the workload through the radix dense
    materialising rung with the skew pre-pass
    (make_distributed_join(materialize_dense=True, skew_aware=True) —
    multi-match mass concentrates in heavy keys, which that rung lifts
    into closed-form blocks).  Returns fn(r, s) -> (res, escalated) where
    ``res`` is :class:`DistributedRangedRows` or (escalated)
    :class:`DistributedJoinRowsDenseSkew` — the two share the heavy-block
    helpers and their totals functions agree.  Raises if the terminal
    rung itself trips (light-side multi-match below the heavy threshold:
    use make_distributed_join(materialize_max_out=...) with an explicit
    output bound)."""
    fast = make_distributed_join_ranged_rows(mesh, n_r_shard, n_s_shard,
                                             cfg, **kw)
    terminal = None

    def run(r: Relation, s: Relation):
        nonlocal terminal
        res = fast(r, s)
        if ranged_rows_ok(res):
            return res, False
        if terminal is None:
            terminal = make_distributed_join(
                mesh, n_r_shard, n_s_shard, cfg,
                materialize_dense=True, skew_aware=True)
        res2 = terminal(r, s)
        if not bool(np.all(_fetch(res2.ok))):
            raise RuntimeError(
                "dense materialising rung tripped after escalation — "
                "light-side multi-match rows; rerun with "
                "make_distributed_join(materialize_max_out=...)")
        return res2, True

    return run


class DistributedJoinRowsDenseSkew(NamedTuple):
    """Dense materialising output under the skew_aware pre-pass (round 5,
    reference probe_skew emits pairs, kernels_optimized.cu:364-457):
    light rows in the dense per-R-row form, heavy rows as per-side
    (candidate_index, rid) lists whose cross products per key ARE the
    heavy output — O(rows) storage for O(rows^2) join rows.  Assemble
    host-side with :func:`heavy_row_blocks`; totals via
    :func:`total_rows_dense_skew`."""
    r_rids: jnp.ndarray       # uint32[D * recv]  dense light rows
    s_rids: jnp.ndarray       # int32[D * recv]
    counts: jnp.ndarray       # int32[D * recv]
    ok: jnp.ndarray           # bool[D]
    heavy_keys: jnp.ndarray   # uint32[K]  replicated candidates
    heavy_valid: jnp.ndarray  # bool[K]
    hr_ix: jnp.ndarray        # int32[D * n_r_shard]  cand idx, sorted
    hr_rid: jnp.ndarray       # uint32[D * n_r_shard]
    hr_cnt: jnp.ndarray       # int32[D]  heavy R rows on shard d
    hs_ix: jnp.ndarray        # int32[D * n_s_shard]
    hs_rid: jnp.ndarray       # uint32[D * n_s_shard]
    hs_cnt: jnp.ndarray       # int32[D]


def heavy_row_blocks(res: DistributedJoinRowsDenseSkew) -> dict:
    """Host-side assembly of the heavy-key row blocks: {key: (r_rids,
    s_rids)} — the join rows of key k are the cross product
    r_rids x s_rids (reference probe_skew writes each pair explicitly,
    kernels_optimized.cu:440-449; the block form is the same information
    at O(rows) cost)."""
    ks = _fetch(res.heavy_keys)
    kv = _fetch(res.heavy_valid)
    n_dev = res.hr_cnt.shape[0]
    hr_cnt = _fetch(res.hr_cnt)
    hs_cnt = _fetch(res.hs_cnt)

    def side(ix_flat, rid_flat, cnts):
        # Heavy rows sort to the FRONT of the per-device plane (the
        # compaction sort keys non-heavy rows 0x7FFFFFFF), so only the
        # counted prefix needs to reach the host.  Prefix pulls matter:
        # the planes are statically full-shard-sized, and fetching them
        # whole cost ~20 s/side/call over the relay at 2^27/shard.
        # Multi-process arrays are not addressable per-slice from one
        # process — fall back to the allgather fetch there (DCN-local).
        if getattr(ix_flat, "is_fully_addressable", True):
            ix2d = ix_flat.reshape(n_dev, -1)
            rid2d = rid_flat.reshape(n_dev, -1)
            rows = [(np.asarray(ix2d[d, :int(cnts[d])]),
                     np.asarray(rid2d[d, :int(cnts[d])]))
                    for d in range(n_dev) if int(cnts[d])]
        else:
            ix_all = _fetch(ix_flat).reshape(n_dev, -1)
            rid_all = _fetch(rid_flat).reshape(n_dev, -1)
            rows = [(ix_all[d][:int(cnts[d])], rid_all[d][:int(cnts[d])])
                    for d in range(n_dev) if int(cnts[d])]
        per_key = {}
        for ix, rid in rows:
            for i in np.unique(ix):
                per_key.setdefault(int(i), []).append(rid[ix == i])
        return {i: np.concatenate(v) for i, v in per_key.items()}

    r_side = side(res.hr_ix, res.hr_rid, hr_cnt)
    s_side = side(res.hs_ix, res.hs_rid, hs_cnt)
    out = {}
    for i in set(r_side) | set(s_side):
        if not kv[i]:
            continue
        out[int(ks[i])] = (r_side.get(i, np.empty(0, np.uint32)),
                           s_side.get(i, np.empty(0, np.uint32)))
    return out


def total_rows_dense_skew(res: DistributedJoinRowsDenseSkew) -> int:
    """64-bit total join rows: dense light counts + heavy block products."""
    light = int(np.sum(_fetch(res.counts).astype(np.int64)))
    heavy = sum(len(r) * len(s)
                for r, s in heavy_row_blocks(res).values())
    return light + heavy


class DistributedJoin64Result(NamedTuple):
    """64-bit-key distributed join output (reference keys are uint64
    end-to-end, data/Tuple.h:15-22; the 32-bit path covers 4G domains)."""
    partial_matches: jnp.ndarray  # int32[D]
    ok: jnp.ndarray               # bool[D]
    global_hist_r: jnp.ndarray    # int32[P_net]
    global_hist_s: jnp.ndarray
    # mergecount64 rung's 15/15-bit block partials (zeros otherwise) —
    # same >2^31-safe recombination as the 32-bit terminal rung.
    merged_lo: jnp.ndarray        # int32[D, NB]
    merged_hi: jnp.ndarray        # int32[D, NB]
    heavy_cr: jnp.ndarray         # int32[D, K] owner-masked heavy R freqs
    heavy_cs: jnp.ndarray         # int32[D, K]


def total_distributed_matches64(res: DistributedJoin64Result) -> int:
    merged = (np.sum(_fetch(res.merged_lo).astype(np.int64))
              + (np.sum(_fetch(res.merged_hi).astype(np.int64)) << 15))
    heavy = np.sum(_fetch(res.heavy_cr).astype(np.int64)
                   * _fetch(res.heavy_cs).astype(np.int64))
    return int(np.sum(_fetch(res.partial_matches).astype(np.int64))
               + merged + heavy)


class DistributedJoin64RowsDense(NamedTuple):
    """Dense materialising 64-bit output (round 5): per shard, outputs
    align to the received R rows in joint dense-rank order — the 64-bit
    (hi, lo) keys of BOTH received sides are rank-encoded into one
    join-consistent uint32 surrogate (a concat 2-key sort + run-boundary
    cumsum: equal surrogates <=> equal 64-bit keys), and the proven
    single-plane windowed emit kernel runs on the surrogates.  The
    reference reaches the same effect by carrying its 8 B compressed
    word through every kernel (data/data.hpp:47); here the surrogate is
    narrower than the wire format, not wider."""
    r_rids: jnp.ndarray   # uint32[D * recv_r]
    s_rids: jnp.ndarray   # int32[D * recv_r]
    counts: jnp.ndarray   # int32[D * recv_r]
    ok: jnp.ndarray       # bool[D]


def make_distributed_join64(mesh: Mesh, n_r_shard: int, n_s_shard: int,
                            cfg: JoinConfig = DEFAULT_CONFIG,
                            local_probe: str = "diagonal64",
                            k_drift: int | None = None,
                            full_capacity: bool = False,
                            skew_aware: bool = False,
                            materialize_dense: bool = False):
    """4-phase distributed join over 64-bit (hi, lo)-plane keys — the
    wide-key mirror of :func:`make_distributed_join` (reference tuples
    carry uint64 keys, data/Tuple.h:15-22; its CompressedTuple wire format
    packs them to one 8 B word, NetworkPartitioning.cpp:128-129 — here the
    planes cross the ICI as separate all_to_all operands).

    Phase 1 hashes the LOW bits of the 64-bit key (lo-plane bits, the
    reference's ``key & 31`` HASH_BIT_MODULO, LocalHistogram.cpp:44-47);
    hashing hi bits would collapse every sub-4G key set onto one device.

    ``local_probe``: "diagonal64" (two-plane rank-diagonal kernel; its
    drift/coverage check can trip -> ok False) or "mergecount64" (terminal:
    concat-sort count with overflow-free 15/15-bit partials — exact under
    arbitrary skew/dup structure).  Returns fn(r64, s64) over
    plane-sharded :class:`~radixjoin_tpu.ops.wide.Relation64` inputs.
    """
    axis = cfg.mesh_axis
    n_dev = mesh.devices.size
    net_bits = cfg.network_fanout_bits
    p_net = 1 << net_bits
    assert p_net >= n_dev
    if full_capacity:
        from ..config import next_multiple
        cap_r = next_multiple(n_r_shard, 128)
        cap_s = next_multiple(n_s_shard, 128)
    else:
        cap_r = cfg.shuffle_capacity(n_r_shard, n_dev)
        cap_s = cfg.shuffle_capacity(n_s_shard, n_dev)
    k = k_drift if k_drift is not None else cfg.diagonal_k
    k_half = max(8, cfg.max_heavy_keys // (2 * n_dev))
    k_cand = 2 * k_half * n_dev if skew_aware else 1

    def shard_fn(rh, rl, rr, sh, sl, sr):
        # ---- phase 0 (optional): 64-bit heavy-hitter pre-pass, the
        # pair-exact mirror of the 32-bit phase 0 (reference skew kernels
        # act on the 8 B data words whatever the key width,
        # kernels_optimized.cu:301-457 / data.hpp:47) ----
        heavy_cr = jnp.zeros((k_cand,), jnp.int32)
        heavy_cs = jnp.zeros((k_cand,), jnp.int32)
        drop_r = drop_s = None
        if skew_aware:
            my0 = jax.lax.axis_index(axis)
            key0 = jax.random.fold_in(jax.random.key(1), my0)
            kr0, ks0 = jax.random.split(key0)
            hh_r = skew_ops.detect_heavy_keys64(rh, rl, kr0, k_half)
            hh_s = skew_ops.detect_heavy_keys64(sh, sl, ks0, k_half)
            ch = jax.lax.all_gather(jnp.concatenate(
                [hh_r.key_hi, hh_s.key_hi]), axis).reshape(-1)
            cl = jax.lax.all_gather(jnp.concatenate(
                [hh_r.key_lo, hh_s.key_lo]), axis).reshape(-1)
            cv = jax.lax.all_gather(jnp.concatenate(
                [hh_r.valid, hh_s.valid]), axis).reshape(-1)
            hh = skew_ops.dedup_heavy64(
                skew_ops.HeavyHitters64(ch, cl, cv))
            cr = jax.lax.psum(skew_ops.count_exact64(rh, rl, hh), axis)
            heavy_cs = jax.lax.psum(skew_ops.count_exact64(sh, sl, hh),
                                    axis)
            owner = (jnp.arange(k_cand, dtype=jnp.int32)
                     % jnp.int32(n_dev))
            heavy_cr = jnp.where(owner == my0, cr, 0)
            drop_r = skew_ops.heavy_mask64(rh, rl, hh)
            drop_s = skew_ops.heavy_mask64(sh, sl, hh)

        # ---- phase 1: histograms on the 64-bit key's low bits ----
        pid_r = radix_bits(rl, net_bits)
        pid_s = radix_bits(sl, net_bits)
        if drop_r is not None:
            pid_r = jnp.where(drop_r, jnp.int32(p_net), pid_r)
            pid_s = jnp.where(drop_s, jnp.int32(p_net), pid_s)
        meta_r = compute_metadata(pid_r, p_net, axis)
        meta_s = compute_metadata(pid_s, p_net, axis)

        # ---- phase 3: (hi, lo, rid) planes over the ICI ----
        pid_r_c = jnp.minimum(pid_r, p_net - 1)
        pid_s_c = jnp.minimum(pid_s, p_net - 1)
        shuf_r = shuffle_multi((rh, rl, rr), meta_r.assignment[pid_r_c],
                               cap_r, axis, drop_r)
        shuf_s = shuffle_multi((sh, sl, sr), meta_s.assignment[pid_s_c],
                               cap_s, axis, drop_s)

        # all-written invariant, per relation (data/Window.cpp:180-191)
        my_dev = jax.lax.axis_index(axis)
        ok = ((jnp.sum(shuf_r.valid.astype(jnp.int32))
               == jnp.sum(jnp.where(meta_r.assignment == my_dev,
                                    meta_r.global_hist, 0)))
              & (jnp.sum(shuf_s.valid.astype(jnp.int32))
                 == jnp.sum(jnp.where(meta_s.assignment == my_dev,
                                      meta_s.global_hist, 0)))
              & ~shuf_r.overflow & ~shuf_s.overflow)

        # ---- phase 4: local 64-bit probe ----
        # Invalid slots -> side-distinct out-of-domain sentinels (64-bit
        # key domain is [0, 2^64 - 16)): R pad (FFFFFFFF, FFFFFFFF),
        # S pad (FFFFFFFF, FFFFFFFE) — they sort to the tail and can
        # never cross-match.
        from ..utils.backend import pallas_interpret
        rhv, rlv, rrv = shuf_r.operands
        shv, slv, srv = shuf_s.operands
        if materialize_dense:
            # Dense 64-bit materialising rung via JOINT DENSE-RANK
            # surrogates: concat both sides, one 2-key sort, run-boundary
            # cumsum assigns every distinct (hi, lo) one uint32 group id
            # (equal gid <=> equal 64-bit key); a second sort splits the
            # sides back in gid order and the proven single-plane
            # windowed emit kernel runs on the surrogates.  Pad groups
            # map onto the engine's standard R/S pad sentinels.
            from ..ops.wide import dense_rank_surrogates
            rh_m = jnp.where(shuf_r.valid, rhv, jnp.uint32(0xFFFFFFFF))
            rl_m = jnp.where(shuf_r.valid, rlv, jnp.uint32(0xFFFFFFFF))
            sh_m = jnp.where(shuf_s.valid, shv, jnp.uint32(0xFFFFFFFF))
            sl_m = jnp.where(shuf_s.valid, slv, jnp.uint32(0xFFFFFFFE))
            rbk, rrs, sbk, srs = dense_rank_surrogates(
                rh_m, rl_m, rrv, sh_m, sl_m, srv)
            out_srid, cnt, win_ok, multi = join_materialize_windowed(
                rbk, sbk, srs,
                rows_per_group=8 if pallas_interpret() else 32)
            row_ok = ok & win_ok & ~multi
            return (rrs.astype(jnp.uint32)[None], out_srid[None],
                    cnt[None], row_ok[None])
        if local_probe == "mergecount64":
            rh_m = jnp.where(shuf_r.valid, rhv, jnp.uint32(0xFFFFFFFF))
            rl_m = jnp.where(shuf_r.valid, rlv, jnp.uint32(0xFFFFFFFF))
            sh_m = jnp.where(shuf_s.valid, shv, jnp.uint32(0xFFFFFFFF))
            sl_m = jnp.where(shuf_s.valid, slv, jnp.uint32(0xFFFFFFFE))
            lo, hi = _merged_partials64(rh_m, rl_m, sh_m, sl_m)
            return (jnp.zeros((1,), jnp.int32), ok[None],
                    meta_r.global_hist, meta_s.global_hist,
                    lo[None], hi[None],
                    heavy_cr[None], heavy_cs[None])
        assert local_probe == "diagonal64", local_probe
        rbh, rbl = jax.lax.sort(
            (bias_keys(rhv, ~shuf_r.valid, 0xFFFFFFFF),
             bias_keys(rlv, ~shuf_r.valid, 0xFFFFFFFF)),
            num_keys=2, is_stable=False)
        sbh, sbl = jax.lax.sort(
            (bias_keys(shv, ~shuf_s.valid, 0xFFFFFFFF),
             bias_keys(slv, ~shuf_s.valid, 0xFFFFFFFE)),
            num_keys=2, is_stable=False)
        matches, okp = probe_count_diagonal64(
            rbh, rbl, sbh, sbl, k_drift=k,
            rows_per_group=8 if pallas_interpret() else
            cfg.diagonal_rows_per_group)
        return (matches[None].astype(jnp.int32), (ok & okp)[None],
                meta_r.global_hist, meta_s.global_hist,
                jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.int32),
                heavy_cr[None], heavy_cs[None])

    assert not (materialize_dense and skew_aware), (
        "64-bit dense + skew row blocks not combined yet: heavy rows "
        "would be silently dropped from the output; use the 32-bit "
        "dense-skew rung or count-only skew for 64-bit keys")
    sharded = NamedSharding(mesh, P(axis))
    out_specs = (P(axis),) * 4 if materialize_dense else \
        (P(axis), P(axis), P(), P(), P(axis), P(axis), P(axis), P(axis))
    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis),) * 6,
        out_specs=out_specs,
        check_vma=False,
    )

    @jax.jit
    def run(r: Relation64, s: Relation64):
        args = [jax.lax.with_sharding_constraint(a, sharded)
                for a in (r.key_hi, r.key_lo, r.rids,
                          s.key_hi, s.key_lo, s.rids)]
        if materialize_dense:
            return DistributedJoin64RowsDense(*mapped(*args))
        return DistributedJoin64Result(*mapped(*args))

    return run


def make_distributed_join64_checked(mesh: Mesh, n_r_shard: int,
                                    n_s_shard: int,
                                    cfg: JoinConfig = DEFAULT_CONFIG,
                                    **kw):
    """64-bit mirror of :func:`make_distributed_join_checked`: diagonal64
    fast path; any shard's ok=False (shuffle overflow, diagonal drift /
    degenerate-hi coverage trip) reruns through the terminal rung —
    full-capacity shuffle + mergecount64 partials — which cannot overflow
    by construction.  Returns fn(r64, s64) -> (matches: int, escalated)."""
    fast = make_distributed_join64(mesh, n_r_shard, n_s_shard, cfg, **kw)
    terminal = None

    def run(r: Relation64, s: Relation64):
        nonlocal terminal
        res = fast(r, s)
        if bool(np.all(np.asarray(res.ok))):
            return total_distributed_matches64(res), False
        if terminal is None:
            terminal = make_distributed_join64(
                mesh, n_r_shard, n_s_shard, cfg,
                local_probe="mergecount64", full_capacity=True)
        res = terminal(r, s)
        assert bool(np.all(np.asarray(res.ok))), (
            "all-written invariant failed in the terminal rung")
        return total_distributed_matches64(res), True

    return run


def make_distributed_join_checked(mesh: Mesh, n_r_shard: int,
                                  n_s_shard: int,
                                  cfg: JoinConfig = DEFAULT_CONFIG,
                                  **kw):
    """Distributed join with overflow ESCALATION — the mesh-level mirror of
    ``join_count_checked`` (engine/join.py): run the configured fast join;
    if any shard reports ok=False (shuffle-capacity overflow, probe
    tier/window overflow, or a tripped diagonal coverage check), rerun
    through the terminal rung — full-capacity shuffle + per-shard
    mergecount — which cannot overflow by construction.

    The reference has no such recovery: its invariant violations abort the
    rank (data/Window.cpp:180-191, utils/Debug.h:27-37).  Here no input can
    yield a wrong count: the answer is exact or the run escalates.

    Returns ``fn(r, s) -> (total_matches: int, escalated: bool)``.  The
    terminal executable is compiled lazily on first escalation.
    """
    assert kw.get("materialize_max_out") is None, (
        "make_distributed_join_checked is a counts-only contract: the "
        "terminal mergecount rung cannot emit rows, so escalation would "
        "silently swap row output for a count")
    fast = make_distributed_join(mesh, n_r_shard, n_s_shard, cfg, **kw)
    skew = kw.get("skew_aware", False)
    terminal = None

    def run(r: Relation, s: Relation):
        nonlocal terminal
        res = fast(r, s)
        if bool(np.all(np.asarray(res.ok))):
            return total_distributed_matches(res), False
        if terminal is None:
            terminal = make_distributed_join(
                mesh, n_r_shard, n_s_shard, cfg,
                local_probe="mergecount", full_capacity=True,
                skew_aware=skew)
        res = terminal(r, s)
        assert bool(np.all(np.asarray(res.ok))), (
            "all-written invariant failed in the terminal rung")
        return total_distributed_matches(res), True

    return run
