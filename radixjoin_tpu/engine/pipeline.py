"""Composed query pipelines: filter -> join -> aggregate.

The north-star pipeline config (BASELINE.json: "Pipeline query: filter ->
hash join -> hash aggregate (TPC-H-style lineitem><orders, SF100)").  The
reference engine hard-wires exactly one query shape (the equi-join,
main.cpp:116-126); this module composes the extended operator set into the
canonical analytics pipeline.

Two execution strategies:
  - **fast** (default attempt): sort both filtered sides and run the
    Pallas windowed emit kernel (ops/buildprobe.join_materialize_windowed)
    — scatter-free materialisation with a dense per-fact-row output, no
    static output bound.  Counting aggregations hold under any match rate
    (the kernel's per-row counts are exact); payload aggregations
    (``value_of``) additionally need each fact row to match at most one
    dim row (the dominant analytics shape) — anything else flips ok.
  - **reference fallback**: the XLA searchsorted/gather materialisation
    with a static ``max_out`` bound (join_materialize) — always correct,
    gather-bound.

Filters are fused as masks in both paths: filtered-out rows keep their
storage but are excluded via a key rewrite to per-side non-joining shadow
domains, so no compaction pass is needed.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import JoinConfig, DEFAULT_CONFIG
from ..data.tuples import Relation
from ..ops.aggregate import aggregate_sum, aggregate_sum_sorted
from ..ops.buildprobe import (bias_keys, join_materialize,
                              join_materialize_windowed,
                              join_materialize_windowed_multi)
from ..ops.filter import filter_mask
from ..utils.backend import pallas_interpret


class PipelineResult(NamedTuple):
    group_keys: jnp.ndarray   # uint32[max_groups]
    group_sums: jnp.ndarray   # int32/float32[max_groups]
    group_valid: jnp.ndarray  # bool[max_groups]
    n_groups: jnp.ndarray     # int32
    join_count: jnp.ndarray   # int32 (pre-aggregate join cardinality)


def _shadow_keys(r: Relation, s: Relation, r_pred, s_pred):
    """Apply filters as key rewrites into disjoint non-joining domains.

    R-filtered rows map into [0x80000000, 0x8FFFFFFF], S-filtered into
    [0xC0000000, 0xCFFFFFFF] (low 28 bits kept for stable ordering).  The
    ranges are disjoint from each other, from live keys (documented < 2^31
    for pipeline queries; TPC-H key spaces fit), and from the engine's
    padding sentinels (0xFFFFFFFE/F), so no masked row can ever join.
    """
    rk, sk = r.keys, s.keys
    keep_r = filter_mask(r, r_pred) if r_pred is not None else \
        jnp.ones_like(rk, dtype=bool)
    keep_s = filter_mask(s, s_pred) if s_pred is not None else \
        jnp.ones_like(sk, dtype=bool)
    mask28 = jnp.uint32(0x0FFFFFFF)
    rk = jnp.where(keep_r, rk, jnp.uint32(0x80000000) | (rk & mask28))
    sk = jnp.where(keep_s, sk, jnp.uint32(0xC0000000) | (sk & mask28))
    return rk, sk


@functools.partial(jax.jit, static_argnames=("r_pred", "s_pred",
                                             "max_groups", "value_of"))
def _fja_fast(r: Relation, s: Relation, r_pred, s_pred, max_groups: int,
              value_of):
    """Fast path: S (the fact side) drives the windowed emit kernel against
    R (the dim side).  Returns (PipelineResult, ok)."""
    rk, sk = _shadow_keys(r, s, r_pred, s_pred)
    # fact = s (many side), dim = r (<=1 match per fact row when r's join
    # key is unique post-filter)
    fk, frid = jax.lax.sort((bias_keys(sk), s.rids), num_keys=1)
    dk, drid = jax.lax.sort((bias_keys(rk), r.rids), num_keys=1)
    # Interpret mode (CPU tests) traces the unrolled kernel body per grid
    # step; a smaller group keeps compile time sane.
    gr = 8 if pallas_interpret() else 32
    out_drid, cnt, win_ok, multi = join_materialize_windowed(
        fk, dk, drid, rows_per_group=gr)

    total = jnp.sum(cnt)
    out_key = jax.lax.bitcast_convert_type(fk, jnp.uint32) \
        ^ jnp.uint32(0x80000000)
    if value_of is None:
        # Counting aggregation: the kernel's per-fact-row counts are exact
        # under ANY match rate (multi-match dim keys included), so the
        # fast path holds whenever the windows covered — no gather
        # fallback needed (cf. the reference's probe_match_rate multi-round
        # protocol, kernels.cu:376-403, which this sidesteps entirely).
        valid = cnt > 0
        values = cnt
        ok = win_ok
    else:
        # Payload aggregation reads the emitted dim rid, which is a
        # rid-sum where cnt > 1 — only the unique-match shape is safe.
        valid = cnt == 1
        values = jnp.where(valid,
                           value_of(out_drid.astype(jnp.uint32), frid), 0)
        ok = win_ok & ~multi
    # The emit kernel's output is already in sorted-key order: aggregate
    # over runs directly (no re-sort), skipping unmatched rows so they
    # can't flood max_groups.
    gk, gs, gvalid, _ = aggregate_sum_sorted(out_key, values, valid,
                                             max_groups)
    return PipelineResult(gk, gs, gvalid,
                          jnp.sum(gvalid.astype(jnp.int32)), total), ok


@functools.partial(jax.jit, static_argnames=("r_pred", "s_pred",
                                             "max_groups", "value_of",
                                             "max_matches"))
def _fja_multi(r: Relation, s: Relation, r_pred, s_pred, max_groups: int,
               value_of, max_matches: int = 4):
    """Middle rung for payload aggregations with multi-match dim keys:
    the M-plane windowed emit kernel materialises up to ``max_matches``
    dim rids per fact row, and the aggregation sums value_of over the
    valid planes.  ok=False when windows overflowed or some fact row
    matched more than ``max_matches`` dim rows — escalate to the gather
    fallback (which is always correct but ~6x slower at pipeline scale).
    """
    rk, sk = _shadow_keys(r, s, r_pred, s_pred)
    fk, frid = jax.lax.sort((bias_keys(sk), s.rids), num_keys=1)
    dk, drid = jax.lax.sort((bias_keys(rk), r.rids), num_keys=1)
    gr = 8 if pallas_interpret() else 32
    rid_planes, cnt, win_ok, overflow = join_materialize_windowed_multi(
        fk, dk, drid, max_matches=max_matches, rows_per_group=gr)

    total = jnp.sum(cnt)
    out_key = jax.lax.bitcast_convert_type(fk, jnp.uint32) \
        ^ jnp.uint32(0x80000000)
    valid = cnt > 0
    plane_ix = jnp.arange(max_matches, dtype=jnp.int32)[:, None]
    per_plane = jnp.where(plane_ix < cnt[None, :],
                          value_of(rid_planes.astype(jnp.uint32),
                                   frid[None, :]), 0)
    values = jnp.sum(per_plane, axis=0)
    ok = win_ok & ~overflow
    gk, gs, gvalid, _ = aggregate_sum_sorted(out_key, values, valid,
                                             max_groups)
    return PipelineResult(gk, gs, gvalid,
                          jnp.sum(gvalid.astype(jnp.int32)), total), ok


@functools.partial(jax.jit, static_argnames=("r_pred", "s_pred", "max_out",
                                             "max_groups", "value_of"))
def _fja_reference(r: Relation, s: Relation, r_pred, s_pred, max_out: int,
                   max_groups: int, value_of) -> PipelineResult:
    """Always-correct fallback: XLA sort-merge materialisation with a
    static output bound (reference `probe` semantics, kernels.cu:199-246).
    """
    rk, sk = _shadow_keys(r, s, r_pred, s_pred)
    out_r, out_s, out_key, valid, total = join_materialize(
        rk, r.rids, sk, s.rids, max_out)
    out_key = jnp.where(valid, out_key, jnp.uint32(0xFFFFFFFF))
    if value_of is None:
        values = valid.astype(jnp.int32)
    else:
        values = jnp.where(valid, value_of(out_r, out_s), 0)
    gk, gs, gvalid, ng = aggregate_sum(out_key, values, max_groups)
    real = gvalid & (gk != jnp.uint32(0xFFFFFFFF))
    return PipelineResult(gk, gs, real, jnp.sum(real.astype(jnp.int32)),
                          total)


def filter_join_aggregate(r: Relation, s: Relation,
                          r_pred: Callable | None,
                          s_pred: Callable | None,
                          max_out: int,
                          max_groups: int,
                          value_of: Callable | None = None
                          ) -> PipelineResult:
    """SELECT r.key, SUM(value) FROM r JOIN s USING(key)
       WHERE r_pred(r) AND s_pred(s) GROUP BY join key.

    - ``value_of(r_rid, s_rid) -> value`` defaults to counting (value 1).
    - Tries the Pallas fast path first; for payload aggregations where a
      fact row matched more than one dim row, retries with the M-plane
      multi-match emit kernel (up to 4 dim rids per fact row); only
      window overflow or match rates beyond that fall back to the
      reference materialisation bounded by ``max_out``.
    """
    res, ok = _fja_fast(r, s, r_pred, s_pred, max_groups, value_of)
    if bool(ok):
        return res
    if value_of is not None:
        res, ok = _fja_multi(r, s, r_pred, s_pred, max_groups, value_of)
        if bool(ok):
            return res
    return _fja_reference(r, s, r_pred, s_pred, max_out, max_groups,
                          value_of)


@functools.partial(jax.jit,
                   static_argnames=("r_src", "s_src", "runs", "domain",
                                    "nf", "nd", "max_groups", "value_of",
                                    "max_matches", "r_pred", "s_pred"))
def _fja_ranged_fused(r_src, s_src, runs: int, domain: int, nf: int,
                      nd: int, max_groups: int, value_of, max_matches,
                      r_pred, s_pred):
    """The ENTIRE ranged pipeline as one XLA executable: a fori_loop over
    runs whose body generates one run (traced sources), applies filters,
    sorts both sides, runs the windowed emit kernel (M-plane when
    ``max_matches`` is set) and the sorted-order compaction aggregate —
    per-run group tables land in [runs, max_groups] slabs.

    Why (round-5 application of the round-4 fused-join lesson to the
    pipeline, VERDICT r4 item 5): per-run groups are DISJOINT by the
    range-partition construction, so the aggregate needs no cross-run
    merge and can live inside the same loop step as the emit; and many
    small runs put every sort (the pipeline's dominant cost: fact sort +
    the aggregate's compaction sort) in XLA's ~0.8-1.3 ns/elem
    small-operand regime instead of 1.85+ at 2^28, with zero per-run
    dispatch round-trips.

    Sources must be traceable in the run index: ``fn(k, runs) ->
    (keys, rids)`` built from jnp ops on ``k``.  Returns (gk[runs, G],
    gs[runs, G], gvalid[runs, G] int32, counts[runs] int32,
    oks[runs] int32).  ``oks`` covers window/multi/overflow flags, the
    per-run group-capacity bound AND (when preds are None) the on-device
    range claim; a 0 entry means that run must be recomputed through the
    unfused ladder (see filter_join_aggregate_ranged_fused).
    """
    span = domain // runs
    gr = 8 if pallas_interpret() else 32

    def bias_const_u(u):
        return jax.lax.bitcast_convert_type(
            u ^ jnp.uint32(0x80000000), jnp.int32)

    def body(k, carry):
        gk_a, gs_a, gv_a, cnt_a, ok_a = carry
        rk_raw, rr = r_src(k, runs)
        sk_raw, sr = s_src(k, runs)
        r = Relation(rk_raw, rr)
        s = Relation(sk_raw, sr)
        rk, sk = _shadow_keys(r, s, r_pred, s_pred)
        fk, frid = jax.lax.sort((bias_keys(sk), s.rids), num_keys=1)
        dk, drid = jax.lax.sort((bias_keys(rk), r.rids), num_keys=1)

        base = jnp.uint32(k.astype(jnp.uint32)) * jnp.uint32(span)
        lo_b = bias_const_u(base)
        hi_b = bias_const_u(base + jnp.uint32(span - 1))
        if r_pred is None and s_pred is None:
            in_range = ((fk[0] >= lo_b) & (fk[nf - 1] <= hi_b)
                        & (dk[0] >= lo_b) & (dk[nd - 1] <= hi_b))
        else:
            # filtered rows occupy shadow domains above every live key;
            # the range claim is the caller's contract here
            in_range = jnp.bool_(True)

        if max_matches is None:
            out_drid, cnt, win_ok, multi = join_materialize_windowed(
                fk, dk, drid, rows_per_group=gr)
            ok = win_ok if value_of is None else (win_ok & ~multi)
            valid = (cnt > 0) if value_of is None else (cnt == 1)
            values = cnt if value_of is None else jnp.where(
                valid, value_of(out_drid.astype(jnp.uint32), frid), 0)
        else:
            rid_planes, cnt, win_ok, overflow = \
                join_materialize_windowed_multi(
                    fk, dk, drid, max_matches=max_matches,
                    rows_per_group=gr)
            ok = win_ok & ~overflow
            valid = cnt > 0
            if value_of is None:
                values = cnt
            else:
                plane_ix = jnp.arange(max_matches,
                                      dtype=jnp.int32)[:, None]
                per_plane = jnp.where(
                    plane_ix < cnt[None, :],
                    value_of(rid_planes.astype(jnp.uint32),
                             frid[None, :]), 0)
                values = jnp.sum(per_plane, axis=0)

        out_key = jax.lax.bitcast_convert_type(fk, jnp.uint32) \
            ^ jnp.uint32(0x80000000)
        gk, gs, gvalid, n_groups = aggregate_sum_sorted(
            out_key, values, valid, max_groups)
        ok_k = (ok & in_range
                & (n_groups <= max_groups)).astype(jnp.int32)
        return (jax.lax.dynamic_update_slice_in_dim(gk_a, gk[None], k, 0),
                jax.lax.dynamic_update_slice_in_dim(gs_a, gs[None], k, 0),
                jax.lax.dynamic_update_slice_in_dim(
                    gv_a, gvalid.astype(jnp.int32)[None], k, 0),
                jax.lax.dynamic_update_index_in_dim(
                    cnt_a, jnp.sum(cnt), k, 0),
                jax.lax.dynamic_update_index_in_dim(ok_a, ok_k, k, 0))

    G = max_groups
    return jax.lax.fori_loop(
        0, runs, body,
        (jnp.zeros((runs, G), jnp.uint32), jnp.zeros((runs, G), jnp.int32),
         jnp.zeros((runs, G), jnp.int32), jnp.zeros((runs,), jnp.int32),
         jnp.zeros((runs,), jnp.int32)))


def filter_join_aggregate_ranged_fused(r_source, s_source, runs: int,
                                       domain: int, nf: int, nd: int,
                                       max_groups: int,
                                       value_of=None, max_matches=None,
                                       r_pred=None, s_pred=None,
                                       max_out: int | None = None,
                                       consume=None):
    """Fused-executable ranged pipeline (see :func:`_fja_ranged_fused`)
    with per-run escalation: any run whose ok flag tripped (window
    overflow, match rate beyond ``max_matches``, group capacity, range
    claim) is recomputed through the unfused per-run ladder
    (emit -> M-plane -> gather fallback bounded by ``max_out``).

    ``nf``/``nd``: static fact/dim rows per run (source output shapes).
    Returns (total_join_rows, n_groups_total, ok) like
    :func:`filter_join_aggregate_ranged_runs`; ``consume(k, gk, gs,
    gvalid)`` receives each run's group slab on device if given.
    """
    gk_a, gs_a, gv_a, cnt_a, ok_a = _fja_ranged_fused(
        r_source, s_source, runs, domain, nf, nd, max_groups, value_of,
        max_matches, r_pred, s_pred)
    import numpy as np
    oks = np.asarray(jax.device_get(ok_a))
    counts = np.asarray(jax.device_get(cnt_a), dtype=np.int64)
    # ONE device reduction + pull for all clean runs' group counts — a
    # per-run jnp.sum pull is a relay round-trip each (~30-50 ms x runs,
    # measured ~4 s/rep at 128 runs before this batching)
    per_run_groups = np.asarray(jax.device_get(
        jax.jit(lambda gv: jnp.sum(gv, axis=1))(gv_a)))
    total = 0
    n_groups = 0
    for k in range(runs):
        if oks[k] == 1:
            total += int(counts[k])
            n_groups += int(per_run_groups[k])
            if consume is not None:
                consume(k, gk_a[k], gs_a[k], gv_a[k])
            continue
        # escalate this run through the unfused ladder
        rk, rr = r_source(jnp.int32(k), runs)
        sk, sr = s_source(jnp.int32(k), runs)
        r = Relation(rk, rr)
        s = Relation(sk, sr)
        res, ok = _fja_fast(r, s, r_pred, s_pred, max_groups, value_of)
        if not bool(ok) and value_of is not None:
            res, ok = _fja_multi(r, s, r_pred, s_pred, max_groups,
                                 value_of,
                                 max_matches=max_matches or 4)
        if not bool(ok):
            assert max_out is not None, (
                "run escalated to the gather fallback but no max_out "
                "bound was given")
            res = _fja_reference(r, s, r_pred, s_pred, max_out,
                                 max_groups, value_of)
        total += int(res.join_count)
        n_groups += int(res.n_groups)
        if consume is not None:
            consume(k, res.group_keys, res.group_sums, res.group_valid)
    return total, n_groups, True


def filter_join_aggregate_ranged_runs(r_source, s_source, runs: int,
                                      domain: int,
                                      r_pred, s_pred,
                                      max_out: int, max_groups: int,
                                      value_of=None,
                                      consume=None,
                                      max_matches: int = 4,
                                      sync=None):
    """The pipeline at beyond-sort-cap scale (TPC-H SF100-ish: ~600M fact
    rows) via value-range-partitioned runs — the pipeline sibling of
    ``engine.large.join_count_keys_runs(ranged_domain=...)``.

    ``r_source``/``s_source``: ``fn(run, n_runs) -> (keys, rids)`` where
    run k holds only join keys in [k*domain/runs, (k+1)*domain/runs)
    (checked on device per run: min/max of the raw keys vs the bounds —
    a violated claim returns ok=False).  Because GROUP BY is on the join
    key, every group lives in exactly ONE run: per-run aggregates are
    disjoint and simply concatenate — no cross-run merge, no global
    re-aggregation (the distributed join's partition-ownership argument,
    parallel/metadata.py, applied to query composition).

    Each run escalates independently through the engine ladder
    (windowed emit -> M-plane -> gather fallback).  ``consume(k,
    PipelineResult)`` receives each run's groups while still on device;
    returns (total_join_rows, n_groups_total, ok).
    """
    sync = sync or (lambda x: None)
    assert domain % runs == 0
    span = domain // runs

    bounds_check = jax.jit(
        lambda k, lo, hi: (jnp.min(k) >= lo) & (jnp.max(k) <= hi))

    total = 0
    n_groups = 0
    all_ok = True
    for k in range(runs):
        rk, rr = r_source(k, runs)
        sk, sr = s_source(k, runs)
        rin = bounds_check(rk, jnp.uint32(k * span),
                           jnp.uint32((k + 1) * span - 1))
        sin = bounds_check(sk, jnp.uint32(k * span),
                           jnp.uint32((k + 1) * span - 1))
        r = Relation(rk, rr)
        s = Relation(sk, sr)
        res, ok = _fja_fast(r, s, r_pred, s_pred, max_groups, value_of)
        if not bool(ok) and value_of is not None:
            res, ok = _fja_multi(r, s, r_pred, s_pred, max_groups,
                                 value_of, max_matches=max_matches)
        if not bool(ok):
            res = _fja_reference(r, s, r_pred, s_pred, max_out,
                                 max_groups, value_of)
            ok = jnp.bool_(True)
        sync(res.join_count)
        all_ok = all_ok and bool(rin) and bool(sin)
        total += int(res.join_count)
        n_groups += int(res.n_groups)
        if consume is not None:
            consume(k, res)
    return total, n_groups, all_ok
