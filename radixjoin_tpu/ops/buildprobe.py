"""Per-partition join build/probe kernels.

TPU-native replacement for the reference's local-join machinery:
  - CPU bucket-chained hash table (tasks/BuildProbe.cpp:47-118): calloc'd
    ``hashTableBucket``/``hashTableNext`` chains, pointer-chasing probe,
    count-only result into the static RESULT_COUNTER.
  - GPU bucketed build/probe (operators/gpu/eth.cu:25-109 build/probe_kernel_eth,
    eth.cu:237-376 fused shared-memory variant), count-only probes
    (kernels.cu:423-463 probe_count), materialising probes
    (kernels.cu:199-246 probe, kernels.cu:314-411 probe_match_rate).

A chained hash walk serialises on a TPU, so the probe is re-cast in two
vector-friendly forms:

  * **Tiled broadcast-compare** (Pallas, `probe_count_partitioned`): after
    radix partitioning the mean partition fits VMEM; each grid step compares a
    lane-tile of S keys against the whole R partition on the VPU and reduces.
    This is the moral equivalent of the GPU's block-per-partition probe with
    the R partition in ``__shared__`` (kernels.cu:199-246) — VMEM plays the
    role of shared memory, the 8x128 VPU the role of the warp.
  * **Sort-merge** (`probe_count_sorted` / `join_materialize`): with both
    sides key-sorted, matches fall out of two vectorised binary searches
    (lo = leftmost, hi = rightmost); duplicate keys on both sides are handled
    by the [lo, hi) range product.  This is the scatter-free path used as the
    engine-level oracle and for output materialisation.

All probes return **per-partition match counts** (like probe_count,
kernels.cu:423-463); callers aggregate on host in 64-bit (the reference's
uint64 RESULT_COUNTER, operators/HashJoin.cpp:28).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.backend import pallas_interpret
from .partition import (PartitionedRelation, gather_padded,
                        gather_padded_aligned)
from .skew import partition_tiers


# ---------------------------------------------------------------------------
# jnp reference paths (sort-merge)
# ---------------------------------------------------------------------------

def probe_count_sorted(r_keys_sorted: jnp.ndarray, s_keys: jnp.ndarray
                       ) -> jnp.ndarray:
    """Exact equi-join match count: sum over S of |{r : r == s}|.

    ``r_keys_sorted`` must be ascending.  Handles duplicates on both sides.
    Returns int32 (per-call totals stay < 2^31 by partitioning upstream).
    """
    lo = jnp.searchsorted(r_keys_sorted, s_keys, side="left")
    hi = jnp.searchsorted(r_keys_sorted, s_keys, side="right")
    return jnp.sum((hi - lo).astype(jnp.int32))


def probe_count_reference(r_keys: jnp.ndarray, s_keys: jnp.ndarray
                          ) -> jnp.ndarray:
    """Oracle match count for arbitrary (unsorted) key arrays."""
    return probe_count_sorted(jnp.sort(r_keys), s_keys)


def _merged_contrib(r_keys: jnp.ndarray, s_keys: jnp.ndarray
                    ) -> jnp.ndarray:
    """Per-element int32 match contributions of the concat-sort mergecount
    (each element's value is <= |R|, so individual entries never overflow;
    only their SUM can — see probe_count_merged_exact).

    Sort [R ++ S] by (key, side); within every equal-key run all R rows
    precede all S rows, so each S element contributes (R rows before it)
    minus (R rows before its run) and the run baseline propagates with a
    monotone max-scan — sums and scans only.  This is the 32-bit version
    of ops/wide.join64_count and replaces the searchsorted fallback
    (probe_count_sorted) on the escalation ladder: XLA:TPU searchsorted
    lowers to ~log2(N) gather rounds, the slowest op class on this chip
    (BENCH_NOTES.md), while this path costs one lax.sort of |R|+|S|.

    Plays the role of the reference's always-correct CPU BuildProbe
    (tasks/BuildProbe.cpp:47-118) as the last escalation rung.  int32
    result — same contract as the other count probes (partition upstream
    or use skew_aware so heavy-key products stay host-side in 64-bit).

    Jitted as a unit: called eagerly, the chain of N-sized temporaries
    (concat, sorted pair, cumsum, cummax) stays alive through Python
    locals and exhausts HBM near the 2^29 sort limit; under jit XLA's
    liveness keeps only 2-3 planes resident.  The side tag is int8 for
    the same reason (the sort moves an 8x smaller payload operand).
    """
    n_r = r_keys.shape[0]
    keys = jnp.concatenate([r_keys, s_keys])
    tag = jnp.concatenate([jnp.zeros((n_r,), jnp.int8),
                           jnp.ones((s_keys.shape[0],), jnp.int8)])
    skeys, stag = jax.lax.sort((keys, tag), num_keys=2, is_stable=False)
    stag = stag.astype(jnp.int32)
    change = jnp.concatenate([jnp.ones((1,), bool), skeys[1:] != skeys[:-1]])
    cum_r = jnp.cumsum(1 - stag)                       # R rows <= i
    cum_r_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum_r[:-1]])
    # cummax (not associative_scan): lax.cummax lowers to one fused
    # reduce-window; associative_scan unrolls a ~25-level slice/concat tree
    # that ballooned TPU compile time at 16M+ elements.
    base = jax.lax.cummax(jnp.where(change, cum_r_prev, 0),
                          axis=0)                       # R rows < run start
    return jnp.where(stag == 1, cum_r - base, 0)


@jax.jit
def probe_count_merged(r_keys: jnp.ndarray, s_keys: jnp.ndarray
                       ) -> jnp.ndarray:
    """Device int32 mergecount total — see :func:`_merged_contrib` for the
    scheme.  int32 contract like every other count probe: totals past 2^31
    need :func:`probe_count_merged_exact` (host-finished 64-bit)."""
    return jnp.sum(_merged_contrib(r_keys, s_keys))


_PARTIAL_BLOCK = 1 << 15


@jax.jit
def _merged_partials(r_keys: jnp.ndarray, s_keys: jnp.ndarray):
    """Block partial sums of the mergecount contributions, split 15/15 bits
    so every int32 block sum is PROVABLY overflow-free: contributions are
    <= |R| < 2^31, hence lo blocks <= 2^15 * (2^15 - 1) < 2^30 and hi
    blocks <= 2^15 * ((2^31 - 1) >> 15) < 2^31."""
    c = _merged_contrib(r_keys, s_keys)
    pad = (-c.shape[0]) % _PARTIAL_BLOCK
    if pad:
        c = jnp.concatenate([c, jnp.zeros((pad,), jnp.int32)])
    c = c.reshape(-1, _PARTIAL_BLOCK)
    lo = jnp.sum(c & jnp.int32(0x7FFF), axis=1, dtype=jnp.int32)
    hi = jnp.sum(c >> 15, axis=1, dtype=jnp.int32)
    return lo, hi


def probe_count_merged_exact(r_keys: jnp.ndarray, s_keys: jnp.ndarray) -> int:
    """Exact 64-bit mergecount, host-finished — no wraparound under ANY
    skew (a single-pair total past 2^31 silently wrapped the int32
    reduction of probe_count_merged; this is the rung large-N skew paths
    must use).  Device work is identical plus two block reductions; the
    host pulls ~8 KB of partials per 2^27 elements and sums in int64."""
    lo, hi = _merged_partials(r_keys, s_keys)
    lo_h = np.asarray(jax.device_get(lo), dtype=np.int64).sum()
    hi_h = np.asarray(jax.device_get(hi), dtype=np.int64).sum()
    return int(lo_h + (hi_h << 15))


# ---------------------------------------------------------------------------
# Pallas tiled broadcast-compare probe over padded partitions
# ---------------------------------------------------------------------------

_ROWS = 8  # r-partition rows per VMEM block (the int32 sublane tile)


_R_PAD_KEY = 0xFFFFFFFF   # padding sentinels: outside the engine key domain
_S_PAD_KEY = 0xFFFFFFFE   # (distinct per side so padding never matches)


def _probe_count_kernel(rcnt_ref, scnt_ref, rk_ref, sk_ref, out_ref):
    """One grid step: count matches of S tile j against R partition p.

    All-pairs equality via the **lane-roll** technique: both operands live in
    the native (rows, 128) VMEM layout; rolling one S row through all 128
    lane offsets pairs every S element with every R lane exactly once, and
    the sublane broadcast pairs it with every R row.  No transposes, no
    (N, 1) column layouts (which pad 128x in TPU tiled memory), no scalar
    loops — pure VPU compare-accumulate at full lane utilisation.

      - rk_ref: (cap_r/128, 128) — R partition p.
      - sk_ref: (tile/128, 128)  — S tile j of partition p.
      - padding slots hold side-distinct sentinels, so validity masking is
        free (they never compare equal).
      - out_ref: (8, 128) per-lane match accumulator for the current
        8-partition group; row k = p % 8 holds partition p's counts
        (summed over lanes by the caller).
    """
    p = pl.program_id(0)
    j = pl.program_id(1)
    k = jax.lax.rem(p, _ROWS)
    tile = sk_ref.shape[0] * 128

    @pl.when((j == 0) & (k == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # Early exit for empty partitions / exhausted S — the analogue of the
    # reference's per-task size checks (HashJoin.cpp:146-158 skips empty
    # partitions).  Critical for the tier passes, where most slots are idle.
    @pl.when((rcnt_ref[p] > 0) & (scnt_ref[p] > j * tile))
    def _():
        r2d = rk_ref[...]                              # (R8, 128)
        s2d = sk_ref[...]                              # (TS, 128)
        ts = sk_ref.shape[0]

        def shift_body(sh, acc):
            rolled = pltpu.roll(s2d, sh, axis=1)       # one roll per shift
            for i in range(ts):                        # static unroll
                acc = acc + (r2d == rolled[i:i + 1, :]).astype(jnp.int32)
            return acc

        acc = jax.lax.fori_loop(
            0, 128, shift_body, jnp.zeros(r2d.shape, jnp.int32))
        cnt = jnp.sum(acc, axis=0, keepdims=True)      # (1, 128) lane counts

        krow = (jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 0) == k)
        out_ref[...] += jnp.where(krow, cnt, 0)


@functools.partial(jax.jit,
                   static_argnames=("cap_r", "cap_s", "tile", "interpret"))
def _probe_count_native(r3, s3, r_counts, s_counts, cap_r: int, cap_s: int,
                        tile: int, interpret: bool):
    """Probe over native-layout padded partitions.

    ``r3``/``s3``: [P8 * cap/128, 128] sentinel-padded partition tensors
    (from ops/partition.gather_padded_aligned); P8 a multiple of 8, caps
    multiples of 1024.  Returns per-partition match counts int32[P8].
    """
    P8 = r_counts.shape[0]
    tile = min(tile, cap_s)
    tile = max(1024, (tile // 1024) * 1024)
    if cap_s % tile != 0:
        tile = 1024             # always divides cap_s (a multiple of 1024)
    n_tiles = cap_s // tile
    r_rows = cap_r // 128
    t_rows = tile // 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        # Counts ride along as scalar-prefetch args: SMEM-resident, indexable
        # by grid position, powering the kernel's empty-partition early exit.
        num_scalar_prefetch=2,
        grid=(P8, n_tiles),
        in_specs=[
            pl.BlockSpec((r_rows, 128), lambda p, j, rc, sc: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_rows, 128),
                         lambda p, j, rc, sc, _n=n_tiles: (p * _n + j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, 128),
                               lambda p, j, rc, sc: (p // _ROWS, 0),
                               memory_space=pltpu.VMEM),
    )
    per_lane = pl.pallas_call(
        _probe_count_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P8, 128), jnp.int32),
        interpret=interpret,
    )(r_counts.astype(jnp.int32), s_counts.astype(jnp.int32), r3, s3)
    return jnp.sum(per_lane, axis=1)


def probe_count_partitioned(r_part: PartitionedRelation,
                            s_part: PartitionedRelation,
                            cap_r: int, cap_s: int,
                            tile: int = 512,
                            use_pallas: bool = True,
                            interpret: bool | None = None) -> jnp.ndarray:
    """Per-partition match counts for co-partitioned relations.

    ``cap_r``/``cap_s`` are static per-partition capacity bounds (see
    JoinConfig.partition_capacity); partitions exceeding them must have been
    routed to the skew path first (ops/skew.py).
    """
    if interpret is None:
        interpret = pallas_interpret()
    return _probe_count_arrays(
        r_part.keys, r_part.starts, r_part.counts,
        s_part.keys, s_part.starts, s_part.counts,
        cap_r, cap_s, tile, use_pallas, interpret)


def _probe_count_arrays(r_keys, r_starts, r_counts, s_keys, s_starts,
                        s_counts, cap_r, cap_s, tile, use_pallas, interpret):
    if use_pallas:
        # Full-Pallas path: aligned-DMA padded materialisation (no XLA
        # gather) straight into the probe kernel's native layout.
        cap_r = ((cap_r + 1023) // 1024) * 1024
        cap_s = ((cap_s + 1023) // 1024) * 1024
        P = r_starts.shape[0]
        P8 = ((P + _ROWS - 1) // _ROWS) * _ROWS
        if P8 != P:
            z = ((0, P8 - P),)
            r_starts = jnp.pad(r_starts, z)
            s_starts = jnp.pad(s_starts, z)
            r_counts = jnp.pad(r_counts, z)
            s_counts = jnp.pad(s_counts, z)
        r3 = gather_padded_aligned(r_keys, r_starts, r_counts, cap_r,
                                   _R_PAD_KEY, interpret)
        s3 = gather_padded_aligned(s_keys, s_starts, s_counts, cap_s,
                                   _S_PAD_KEY, interpret)
        per_lane = _probe_count_native(r3, s3, r_counts, s_counts,
                                       cap_r, cap_s, tile, interpret)
        return per_lane[:P]

    # jnp fallback with identical semantics (used in CPU tests):
    # per-partition sort-merge — O(cap log cap) per row instead of the
    # O(cap_r * cap_s) compare tensor, which explodes at big tier caps.
    r_pad, _ = gather_padded(r_keys, r_starts, r_counts, cap_r)
    s_pad, _ = gather_padded(s_keys, s_starts, s_counts, cap_s)
    r_valid = (jnp.arange(cap_r)[None, :] < r_counts[:, None])
    s_valid = (jnp.arange(cap_s)[None, :] < s_counts[:, None])
    sentinel = jnp.uint32(0xFFFFFFFF)  # outside the engine key domain
    r_sorted = jnp.sort(jnp.where(r_valid, r_pad, sentinel), axis=1)
    lo = jax.vmap(lambda rk, sk: jnp.searchsorted(rk, sk, side="left"))(
        r_sorted, s_pad)
    hi = jax.vmap(lambda rk, sk: jnp.searchsorted(rk, sk, side="right"))(
        r_sorted, s_pad)
    cnt = jnp.where(s_valid, hi - lo, 0)
    return jnp.sum(cnt, axis=1, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Banded probe — the zero-copy fast path.
#
# Key insight: after radix partitioning, comparing tuples from *different*
# partitions can never produce a match (their radix bits differ), so the
# probe needs no partition boundaries for correctness — only to bound the
# comparison volume.  Both relations stay in their sorted-by-pid order in
# HBM (no gather, no padded materialisation); each 8x128 R group is compared
# against the contiguous S *band* spanning its partitions, and within the
# band each 128-element R row only against the ~W s-rows its own pids span.
# The window offsets are precomputed vectorised on the XLA side and handed
# to the kernel as scalar-prefetch arrays.
#
# This replaces the fixed-width-bucket design of the reference's
# build_kernel_eth (eth.cu:81-109) with something no GPU can do: the "hash
# table" is the sorted layout itself, and the band/window metadata is the
# entire build phase.
# ---------------------------------------------------------------------------

def _probe_banded_kernel(w, b8, gr, wg_ref, wmeta_ref, rk_ref, s_ref,
                         out_ref, scratch, sems):
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    k = jax.lax.rem(g, _ROWS)
    slot = jax.lax.rem(g, 2)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def band_dma(gi, sl):
        return pltpu.make_async_copy(
            s_ref.at[pl.ds(wg_ref[gi], b8), :], scratch.at[sl], sems.at[sl])

    # Double-buffered band fetch: group g's DMA was started at step g-1
    # (g=0 warms up); start g+1's before waiting so the ICI/HBM transfer
    # overlaps this step's compute.
    @pl.when(g == 0)
    def _():
        band_dma(0, 0).start()

    @pl.when(g + 1 < n_g)
    def _():
        band_dma(g + 1, jax.lax.rem(g + 1, 2)).start()

    band_dma(g, slot).wait()

    # Per-R-row window offsets ride in a VMEM row per group (lane i+1 =
    # row i's offset): SMEM scalar prefetch caps out at 1 MB, which a
    # per-row array hits near 10^8 tuples; VMEM rows scale.  Only the
    # per-group band start (needed a step early for the prefetch) is SMEM.
    meta = wmeta_ref[pl.ds(k, 1), :]                   # (1, 128)

    # Row-major: hoist each row's dynamic window slice out of the shift
    # loop, then run the 128 lane shifts fully unrolled so every roll has a
    # static immediate shift (dynamic rolls + per-shift dynamic slices were
    # ~10x overhead).  ``gr`` rows per grid step amortise the fixed
    # per-step cost (DMA issue/wait, metadata reads, out accumulate), which
    # measurement showed dominating at 8 rows/step.
    acc = jnp.zeros((w, 128), jnp.int32)
    for i in range(gr):                                # static unroll
        base = meta[0, 1 + i]
        swin = scratch[slot, pl.ds(base, w), :]        # (W, 128)
        rrow = rk_ref[i:i + 1, :]                      # (1, 128)

        def shift_body(sh, acc, swin=swin, rrow=rrow):
            rolled = pltpu.roll(rrow, sh, axis=1)
            return acc + (swin == rolled).astype(jnp.int32)

        acc = jax.lax.fori_loop(0, 128, shift_body, acc, unroll=128)
    cnt = jnp.sum(acc)

    krow = ((jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 0) == k)
            & (jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 1) == 0))
    out_ref[...] += jnp.where(krow, cnt, 0)


@functools.partial(jax.jit, static_argnames=("window_rows", "band_blocks",
                                             "rows_per_group",
                                             "r_pad_key", "s_pad_key",
                                             "interpret"))
def probe_count_banded(r_part: PartitionedRelation,
                       s_part: PartitionedRelation,
                       window_rows: int = 6,
                       band_blocks: int = 5,
                       rows_per_group: int = 32,
                       r_pad_key: int = _R_PAD_KEY,
                       s_pad_key: int = _S_PAD_KEY,
                       interpret: bool | None = None):
    """Band probe over pid-sorted relations.  Returns (total_i32, ok).

    ``ok`` is False when any R row's S-window exceeds ``window_rows`` rows or
    any group's band exceeds ``band_blocks`` 1024-blocks — callers escalate
    to the tiered/padded path (skewed partitions) exactly like the
    reference's skew detection escalates probe strategies
    (kernels_optimized.cu:301-311).

    ``rows_per_group``: 128-element R rows handled per grid step (8/16/32;
    larger amortises fixed per-step cost but needs a wider band).
    """
    if interpret is None:
        interpret = pallas_interpret()
    w = window_rows
    b8 = band_blocks * _ROWS
    gr = rows_per_group
    assert gr % _ROWS == 0 and gr <= 120

    n_r = r_part.keys.shape[0]
    n_s = s_part.keys.shape[0]
    s_starts = s_part.starts
    s_counts = s_part.counts
    n_parts = s_starts.shape[0]

    # Valid prefixes: rows past sum(counts) are dropped rows (heavy keys /
    # padding) that sorted to the tail — they must neither match nor widen
    # any window.
    valid_r = jnp.sum(r_part.counts)
    valid_s = jnp.sum(s_part.counts)

    # --- pad R to whole groups with sentinels ---
    gelems = gr * 128
    n_r_pad = ((n_r + gelems - 1) // gelems) * gelems
    rk = jnp.where(jnp.arange(n_r) < valid_r, r_part.keys,
                   jnp.uint32(r_pad_key))
    rpid = r_part.pids
    if n_r_pad != n_r:
        rk = jnp.concatenate([rk, jnp.full((n_r_pad - n_r,),
                                           jnp.uint32(r_pad_key))])
        rpid = jnp.concatenate([rpid, jnp.full((n_r_pad - n_r,),
                                               jnp.int32(0))])
    n_rows = n_r_pad // 128
    n_groups = n_rows // gr

    # --- pad S with a sentinel tail so band DMAs never run off the end ---
    n_s_pad = ((n_s + 127) // 128) * 128 + b8 * 128
    sk = jnp.where(jnp.arange(n_s) < valid_s, s_part.keys,
                   jnp.uint32(s_pad_key))
    sk = jnp.concatenate([sk, jnp.full((n_s_pad - n_s,),
                                       jnp.uint32(s_pad_key))])
    s2d = sk.reshape(-1, 128)
    s_max_row = s2d.shape[0] - b8

    # --- per-R-row pid span -> S row windows (vectorised "build phase") ---
    row_idx = jnp.arange(n_rows, dtype=jnp.int32)
    last_valid = jnp.maximum(valid_r - 1, 0)
    first = jnp.minimum(row_idx * 128, last_valid)
    last = jnp.minimum(row_idx * 128 + 127, last_valid)
    pid_first = jnp.clip(rpid[first], 0, n_parts - 1)
    pid_last = jnp.clip(rpid[last], 0, n_parts - 1)
    w_row = s_starts[pid_first] // 128                       # int32[n_rows]
    end_row = (s_starts[pid_last] + s_counts[pid_last] + 127) // 128
    w_row = jnp.clip(w_row, 0, s_max_row)

    # group band start = its first row's window start (monotone in the
    # sorted order); relative offsets stay within the band.
    wg = w_row.reshape(n_groups, gr)[:, 0]                   # int32[n_groups]
    wrel = (w_row.reshape(n_groups, gr) - wg[:, None])
    ok = (jnp.all(end_row - w_row <= w)
          & jnp.all(wrel + w <= b8)
          & jnp.all(end_row.reshape(n_groups, gr) - wg[:, None] <= b8))
    wrel = jnp.clip(wrel, 0, b8 - w).reshape(-1)

    n_groups8 = ((n_groups + _ROWS - 1) // _ROWS) * _ROWS
    if n_groups8 != n_groups:
        pad = n_groups8 - n_groups
        wg = jnp.concatenate([wg, jnp.zeros((pad,), jnp.int32)])
        wrel = jnp.concatenate([wrel, jnp.zeros((pad * gr,), jnp.int32)])
        rk = jnp.concatenate([rk, jnp.full((pad * gelems,),
                                           jnp.uint32(r_pad_key))])
    r2d = rk.reshape(-1, 128)

    # Per-group VMEM metadata row (lanes 1..gr = per-row offsets inside the
    # band); band starts ride separately in SMEM so step g can prefetch
    # step g+1's band.
    wmeta = jnp.zeros((n_groups8, 128), jnp.int32)
    wmeta = wmeta.at[:, 1:1 + gr].set(wrel.reshape(n_groups8, gr))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups8,),
        in_specs=[
            pl.BlockSpec((_ROWS, 128), lambda g, wg_: (g // _ROWS, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gr, 128), lambda g, wg_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((_ROWS, 128), lambda g, wg_: (g // _ROWS, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, b8, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    per_group = pl.pallas_call(
        functools.partial(_probe_banded_kernel, w, b8, gr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups8, 128), jnp.int32),
        interpret=interpret,
    )(wg, wmeta, r2d, s2d)
    return jnp.sum(per_group[:, 0]), ok


def probe_count_banded_reference(r_part: PartitionedRelation,
                                 s_part: PartitionedRelation):
    """jnp-only mirror of probe_count_banded's semantics (CPU oracle):
    joins the valid prefixes of the two sorted relations."""
    rk = jnp.where(jnp.arange(r_part.keys.shape[0]) <
                   jnp.sum(r_part.counts), r_part.keys,
                   jnp.uint32(_R_PAD_KEY))
    sk = jnp.where(jnp.arange(s_part.keys.shape[0]) <
                   jnp.sum(s_part.counts), s_part.keys,
                   jnp.uint32(_S_PAD_KEY))
    return probe_count_sorted(jnp.sort(rk), sk)


# ---------------------------------------------------------------------------
# Diagonal rank-band probe — the fully-sorted fast path.
#
# When BOTH relations are fully key-sorted, the match positions follow the
# rank diagonal: the S-rank of R row i's head key (one vectorised
# searchsorted over row heads — n/128 lookups, not n) pins each row's
# S-window *exactly*, and within a row the S-position of lane l's matches
# deviates from (j0 + l) only by the local density drift d.  The kernel
# realigns the S window to j0 at element granularity (two row-aligned
# reads + lane rolls, the same Mosaic-legal shift used by
# partition.gather_padded_aligned) and compares only the 2K+1 shifts with
# |d| <= K — instead of the banded kernel's all-128-shifts window sweep.
#
# Correctness does not rest on a drift model: sortedness gives an *exact*
# coverage test.  A match missed above the band implies s[l+K+1] <= r[l];
# one missed below implies s[l-K-1] >= r[l] (both sides ascending).  The
# kernel evaluates both predicates for every lane (two extra shifted
# compares) and accumulates a violation count; any violation flips ``ok``
# and the caller escalates to the banded/tiered/sortmerge paths, exactly
# like the reference escalates probe strategies on skew
# (kernels_optimized.cu:301-311).
#
# Keys are compared in *biased int32* form (uint32 ^ 0x80000000 bitcast to
# int32): order and equality are preserved while every in-kernel compare
# stays a signed int32 op (unsigned ordered compares are the risky corner
# of the Mosaic ISA).  Sentinels map to int32 max / max-1.
# ---------------------------------------------------------------------------

_R_SENT_B = 0x7FFFFFFF   # biased image of _R_PAD_KEY (int32 max)
_S_SENT_B = 0x7FFFFFFE   # biased image of _S_PAD_KEY


def bias_keys(keys: jnp.ndarray, drop_mask: jnp.ndarray | None = None,
              sentinel: int = _R_PAD_KEY) -> jnp.ndarray:
    """uint32 keys -> order-preserving biased int32 (x ^ 0x80000000).

    Rows where ``drop_mask`` is True are remapped to ``sentinel`` (an
    out-of-domain uint32) before biasing, so they sort to the tail and can
    never match the other side."""
    if drop_mask is not None:
        keys = jnp.where(drop_mask, jnp.uint32(sentinel), keys)
    return jax.lax.bitcast_convert_type(
        keys ^ jnp.uint32(0x80000000), jnp.int32)


def _probe_diag_kernel(K, b8, gr, e_cap, wg_ref, rk_ref, s_ref,
                       out_ref, scratch, sems):
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    k = jax.lax.rem(g, _ROWS)
    slot = jax.lax.rem(g, 2)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def band_dma(gi, sl):
        return pltpu.make_async_copy(
            s_ref.at[pl.ds(wg_ref[gi], b8), :], scratch.at[sl], sems.at[sl])

    @pl.when(g == 0)
    def _():
        band_dma(0, 0).start()

    @pl.when(g + 1 < n_g)
    def _():
        band_dma(g + 1, jax.lax.rem(g + 1, 2)).start()

    band_dma(g, slot).wait()

    lanes1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    band = scratch[slot]                                # (b8, 128)

    cnt = jnp.zeros((1, 128), jnp.int32)
    viol = jnp.zeros((1, 128), jnp.int32)
    for i in range(gr):                                 # static unroll
        # Exact per-row window start, computed IN the band instead of via
        # a global searchsorted (which goes superlinear past ~100M): the
        # band begins strictly below this row's head (host side guarantees
        # s[wg*128] < head for valid rows), so
        #   e = #{band < head} = searchsorted(S, head, left) - wg*128.
        rrow = rk_ref[i:i + 1, :]
        head = rrow[0, 0]
        rvalid_s = (head != jnp.int32(_R_SENT_B)).astype(jnp.int32)
        e_raw = jnp.sum((band < head).astype(jnp.int32))
        overflow = (e_raw > e_cap).astype(jnp.int32) * rvalid_s
        viol = viol + jnp.where(lanes1 == 0, overflow, 0)
        e = jnp.clip(e_raw, 0, e_cap) * rvalid_s
        base = e // 128
        ksh = e - base * 128                            # 0..127
        # Element-granular realignment: two row-aligned (2,128) reads one
        # row apart, lane-roll both by (128-ksh), merge by lane — swin row
        # 0 = S[e, e+128), row 1 = S[e+128, e+256).
        a = scratch[slot, pl.ds(base, 2), :]
        b = scratch[slot, pl.ds(base + 1, 2), :]
        sh_al = jax.lax.rem(128 - ksh, 128)
        rol_a = pltpu.roll(a, sh_al, axis=1)
        rol_b = pltpu.roll(b, sh_al, axis=1)
        swin = jnp.where(lanes2 < 128 - ksh, rol_a, rol_b)
        s0 = swin[0:1, :]
        s1 = swin[1:2, :]

        # Diagonal band: rolled rrow at shift sh pairs lane l=(j-sh)%128
        # with S offset q=j (s0) / q=128+j (s1).  Shift set {0..K} on both
        # rows + {128-K..127} on s0 covers exactly all pairs with
        # d = q - l in [-K, K]; out-of-band pairs each land on a unique
        # (row, sh) so nothing is double counted, and any *real* match
        # outside the band trips the violation check below, discarding the
        # whole result.
        acc = (s0 == rrow).astype(jnp.int32)
        for sh in range(1, K + 1):
            rolled = pltpu.roll(rrow, sh, axis=1)
            acc = acc + (s0 == rolled).astype(jnp.int32) \
                      + (s1 == rolled).astype(jnp.int32)
        for sh in range(128 - K, 128):
            rolled = pltpu.roll(rrow, sh, axis=1)
            acc = acc + (s0 == rolled).astype(jnp.int32)
        cnt = cnt + acc

        # Exact coverage check (monotone envelopes).  r-sentinel lanes
        # (padded tail rows) are masked — int32 max would trip check 1.
        rvalid = (rrow != jnp.int32(_R_SENT_B)).astype(jnp.int32)
        c0 = pltpu.roll(s0, 127 - K, axis=1)            # s[(l+K+1) % 128]
        c1 = pltpu.roll(s1, 127 - K, axis=1)
        s_hi = jnp.where(lanes1 < 127 - K, c0, c1)      # s[l+K+1]
        viol = viol + (s_hi <= rrow).astype(jnp.int32) * rvalid
        c2 = pltpu.roll(s0, K + 1, axis=1)              # s[(l-K-1) % 128]
        v2 = (c2 >= rrow).astype(jnp.int32) * rvalid
        viol = viol + jnp.where(lanes1 >= K + 1, v2, 0)

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 1)
    out_ref[...] += jnp.where((iota_r == k) & (iota_l == 0), jnp.sum(cnt), 0) \
        + jnp.where((iota_r == k) & (iota_l == 1), jnp.sum(viol), 0)


def _diag_row_windows(slot, band, rk_ref, row, e_cap, lanes2, planes):
    """Shared per-row window extraction for the blocked diagonal kernels
    (count + emit): compute this R row's exact in-band window offset
    (e = #{band < head}, clipped), then realign each ``planes`` scratch
    ref (keys; the emit kernel adds the rid plane) to that offset by the
    element-granular two-read + lane-roll merge.  Returns
    ([(w0, w1)] per plane, overflow_increment).  Single-sourcing this
    (and :func:`_diag_coverage8`) keeps the kernel family's correctness
    proof in one place — three hand-unrolled copies drifted apart is the
    failure mode the round-5 advisor review flagged."""
    rrow = rk_ref[row:row + 1, :]
    head = rrow[0, 0]
    rvalid_s = (head != jnp.int32(_R_SENT_B)).astype(jnp.int32)
    e_raw = jnp.sum((band < head).astype(jnp.int32))
    ov = (e_raw > e_cap).astype(jnp.int32) * rvalid_s
    e = jnp.clip(e_raw, 0, e_cap) * rvalid_s
    base = e // 128
    ksh = e - base * 128
    sh_al = jax.lax.rem(128 - ksh, 128)
    outs = []
    for pref in planes:
        a = pref[slot, pl.ds(base, 2), :]
        b = pref[slot, pl.ds(base + 1, 2), :]
        rol_a = pltpu.roll(a, sh_al, axis=1)
        rol_b = pltpu.roll(b, sh_al, axis=1)
        w = jnp.where(lanes2 < 128 - ksh, rol_a, rol_b)
        outs.append((w[0:1, :], w[1:2, :]))
    return outs, ov


def _diag_coverage8(s0, s1, r8, K, lanes8):
    """Shared monotone-envelope coverage check for an (8, 128) block:
    violation increments for matches that fell outside the +-K band
    (see the proof comment above _probe_diag_kernel)."""
    rvalid = (r8 != jnp.int32(_R_SENT_B)).astype(jnp.int32)
    c0 = pltpu.roll(s0, 127 - K, axis=1)            # s[(l+K+1) % 128]
    c1 = pltpu.roll(s1, 127 - K, axis=1)
    s_hi = jnp.where(lanes8 < 127 - K, c0, c1)      # s[l+K+1]
    viol = (s_hi <= r8).astype(jnp.int32) * rvalid
    c2 = pltpu.roll(s0, K + 1, axis=1)              # s[(l-K-1) % 128]
    v2 = (c2 >= r8).astype(jnp.int32) * rvalid
    return viol + jnp.where(lanes8 >= K + 1, v2, 0)


def _probe_diag_kernel_blocked(K, b8, gr, e_cap, wg_ref, rk_ref, s_ref,
                               out_ref, scratch, sems):
    """Sublane-blocked diagonal probe: same per-row exact window offsets
    as :func:`_probe_diag_kernel`, but the +-K shift loop and the coverage
    check run on (8, 128) blocks of 8 realigned rows at once.  The v2
    kernel's shift math is all (1, 128) ops — one VPU issue moving 1/8th
    of a native (8, 128) vreg — so the issue-bound inner loop wastes 7/8
    of the unit; batching 8 rows per issue cuts the dominant cost ~8x
    while the per-row realignment (rolls whose shift differs per row, so
    they cannot batch) stays identical.  Counting and coverage semantics
    are bit-identical to v2: each sublane of the block carries exactly
    one row's window, so the uniqueness argument for out-of-band pairs
    and the monotone-envelope check apply per sublane unchanged."""
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    k = jax.lax.rem(g, _ROWS)
    slot = jax.lax.rem(g, 2)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def band_dma(gi, sl):
        return pltpu.make_async_copy(
            s_ref.at[pl.ds(wg_ref[gi], b8), :], scratch.at[sl], sems.at[sl])

    @pl.when(g == 0)
    def _():
        band_dma(0, 0).start()

    @pl.when(g + 1 < n_g)
    def _():
        band_dma(g + 1, jax.lax.rem(g + 1, 2)).start()

    band_dma(g, slot).wait()

    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    lanes8 = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 1)
    band = scratch[slot]                                # (b8, 128)

    cnt8 = jnp.zeros((_ROWS, 128), jnp.int32)
    viol8 = jnp.zeros((_ROWS, 128), jnp.int32)
    ov = jnp.int32(0)
    for j in range(gr // _ROWS):
        r8 = rk_ref[pl.ds(j * _ROWS, _ROWS), :]         # (8, 128)
        s0_rows = []
        s1_rows = []
        for i in range(_ROWS):
            (kw,), ov_i = _diag_row_windows(slot, band, rk_ref,
                                            j * _ROWS + i, e_cap, lanes2,
                                            [scratch])
            ov = ov + ov_i
            s0_rows.append(kw[0])
            s1_rows.append(kw[1])
        s0 = jnp.concatenate(s0_rows, axis=0)           # (8, 128)
        s1 = jnp.concatenate(s1_rows, axis=0)

        acc = (s0 == r8).astype(jnp.int32)
        for sh in range(1, K + 1):
            rolled = pltpu.roll(r8, sh, axis=1)
            acc = acc + (s0 == rolled).astype(jnp.int32) \
                      + (s1 == rolled).astype(jnp.int32)
        for sh in range(128 - K, 128):
            rolled = pltpu.roll(r8, sh, axis=1)
            acc = acc + (s0 == rolled).astype(jnp.int32)
        cnt8 = cnt8 + acc

        viol8 = viol8 + _diag_coverage8(s0, s1, r8, K, lanes8)

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 1)
    out_ref[...] += \
        jnp.where((iota_r == k) & (iota_l == 0), jnp.sum(cnt8), 0) \
        + jnp.where((iota_r == k) & (iota_l == 1), jnp.sum(viol8) + ov, 0)


def _diag_geometry(n_r: int, n_s: int, k_drift: int, rows_per_group: int,
                   band_blocks: int | None, budget: int = 1024):
    """Static shape plan shared by the probe and ``diagonal_prepad``.

    ``budget`` caps rows*K (live unrolled temporaries); the two-plane
    64-bit kernel (ops/wide.py) halves it."""
    K = k_drift
    assert 1 <= K <= 120
    # Mosaic allocates VMEM stack for the whole statically-unrolled group
    # body (~ rows * shifts live temporaries); cap rows*K so large-K
    # configs stay inside the 16 MB scoped-vmem limit.
    gr = min(rows_per_group, max(_ROWS, (budget // K) // _ROWS * _ROWS))
    assert gr % _ROWS == 0 and gr <= 120
    if band_blocks is None:
        # Group span ~ gr*128 * |S|/|R| plus drift/realignment slack (the
        # coarse band start begins up to 2 rows before the group's exact
        # searchsorted row, hence the extra 512).
        span = (gr * 128 * n_s + n_r - 1) // n_r
        band_blocks = (span + 1024 + 2 * K + 512) // 1024 + 1
    b8 = band_blocks * _ROWS
    gelems = gr * 128
    n_groups = (n_r + gelems - 1) // gelems
    n_groups8 = ((n_groups + _ROWS - 1) // _ROWS) * _ROWS
    n_r_pad = n_groups8 * gelems
    n_s_pad = ((n_s + 127) // 128) * 128 + b8 * 128
    return gr, b8, gelems, n_groups8, n_r_pad, n_s_pad


@functools.partial(jax.jit, static_argnames=("side", "n_r", "n_s", "k_drift",
                                             "rows_per_group", "band_blocks",
                                             "budget"))
def diagonal_prepad(sorted_keys: jnp.ndarray, side: str,
                    n_r: int, n_s: int,
                    k_drift: int = 16, rows_per_group: int = 32,
                    band_blocks: int | None = None,
                    budget: int = 1024) -> jnp.ndarray:
    """Sentinel-pad ONE sorted side for repeated/paired diagonal probes.

    probe_count_diagonal pads internally (two full copies per call); when
    probing many run pairs (engine/large.py) that transient doubles peak
    HBM.  Pad each run once with this (``side`` 'r' or 's'; ``n_r``/``n_s``
    are the TRUE run sizes of both sides — the band geometry depends on
    their ratio) and pass ``prepadded=(n_r, n_s)`` to the probe.

    ``budget`` must match the consuming kernel's geometry budget: the
    count probes use the default 1024; :func:`join_materialize_diagonal`
    uses 512 (its unrolled body carries ~2x the live temporaries), so
    prepadding for the emit kernel must pass ``budget=512`` whenever
    rows_per_group * k_drift > 512 (below that the geometries coincide).
    """
    _, _, _, _, n_r_pad, n_s_pad = _diag_geometry(
        n_r, n_s, k_drift, rows_per_group, band_blocks, budget=budget)
    if side == "r":
        assert sorted_keys.shape[0] == n_r
        return jnp.concatenate(
            [sorted_keys,
             jnp.full((n_r_pad - n_r,), jnp.int32(_R_SENT_B))])
    assert side == "s" and sorted_keys.shape[0] == n_s
    return jnp.concatenate(
        [sorted_keys,
         jnp.full((n_s_pad - n_s,), jnp.int32(_S_SENT_B))])


@functools.partial(jax.jit, static_argnames=("k_drift", "rows_per_group",
                                             "band_blocks", "interpret",
                                             "prepadded", "blocked"))
def probe_count_diagonal(r_sorted: jnp.ndarray, s_sorted: jnp.ndarray,
                         k_drift: int = 16,
                         rows_per_group: int = 32,
                         band_blocks: int | None = None,
                         interpret: bool | None = None,
                         prepadded: tuple[int, int] | None = None,
                         blocked: bool = False):
    """Diagonal rank-band count join over fully-sorted biased-int32 keys.

    ``r_sorted``/``s_sorted`` come from ``jax.lax.sort(bias_keys(...))``;
    dropped rows must already be sentinel-mapped (bias_keys drop_mask).
    Returns (total_matches_i32, ok).  ``ok`` False means some match (or
    rank drift) fell outside the +-``k_drift`` diagonal band or a group's
    window span overflowed the DMA band — escalate to probe_count_banded /
    tiered / sortmerge.  Requires locally balanced sides (|S| ~ |R|): a
    global size ratio >> 1 makes the within-row diagonal slope != 1 and
    trips the check by construction.

    ``prepadded=(n_r, n_s)``: the inputs already carry the sentinel
    padding from :func:`diagonal_prepad` (called with the SAME k_drift /
    rows_per_group / band_blocks); n_r/n_s are the true unpadded sizes.

    ``blocked``: run the sublane-blocked kernel variant — identical
    semantics and geometry (prepadded arrays interchange freely), with
    the +-K shift loop batched over (8, 128) row blocks (see
    :func:`_probe_diag_kernel_blocked`).
    """
    if interpret is None:
        interpret = pallas_interpret()
    K = k_drift
    if prepadded is not None:
        n_r, n_s = prepadded
    else:
        n_r = r_sorted.shape[0]
        n_s = s_sorted.shape[0]
    gr, b8, gelems, n_groups8, n_r_pad, n_s_pad = _diag_geometry(
        n_r, n_s, K, rows_per_group, band_blocks)

    rk, sk = r_sorted, s_sorted
    if prepadded is not None:
        assert rk.shape[0] == n_r_pad and sk.shape[0] == n_s_pad, \
            "prepadded shapes disagree with geometry (same params?)"
    else:
        if n_r_pad != n_r:
            rk = jnp.concatenate(
                [rk, jnp.full((n_r_pad - n_r,), jnp.int32(_R_SENT_B))])
        sk = jnp.concatenate(
            [sk, jnp.full((n_s_pad - n_s,), jnp.int32(_S_SENT_B))])
    r2d = rk.reshape(-1, 128)
    s2d = sk.reshape(-1, 128)
    s_max_row = s2d.shape[0] - b8

    # --- coarse band starts: ONE search per GROUP over S row heads ---
    # (The old exact per-R-row searchsorted over the full S went badly
    # superlinear past ~100M; per-row offsets now come from an in-kernel
    # count over the loaded band.)  side='left' over row heads guarantees
    # s[(t0-1)*128] < group head, so the band starts strictly below every
    # head in the group and the in-kernel count is exactly
    # searchsorted(S, head) - wg*128 for every valid row.
    gheads = rk[::gelems]                                   # (n_groups8,)
    s_heads = sk[::128]    # sentinel heads sort last — harmless to search
    t0 = jnp.searchsorted(s_heads, gheads, side="left").astype(jnp.int32)
    wg = jnp.clip(t0 - 1, 0, s_max_row)                     # band start row
    e_cap = (b8 - 3) * 128                                  # slice bound

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups8,),
        in_specs=[
            pl.BlockSpec((gr, 128), lambda g, wg_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((_ROWS, 128), lambda g, wg_: (g // _ROWS, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, b8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = _probe_diag_kernel_blocked if blocked else _probe_diag_kernel
    per_group = pl.pallas_call(
        functools.partial(kern, K, b8, gr, e_cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups8, 128), jnp.int32),
        interpret=interpret,
    )(wg, r2d, s2d)
    matches = jnp.sum(per_group[:, 0])
    ok = jnp.sum(per_group[:, 1]) == 0
    return matches, ok


def probe_count_diagonal_reference(r_keys: jnp.ndarray, s_keys: jnp.ndarray,
                                   drop_r=None, drop_s=None):
    """jnp-only mirror of the diagonal probe's semantics (CPU oracle)."""
    rk = bias_keys(r_keys, drop_r, _R_PAD_KEY)
    sk = bias_keys(s_keys, drop_s, _S_PAD_KEY)
    return probe_count_sorted(jnp.sort(rk), sk)


# ---------------------------------------------------------------------------
# Diagonal EMIT kernel — materialisation at diagonal-probe cost.
#
# The windowed emit kernel (join_materialize_windowed) needs a host-side
# window-prep pass (per-row S window offsets via sorted-query ranks — two
# extra device sorts per call), which is the dominant cost of the
# materialising paths over their counting twins.  The diagonal probe
# derives per-row alignment IN the band (count-less-than against the row
# head) and needs no prep at all — this kernel extends it to emit: the S
# RID band rides a second DMA alongside the key band, realigned by the
# same per-row element-granular shift, and the +-K shift loop accumulates
# per-R-LANE match counts and matched-rid SUMS (the dense convention:
# where count == 1 the rid sum IS the partner's rid; count > 1 flags
# ``multi`` exactly like the windowed kernel).
#
# Coordinate note: the count kernel rolls R forward and accumulates in
# the S-offset coordinate (only totals matter there).  Emit needs
# per-R-lane planes, so the S windows roll BACKWARD instead: for drift
# d in [0, K], lane l pairs S[e+l+d] = select(l < 128-d, roll(s0, 128-d),
# roll(s1, 128-d))[l]; for d in [-K, -1], S[e+l+d] = roll(s0, -d)[l]
# (offsets below e hold no matches: e counts band elements < the row
# head, so S[q < e] < head <= r[l]).  Wrapped lanes pair out-of-band
# offsets; a real match there trips the unchanged monotone-envelope
# coverage check and discards the whole result (``ok`` False), exactly
# like the count kernel's uniqueness argument.  Reference: the probe
# kernels emit (rId, sId) pairs at claimed slots, kernels.cu:199-246;
# here the dense per-R-row planes replace the atomic output claiming.
# ---------------------------------------------------------------------------


def _emit_diag_kernel_blocked(K, b8, gr, e_cap, wg_ref, rk_ref, s_ref,
                              v_ref, acc_ref, cnt_ref, srid_ref,
                              scr_k, scr_v, sem_k, sem_v):
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    k = jax.lax.rem(g, _ROWS)
    slot = jax.lax.rem(g, 2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def band_dma(gi, sl):
        return (pltpu.make_async_copy(
                    s_ref.at[pl.ds(wg_ref[gi], b8), :], scr_k.at[sl],
                    sem_k.at[sl]),
                pltpu.make_async_copy(
                    v_ref.at[pl.ds(wg_ref[gi], b8), :], scr_v.at[sl],
                    sem_v.at[sl]))

    @pl.when(g == 0)
    def _():
        for c in band_dma(0, 0):
            c.start()

    @pl.when(g + 1 < n_g)
    def _():
        for c in band_dma(g + 1, jax.lax.rem(g + 1, 2)):
            c.start()

    for c in band_dma(g, slot):
        c.wait()

    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    lanes8 = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 1)
    band = scr_k[slot]                                  # (b8, 128)

    viol8 = jnp.zeros((_ROWS, 128), jnp.int32)
    ov = jnp.int32(0)
    for j in range(gr // _ROWS):
        r8 = rk_ref[pl.ds(j * _ROWS, _ROWS), :]         # (8, 128)
        s0_rows, s1_rows = [], []
        v0_rows, v1_rows = [], []
        for i in range(_ROWS):
            (kw, vw), ov_i = _diag_row_windows(slot, band, rk_ref,
                                               j * _ROWS + i, e_cap,
                                               lanes2, [scr_k, scr_v])
            ov = ov + ov_i
            s0_rows.append(kw[0])
            s1_rows.append(kw[1])
            v0_rows.append(vw[0])
            v1_rows.append(vw[1])
        s0 = jnp.concatenate(s0_rows, axis=0)           # (8, 128)
        s1 = jnp.concatenate(s1_rows, axis=0)
        v0 = jnp.concatenate(v0_rows, axis=0)
        v1 = jnp.concatenate(v1_rows, axis=0)

        # drift d = 0: lane l pairs S[e + l] = s0[l]
        eq = (s0 == r8).astype(jnp.int32)
        cnt8 = eq
        rid8 = eq * v0
        for d in range(1, K + 1):
            # d > 0: S[e+l+d] — s0 wraps into s1 at lane 128-d
            sk_d = jnp.where(lanes8 < 128 - d,
                             pltpu.roll(s0, 128 - d, axis=1),
                             pltpu.roll(s1, 128 - d, axis=1))
            sv_d = jnp.where(lanes8 < 128 - d,
                             pltpu.roll(v0, 128 - d, axis=1),
                             pltpu.roll(v1, 128 - d, axis=1))
            eq = (sk_d == r8).astype(jnp.int32)
            cnt8 = cnt8 + eq
            rid8 = rid8 + eq * sv_d
            # d < 0: S[e+l-d'] with d' = d — s0 only (no matches below e;
            # wrapped lanes pair offsets ~128 ahead, guarded by coverage)
            sk_n = pltpu.roll(s0, d, axis=1)
            sv_n = pltpu.roll(v0, d, axis=1)
            eq = (sk_n == r8).astype(jnp.int32)
            cnt8 = cnt8 + eq
            rid8 = rid8 + eq * sv_n

        cnt_ref[pl.ds(j * _ROWS, _ROWS), :] = cnt8
        srid_ref[pl.ds(j * _ROWS, _ROWS), :] = rid8

        viol8 = viol8 + _diag_coverage8(s0, s1, r8, K, lanes8)

    # lane 1 carries the violation total (lane 0 is unused: callers
    # derive match totals from the cnt plane itself)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 1)
    acc_ref[...] += \
        jnp.where((iota_r == k) & (iota_l == 1), jnp.sum(viol8) + ov, 0)


@functools.partial(jax.jit, static_argnames=("k_drift", "rows_per_group",
                                             "band_blocks", "interpret",
                                             "prepadded"))
def join_materialize_diagonal(r_sorted: jnp.ndarray,
                              s_sorted: jnp.ndarray,
                              s_rids: jnp.ndarray,
                              k_drift: int = 16,
                              rows_per_group: int = 32,
                              band_blocks: int | None = None,
                              interpret: bool | None = None,
                              prepadded: tuple[int, int] | None = None):
    """Materialising diagonal rank-band join (prep-free emit).

    Same contract as :func:`join_materialize_windowed` — biased-int32
    key-sorted inputs, int32 rids co-sorted with S — but the per-row
    alignment is derived in the band like :func:`probe_count_diagonal`,
    so there is NO window-prep pass (the windowed kernel's two
    sorted-query rank sorts).  Returns (s_rid_i32[n_r], count_i32[n_r],
    ok, multi) aligned to the sorted R order: where count == 1,
    ``s_rid[i]`` is the partner's rid; count > 1 rows carry rid SUMS and
    flip ``multi``.  ``ok`` False = a match or rank drift fell outside
    the +-``k_drift`` band (or a band DMA overflowed) — counts AND rids
    are then unreliable, escalate to join_materialize_windowed /
    join_materialize.  Needs locally balanced sides like the count
    probe.  ``prepadded=(n_r, n_s)``: inputs already carry
    :func:`diagonal_prepad` padding (s_rids zero-padded to the same
    n_s_pad) — the prepad call must pass ``budget=512`` (this kernel's
    geometry budget; see diagonal_prepad's docstring) whenever
    rows_per_group * k_drift > 512.
    """
    if interpret is None:
        interpret = pallas_interpret()
    K = k_drift
    if prepadded is not None:
        n_r, n_s = prepadded
    else:
        n_r = r_sorted.shape[0]
        n_s = s_sorted.shape[0]
    # budget=512 (vs the count kernel's 1024): the emit body carries ~2x
    # the live unrolled temporaries per shift (key + rid windows, eq +
    # two accumulators); rows_per_group=96 at K=8 under the 1024 budget
    # CRASHED the remote compiler (scoped-vmem blowup).  gr <= 64 at
    # K=8 is unaffected, so diagonal_prepad interop holds for the
    # standard configs.
    gr, b8, gelems, n_groups8, n_r_pad, n_s_pad = _diag_geometry(
        n_r, n_s, K, rows_per_group, band_blocks, budget=512)

    rk, sk, sv = r_sorted, s_sorted, s_rids
    if prepadded is not None:
        assert rk.shape[0] == n_r_pad and sk.shape[0] == n_s_pad \
            and sv.shape[0] == n_s_pad, \
            "prepadded shapes disagree with geometry (same params?)"
    else:
        if n_r_pad != n_r:
            rk = jnp.concatenate(
                [rk, jnp.full((n_r_pad - n_r,), jnp.int32(_R_SENT_B))])
        sk = jnp.concatenate(
            [sk, jnp.full((n_s_pad - n_s,), jnp.int32(_S_SENT_B))])
        sv = jnp.concatenate(
            [sv.astype(jnp.int32),
             jnp.zeros((n_s_pad - n_s,), jnp.int32)])
    r2d = rk.reshape(-1, 128)
    s2d = sk.reshape(-1, 128)
    v2d = sv.reshape(-1, 128)
    s_max_row = s2d.shape[0] - b8

    gheads = rk[::gelems]                                   # (n_groups8,)
    s_heads = sk[::128]
    t0 = jnp.searchsorted(s_heads, gheads, side="left").astype(jnp.int32)
    wg = jnp.clip(t0 - 1, 0, s_max_row)
    e_cap = (b8 - 3) * 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups8,),
        in_specs=[
            pl.BlockSpec((gr, 128), lambda g, wg_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, 128), lambda g, wg_: (g // _ROWS, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gr, 128), lambda g, wg_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gr, 128), lambda g, wg_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b8, 128), jnp.int32),
            pltpu.VMEM((2, b8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    acc, cnt2d, srid2d = pl.pallas_call(
        functools.partial(_emit_diag_kernel_blocked, K, b8, gr, e_cap),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_groups8, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_groups8 * gr, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_groups8 * gr, 128), jnp.int32),
        ],
        interpret=interpret,
    )(wg, r2d, s2d, v2d)
    cnt = cnt2d.reshape(-1)[:n_r] if prepadded is None else \
        cnt2d.reshape(-1)
    srid = srid2d.reshape(-1)[:n_r] if prepadded is None else \
        srid2d.reshape(-1)
    ok = jnp.sum(acc[:, 1]) == 0
    multi = jnp.any(cnt > 1)
    return srid, cnt, ok, multi


# ---------------------------------------------------------------------------
# Tiered probe — partition-level skew handling (see ops/skew.py §1; the
# reference's block-remapping probes, kernels_optimized.cu:321-457, become
# repeated fixed-capacity passes over geometrically growing tiers).
# ---------------------------------------------------------------------------

def probe_count_tiered(r_part: PartitionedRelation,
                       s_part: PartitionedRelation,
                       cap_r: int, cap_s: int,
                       n_tiers: int = 3, growth: int = 4,
                       slot_shrink: int = 4,
                       tile: int = 512,
                       use_pallas: bool = True,
                       interpret: bool | None = None):
    """Probe with per-partition capacity tiers.

    Tier t holds partitions whose R side fits cap_r * growth**t AND S side
    fits cap_s * growth**t.  Tier 0 probes all P partitions; higher tiers
    probe only the top-k largest partitions (k shrinking by ``slot_shrink``
    per tier) so padded memory stays ~constant per tier.

    Returns (total_matches_i32, ok) where ``ok`` is False if any partition
    exceeded the top tier or a tier had more members than slots — callers
    must escalate those workloads to the heavy/sort-merge path.
    """
    if interpret is None:
        interpret = pallas_interpret()
    P = r_part.n_partitions
    tier = jnp.maximum(partition_tiers(r_part.counts, cap_r, n_tiers, growth),
                       partition_tiers(s_part.counts, cap_s, n_tiers, growth))
    ok = jnp.all(tier < n_tiers)

    totals = []
    # Tier 0: all partitions, base capacity.
    c_r = jnp.where(tier == 0, r_part.counts, 0)
    c_s = jnp.where(tier == 0, s_part.counts, 0)
    totals.append(jnp.sum(_probe_count_arrays(
        r_part.keys, r_part.starts, c_r, s_part.keys, s_part.starts, c_s,
        cap_r, cap_s, tile, use_pallas, interpret)))

    for t in range(1, n_tiers):
        # Tier slots are capped: after heavy-key removal only a handful of
        # partitions can legitimately exceed the base capacity, and every
        # slot costs a full cap_t-wide kernel pass whether occupied or not.
        k_t = min(P, 512, max(8, P // (slot_shrink ** t)))
        in_tier = tier == t
        ok = ok & (jnp.sum(in_tier.astype(jnp.int32)) <= k_t)
        score = jnp.where(in_tier, s_part.counts + r_part.counts, -1)
        _, sel = jax.lax.top_k(score, k_t)
        sel_ok = in_tier[sel]
        cr = jnp.where(sel_ok, r_part.counts[sel], 0)
        cs = jnp.where(sel_ok, s_part.counts[sel], 0)
        totals.append(jnp.sum(_probe_count_arrays(
            r_part.keys, r_part.starts[sel], cr,
            s_part.keys, s_part.starts[sel], cs,
            cap_r * growth ** t, cap_s * growth ** t,
            tile, use_pallas, interpret)))

    return sum(totals), ok


# ---------------------------------------------------------------------------
# Windowed materialising join — Pallas emit kernel over sorted relations.
#
# The XLA join_materialize below is gather-bound (its output fill is a
# general gather, ~100x off HBM speed-of-light).  This kernel materialises
# scatter-free: with both sides key-sorted, each R row's matching S range
# is pinned by two searchsorteds over row heads/tails (row-granular
# windows, like the banded probe but exact — no partition ids needed and
# no slope assumption, since the full 128-shift sweep covers the whole
# window).  For every R element the kernel emits its matched S rid into
# the *same lane* (roll the j-space hit vector back by the shift), so the
# output is a dense per-R-element (s_rid, match_count) pair — no output
# cursor, no atomics (cf. the GPU's atomicAdd-claimed output slots,
# kernels.cu:236-243).
#
# Match rate: exact counts always; emitted rids are valid where
# count == 1.  Window coverage (``win_ok``) and multi-match presence
# (``multi``) are reported separately: counts stay exact under any match
# rate, so counting consumers only need win_ok, while rid consumers fall
# back to join_materialize when multi is set (the reference's
# overflow-retry protocol, kernels.cu:376-403).  The dominant analytics
# shape — fact joins dim on a key unique on the dim side — is entirely
# count <= 1.
# ---------------------------------------------------------------------------


def _emit_kernel(w, b8, gr, wg_ref, wmeta_ref, rk_ref, s_ref, srid_ref,
                 rid_out_ref, cnt_out_ref, scr_k, scr_r, sem_k, sem_r):
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    slot = jax.lax.rem(g, 2)
    k = jax.lax.rem(g, _ROWS)

    def band_dma(gi, sl):
        return (pltpu.make_async_copy(
                    s_ref.at[pl.ds(wg_ref[gi], b8), :], scr_k.at[sl],
                    sem_k.at[sl]),
                pltpu.make_async_copy(
                    srid_ref.at[pl.ds(wg_ref[gi], b8), :], scr_r.at[sl],
                    sem_r.at[sl]))

    @pl.when(g == 0)
    def _():
        for c in band_dma(0, 0):
            c.start()

    @pl.when(g + 1 < n_g)
    def _():
        for c in band_dma(g + 1, jax.lax.rem(g + 1, 2)):
            c.start()

    for c in band_dma(g, slot):
        c.wait()

    meta = wmeta_ref[pl.ds(k, 1), :]                    # (1, 128)
    for j in range(gr // _ROWS):                        # static unroll
        # Sublane-blocked (round 4, cf. _emit_kernel_mplane /
        # _probe_diag_kernel_blocked): sublane i of window block t holds
        # window row (base_i + t) of R row j*8+i, so the 128-shift loop
        # runs on full (8, 128) vregs — the per-row form issued every op
        # at 1/8 VPU width.  Per-sublane independence: row i matches
        # only inside its own window rows.
        r8 = rk_ref[pl.ds(j * _ROWS, _ROWS), :]         # (8, 128)
        wins_k = []
        wins_r = []
        for t in range(w):
            rows_k = []
            rows_r = []
            for i in range(_ROWS):
                base = meta[0, 1 + j * _ROWS + i]       # window row in band
                rows_k.append(scr_k[slot, pl.ds(base + t, 1), :])
                rows_r.append(scr_r[slot, pl.ds(base + t, 1), :])
            wins_k.append(jnp.concatenate(rows_k, axis=0))   # (8, 128)
            wins_r.append(jnp.concatenate(rows_r, axis=0))

        def one_shift(sh, out_v, out_c, r8=r8, wins_k=wins_k,
                      wins_r=wins_r):
            rolled = pltpu.roll(r8, sh, axis=1)
            pick = jnp.zeros((_ROWS, 128), jnp.int32)
            c = jnp.zeros((_ROWS, 128), jnp.int32)
            for t in range(w):
                m = (wins_k[t] == rolled).astype(jnp.int32)
                pick = pick + m * wins_r[t]
                c = c + m
            back = jax.lax.rem(128 - sh, 128)           # j -> l lane map
            return (out_v + pltpu.roll(pick, back, axis=1),
                    out_c + pltpu.roll(c, back, axis=1))

        def chunk_body(cc, carry, one_shift=one_shift):
            # chunked unroll (see _emit_kernel_mplane): 8-shift inner
            # Python loop inside the fori_loop keeps the scoped-VMEM
            # stack bounded while amortising loop overhead
            out_v, out_c = carry
            for s in range(8):
                out_v, out_c = one_shift(cc * 8 + s, out_v, out_c)
            return (out_v, out_c)

        out_v, out_c = jax.lax.fori_loop(
            0, 16, chunk_body,
            (jnp.zeros((_ROWS, 128), jnp.int32),
             jnp.zeros((_ROWS, 128), jnp.int32)),
            unroll=1)
        rid_out_ref[pl.ds(j * _ROWS, _ROWS), :] = out_v
        cnt_out_ref[pl.ds(j * _ROWS, _ROWS), :] = out_c


def _ranks_sorted_queries(s_sorted, heads, tails):
    """(searchsorted_left(s, heads), searchsorted_right(s, tails)) via
    TWO SORTS instead of binary search: jnp.searchsorted lowers to
    ~log(n) passes of gathered compares — the measured-slowest op class
    on this chip (150 ms of a 582 ms fused pipeline step at 2^26,
    logs/r5_sf100_prof.log).  A tag operand orders ties (heads before
    equal S elements, tails after), so each query's rank among S
    elements is its merged position minus the queries preceding it; a
    second compaction sort returns ranks in query order.  Exact for any
    inputs; ~n_s + 2*n_q elements through 2 small sorts."""
    n_s = s_sorted.shape[0]
    nq = heads.shape[0]
    keys = jnp.concatenate([s_sorted, heads, tails])
    tag = jnp.concatenate([jnp.zeros((n_s,), jnp.int32),
                           jnp.full((nq,), -1, jnp.int32),
                           jnp.ones((nq,), jnp.int32)])
    qid = jnp.concatenate([jnp.full((n_s,), jnp.int32(0x7FFFFFFF)),
                           jnp.arange(nq, dtype=jnp.int32),
                           jnp.arange(nq, 2 * nq, dtype=jnp.int32)])
    _, st, sq = jax.lax.sort((keys, tag, qid), num_keys=2,
                             is_stable=False)
    is_q = (st != 0).astype(jnp.int32)
    csum_q = jnp.cumsum(is_q)
    pos = jnp.arange(n_s + 2 * nq, dtype=jnp.int32)
    rank = pos - (csum_q - is_q)
    _, srank = jax.lax.sort((sq, rank), num_keys=1, is_stable=False)
    return srank[:nq], srank[nq:2 * nq]


def _windowed_prep(r_sorted, s_sorted, s_rids, w: int, gr: int,
                   band_blocks: int | None):
    """Host-side geometry + padding shared by the windowed emit kernels:
    returns (wg, wmeta, r2d, s2d, srid2d, n_groups8, b8, win_ok_static)."""
    n_r = r_sorted.shape[0]
    n_s = s_sorted.shape[0]

    if band_blocks is None:
        span = (gr * 128 * n_s + n_r - 1) // n_r
        band_blocks = (span + (w + 2) * 128 + 1024) // 1024 + 1
    b8 = band_blocks * _ROWS

    gelems = gr * 128
    n_r_pad = ((n_r + gelems - 1) // gelems) * gelems
    rk = r_sorted
    if n_r_pad != n_r:
        rk = jnp.concatenate(
            [rk, jnp.full((n_r_pad - n_r,), jnp.int32(_R_SENT_B))])
    n_rows = n_r_pad // 128
    n_groups = n_rows // gr

    n_s_pad = ((n_s + 127) // 128) * 128 + b8 * 128
    sk = jnp.concatenate(
        [s_sorted, jnp.full((n_s_pad - n_s,), jnp.int32(_S_SENT_B))])
    srid = jnp.concatenate(
        [s_rids.astype(jnp.int32),
         jnp.zeros((n_s_pad - n_s,), jnp.int32)])
    s2d = sk.reshape(-1, 128)
    srid2d = srid.reshape(-1, 128)
    s_max_row = s2d.shape[0] - b8

    heads = rk[::128]
    tails = rk[127::128]
    row_valid = heads != jnp.int32(_R_SENT_B)
    # Coverage clamp for the MIXED boundary row (head real, tail an
    # R-pad sentinel — any run whose valid count isn't a multiple of
    # 128 has one): its tail query counts every S element including
    # the S-pad tail, tripping cover_ok spuriously.  Its real keys are
    # the largest real R keys, whose S matches end at the last real S
    # element, so clamping the coverage REQUIREMENT at n_s_real is
    # exact — sentinel elements match nothing either way (counts were
    # always exact; only the flag was conservative).
    n_s_real = jnp.searchsorted(
        s_sorted, jnp.int32(_S_SENT_B), side="left").astype(jnp.int32)
    if n_s >= (1 << 22):
        # Coarse row-granular search (the diagonal probe's v2 fix applied
        # here): element-exact searchsorted over the FULL S array goes
        # superlinear past ~100M on this chip (BENCH_NOTES round 1), so
        # search S ROW HEADS (1/128th the domain) instead.
        #   w_row = (first row whose head >= r_head) - 1 is safe: rows
        #   before it end strictly below r_head (their elements are <=
        #   the next row's head < r_head), so no match can precede it —
        #   including duplicate keys straddling a row boundary.
        #   Coverage is checked at row granularity: every S element <=
        #   r_tail lies before the first row whose head > r_tail, so
        #   j1_row <= w_row + w is (conservatively) sufficient.
        s_heads = s2d[:, 0]
        j0_row, j1_row = _ranks_sorted_queries(s_heads, heads, tails)
        w_row = jnp.maximum(j0_row - 1, 0)
        j1_row = jnp.minimum(j1_row, (n_s_real + 127) // 128)
        cover_ok = jnp.all(jnp.where(row_valid, j1_row <= w_row + w, True))
    else:
        j0, j1 = _ranks_sorted_queries(s_sorted, heads, tails)
        j1 = jnp.minimum(j1, n_s_real)
        w_row = j0 // 128                               # window start row
        cover_ok = jnp.all(jnp.where(row_valid,
                                     j1 <= (w_row + w) * 128, True))

    wg = jnp.clip(w_row.reshape(n_groups, gr)[:, 0], 0, s_max_row)
    base = w_row.reshape(n_groups, gr) - wg[:, None]
    band_ok = jnp.all(jnp.where(row_valid.reshape(n_groups, gr),
                                (base >= 0) & (base + w <= b8), True))
    base = jnp.clip(base, 0, b8 - w)

    n_groups8 = ((n_groups + _ROWS - 1) // _ROWS) * _ROWS
    if n_groups8 != n_groups:
        pad = n_groups8 - n_groups
        wg = jnp.concatenate([wg, jnp.zeros((pad,), jnp.int32)])
        base = jnp.concatenate([base, jnp.zeros((pad, gr), jnp.int32)])
        rk = jnp.concatenate(
            [rk, jnp.full((pad * gelems,), jnp.int32(_R_SENT_B))])
    r2d = rk.reshape(-1, 128)

    wmeta = jnp.zeros((n_groups8, 128), jnp.int32)
    wmeta = wmeta.at[:, 1:1 + gr].set(base.reshape(n_groups8, gr))
    return wg, wmeta, r2d, s2d, srid2d, n_groups8, b8, cover_ok & band_ok


@functools.partial(jax.jit, static_argnames=("window_rows", "rows_per_group",
                                             "band_blocks", "interpret"))
def join_materialize_windowed(r_sorted: jnp.ndarray,
                              s_sorted: jnp.ndarray, s_rids: jnp.ndarray,
                              window_rows: int = 4,
                              rows_per_group: int = 32,
                              band_blocks: int | None = None,
                              interpret: bool | None = None):
    """Materialising equi-join over key-sorted relations (biased int32 keys
    from :func:`bias_keys`, int32 rids co-sorted with the keys).

    Returns (s_rid_i32[n_r], count_i32[n_r], win_ok, multi) aligned to the
    sorted R order: element i of R matched ``count[i]`` S rows; where
    count == 1, ``s_rid[i]`` is its partner's rid (R's own rid for slot i
    is simply the co-sorted R rid array).  ``win_ok`` False when any row's
    S window exceeded ``window_rows`` rows / the DMA band — counts are then
    unreliable, fall back to join_materialize.  ``multi`` True when some
    count > 1: counts remain exact, but those elements' emitted rids are
    rid-sums — rid consumers must fall back; counting consumers may
    proceed on win_ok alone.
    """
    if interpret is None:
        interpret = pallas_interpret()
    w = window_rows
    gr = rows_per_group
    assert gr % _ROWS == 0 and gr <= 120
    n_r = r_sorted.shape[0]
    wg, wmeta, r2d, s2d, srid2d, n_groups8, b8, win_ok = _windowed_prep(
        r_sorted, s_sorted, s_rids, w, gr, band_blocks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups8,),
        in_specs=[
            pl.BlockSpec((_ROWS, 128), lambda g, wg_: (g // _ROWS, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gr, 128), lambda g, wg_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((gr, 128), lambda g, wg_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gr, 128), lambda g, wg_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b8, 128), jnp.int32),
            pltpu.VMEM((2, b8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_rid, out_cnt = pl.pallas_call(
        functools.partial(_emit_kernel, w, b8, gr),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_groups8 * gr, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_groups8 * gr, 128), jnp.int32),
        ],
        interpret=interpret,
    )(wg, wmeta, r2d, s2d, srid2d)
    out_rid = out_rid.reshape(-1)[:n_r]
    out_cnt = out_cnt.reshape(-1)[:n_r]
    multi = jnp.any(out_cnt > 1)
    return out_rid, out_cnt, win_ok, multi


# ---------------------------------------------------------------------------
# M-plane windowed emit — multi-match materialisation.
#
# The windowed emit kernel above collapses to a rid-SUM when an R element
# matches more than one S row.  This variant routes each match to one of M
# output planes: a running per-lane match count rides the fori_loop carry,
# and within a shift a static cumsum over the w window rows assigns each
# (row, lane) match its ordinal; plane p takes matches with ordinal p.
# Counts stay exact under ANY match rate; planes hold the first M matched
# rids per element (unordered across planes), and ``overflow`` flags
# elements with cnt > M (the reference's multi-round probe_match_rate
# protocol, kernels.cu:376-403, becomes a single bounded-M pass + exact
# fallback).  All routing is 0/1 int32 algebra + lane rolls — no new
# Mosaic surface vs the proven emit kernel.
# ---------------------------------------------------------------------------


def _emit_kernel_mplane(w, b8, gr, M, chunk, wg_ref, wmeta_ref, rk_ref,
                        s_ref, srid_ref, *rest):
    out_refs = rest[:M + 1]          # M rid planes + cnt
    scr_k, scr_r, sem_k, sem_r = rest[M + 1:]
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    slot = jax.lax.rem(g, 2)
    k = jax.lax.rem(g, _ROWS)

    def band_dma(gi, sl):
        return (pltpu.make_async_copy(
                    s_ref.at[pl.ds(wg_ref[gi], b8), :], scr_k.at[sl],
                    sem_k.at[sl]),
                pltpu.make_async_copy(
                    srid_ref.at[pl.ds(wg_ref[gi], b8), :], scr_r.at[sl],
                    sem_r.at[sl]))

    @pl.when(g == 0)
    def _():
        for c in band_dma(0, 0):
            c.start()

    @pl.when(g + 1 < n_g)
    def _():
        for c in band_dma(g + 1, jax.lax.rem(g + 1, 2)):
            c.start()

    for c in band_dma(g, slot):
        c.wait()

    meta = wmeta_ref[pl.ds(k, 1), :]                    # (1, 128)
    for j in range(gr // _ROWS):                        # static unroll
        # Sublane-blocked (cf. _probe_diag_kernel_blocked): per-row
        # window rows are gathered into (8, 128) blocks — sublane i of
        # block t holds window row (base_i + t) of R row j*8+i — so the
        # 128-shift loop below runs every op on full native vregs
        # instead of (1, 128) slices (which issue at 1/8th VPU width;
        # the round-3 per-row form measured ~60x below the single-plane
        # kernel).  Per-sublane independence holds because R row i only
        # ever matches inside its OWN window rows.
        r8 = rk_ref[pl.ds(j * _ROWS, _ROWS), :]         # (8, 128)
        wins_k = []
        wins_r = []
        for t in range(w):
            rows_k = []
            rows_r = []
            for i in range(_ROWS):
                base = meta[0, 1 + j * _ROWS + i]       # window row in band
                rows_k.append(scr_k[slot, pl.ds(base + t, 1), :])
                rows_r.append(scr_r[slot, pl.ds(base + t, 1), :])
            wins_k.append(jnp.concatenate(rows_k, axis=0))   # (8, 128)
            wins_r.append(jnp.concatenate(rows_r, axis=0))

        def one_shift(sh, run, planes, r8=r8, wins_k=wins_k, wins_r=wins_r):
            rolled = pltpu.roll(r8, sh, axis=1)
            acc = pltpu.roll(run, sh, axis=1)           # j-space ordinal
            run_j = acc
            picks = [jnp.zeros((_ROWS, 128), jnp.int32) for _ in range(M)]
            for t in range(w):
                mt = (wins_k[t] == rolled).astype(jnp.int32)
                for p in range(M):
                    sel = mt * (acc == p).astype(jnp.int32)
                    picks[p] = picks[p] + sel * wins_r[t]
                acc = acc + mt
            back = jax.lax.rem(128 - sh, 128)           # j -> l lane map
            new_planes = tuple(
                planes[p] + pltpu.roll(picks[p], back, axis=1)
                for p in range(M))
            return (run + pltpu.roll(acc - run_j, back, axis=1), new_planes)

        def chunk_body(c, carry, one_shift=one_shift):
            # CHUNKED unroll: Mosaic's fori_loop accepts only unroll 1 or
            # full; full unroll blows the 16 MB scoped-VMEM stack
            # (measured 18.95 MB at gr=32/M=2) and unroll=1 leaves the
            # loop overhead unamortised.  A Python-level inner loop over
            # ``chunk`` shifts inside an outer fori_loop is the legal
            # middle ground: only the (run, planes) carry lives across
            # outer iterations.  Dynamic roll shifts are legal in
            # [0, 128).
            run, planes = carry
            base_sh = c * chunk
            for cc in range(chunk):
                run, planes = one_shift(base_sh + cc, run, planes)
            return (run, planes)

        run, planes = jax.lax.fori_loop(
            0, 128 // chunk, chunk_body,
            (jnp.zeros((_ROWS, 128), jnp.int32),
             tuple(jnp.zeros((_ROWS, 128), jnp.int32) for _ in range(M))),
            unroll=1)
        for p in range(M):
            out_refs[p][pl.ds(j * _ROWS, _ROWS), :] = planes[p]
        out_refs[M][pl.ds(j * _ROWS, _ROWS), :] = run


@functools.partial(jax.jit, static_argnames=("max_matches", "window_rows",
                                             "rows_per_group", "band_blocks",
                                             "interpret"))
def join_materialize_windowed_multi(r_sorted: jnp.ndarray,
                                    s_sorted: jnp.ndarray,
                                    s_rids: jnp.ndarray,
                                    max_matches: int = 4,
                                    window_rows: int = 4,
                                    rows_per_group: int = 32,
                                    band_blocks: int | None = None,
                                    interpret: bool | None = None):
    """Multi-match materialising equi-join over key-sorted relations.

    Like :func:`join_materialize_windowed`, but emits up to
    ``max_matches`` matched S rids PER R element into M output planes.
    Returns (s_rid_i32[M, n_r], count_i32[n_r], win_ok, overflow): counts
    are exact under any match rate; element i's matched rids are
    ``s_rid[:count[i], i]`` (plane order arbitrary) when count <= M.
    ``overflow`` True when some count > M (those elements' planes hold
    only M of the rids — fall back to join_materialize).  ``win_ok`` as
    in the single-plane kernel.
    """
    if interpret is None:
        interpret = pallas_interpret()
    w = window_rows
    M = max_matches
    # Shift loop runs in 8-shift chunks (see chunk_body in the kernel):
    # full unroll blows the 16 MB scoped-VMEM stack, unroll=1 (round 3)
    # ran ~60x below the single-plane kernel.  gr follows the caller
    # (32 default) — besides speed, big groups keep the SMEM wg prefetch
    # array under its 1 MB cap at 2^28-row runs (gr=8 put it exactly at
    # 1.00 M and the sf100 pipeline failed to compile).
    gr = rows_per_group
    assert gr % _ROWS == 0 and gr <= 120 and 1 <= M <= 8
    n_r = r_sorted.shape[0]
    wg, wmeta, r2d, s2d, srid2d, n_groups8, b8, win_ok = _windowed_prep(
        r_sorted, s_sorted, s_rids, w, gr, band_blocks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups8,),
        in_specs=[
            pl.BlockSpec((_ROWS, 128), lambda g, wg_: (g // _ROWS, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gr, 128), lambda g, wg_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((gr, 128), lambda g, wg_: (g, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(M + 1)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b8, 128), jnp.int32),
            pltpu.VMEM((2, b8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_emit_kernel_mplane, w, b8, gr, M, 8),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_groups8 * gr, 128), jnp.int32)
                   for _ in range(M + 1)],
        interpret=interpret,
    )(wg, wmeta, r2d, s2d, srid2d)
    out_cnt = outs[M].reshape(-1)[:n_r]
    out_rid = jnp.stack([o.reshape(-1)[:n_r] for o in outs[:M]])
    overflow = jnp.any(out_cnt > M)
    return out_rid, out_cnt, win_ok, overflow


# ---------------------------------------------------------------------------
# Materialising probe (reference kernels.cu:199-246 `probe`,
# 314-411 `probe_match_rate`): emits (r_rid, s_rid) pairs.
# ---------------------------------------------------------------------------

def join_materialize(r_keys, r_rids, s_keys, s_rids, max_out: int):
    """Full equi-join output with a static output bound.

    Sort-merge formulation: R is key-sorted; for every S row the matching R
    range [lo, hi) is found by binary search; output slots are assigned by
    prefix sum over range lengths and filled by a vectorised
    inverse-searchsorted (the scatter-free analogue of the GPU's
    atomicAdd-claimed output cursor, kernels.cu:236-243).

    Returns (out_r_rid, out_s_rid, out_key, valid_mask, total_count). Pairs
    beyond ``max_out`` are dropped (the reference instead re-runs overflowing
    partitions, kernels.cu:376-403; the engine retries with a larger bound).
    Output slots are ordered by sorted S key (join output order is
    unspecified set semantics).

    Round-5 formulation: the three searchsorted storms of the original
    (each = log n passes of output-sized gathered compares; prime suspect
    in the 2^25/shard relay-worker crash, VERDICT r4 item 4) become
    sort + cummax forward-fills.  Both (offs, lo) are NON-DECREASING in
    sorted-S order, so after one merged sort of offset markers with
    output slots, a running cummax carries each slot's owning (offs, lo)
    — no binary search, no scatter.  Two genuine output gathers remain
    (s_rid by owner index, r_rid by position).
    """
    rk, rr = jax.lax.sort((r_keys, r_rids), num_keys=1, is_stable=False)
    sk, sr = jax.lax.sort((s_keys, s_rids), num_keys=1, is_stable=False)
    n_s = sk.shape[0]
    lo, hi = _ranks_sorted_queries(rk, sk, sk)
    cnt = hi - lo
    offs = jnp.cumsum(cnt) - cnt                    # exclusive scan
    total = jnp.sum(cnt)
    # Merged order of (offs markers, output slots): markers first on
    # ties (slot k belongs to the last s row with offs <= k).
    slot = jnp.arange(max_out, dtype=jnp.int32)
    pos_m = jnp.concatenate([offs, slot])
    tag_m = jnp.concatenate([jnp.zeros((n_s,), jnp.int32),
                             jnp.ones((max_out,), jnp.int32)])
    off_pay = jnp.concatenate([offs, jnp.full((max_out,), -1, jnp.int32)])
    lo_pay = jnp.concatenate([lo, jnp.full((max_out,), -1, jnp.int32)])
    qid = jnp.concatenate([jnp.full((n_s,), jnp.int32(0x7FFFFFFF)), slot])
    mp, mt, mo, ml, mq = jax.lax.sort(
        (pos_m, tag_m, off_pay, lo_pay, qid), num_keys=2, is_stable=False)
    is_marker = (mt == 0).astype(jnp.int32)
    # owning s row index = (#markers at or before) - 1; (offs, lo) of
    # that row via running max (both monotone in sorted-S order)
    s_idx_m = jnp.cumsum(is_marker) - 1
    off_f = jax.lax.cummax(mo, axis=0)
    lo_f = jax.lax.cummax(ml, axis=0)
    # compact the slot entries back to slot order
    _, c_sidx, c_off, c_lo = jax.lax.sort(
        (mq, s_idx_m, off_f, lo_f), num_keys=1, is_stable=False)
    s_idx = jnp.clip(c_sidx[:max_out], 0, n_s - 1)
    r_pos = jnp.clip(c_lo[:max_out] + (slot - c_off[:max_out]),
                     0, rk.shape[0] - 1)
    valid = slot < total
    out_r = jnp.where(valid, rr[r_pos], 0)
    out_s = jnp.where(valid, sr[s_idx], 0)
    out_k = jnp.where(valid, rk[r_pos], 0)
    return out_r, out_s, out_k, valid, total
