"""Single-chip hash-join orchestration.

TPU-native replacement for the reference's operator/control plane:
``HashJoin::join`` (operators/HashJoin.cpp:45-223) phase structure, minus the
network phases (those live in engine/distributed.py).  Where the reference
drains a serial task queue of per-partition BuildProbe/GPUWrapper tasks
(operators/HashJoin.cpp:187-204), the TPU engine expresses the whole phase
pipeline as one jit-compiled function — the "task queue" is the Pallas grid.

Modes (reference compile-time forks become runtime strategy choices):
  - ``banded``       — keys-only rotated partition + zero-copy band/window
                       Pallas probe (the fast path for near-uniform data)
  - ``partitioned``  — radix partition + tiered padded Pallas probe
                       (GPUWrapper/simple_hash_join_eth path, eth.cu:111-234)
  - ``mergecount``   — one concat-sort of R++S + run-product scans
                       (always-correct, gather-free; the terminal fallback)
  - ``sortmerge``    — global key-sort + vectorised binary-search count
                       (always-correct; shares code with the materialising path)
``join_count_checked`` chains the escalations banded -> tiered -> mergecount;
``skew_aware=True`` adds the heavy-key pre-pass to any mode.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import JoinConfig, DEFAULT_CONFIG
from ..data.tuples import Relation
from ..ops import skew as skew_ops
from ..ops.buildprobe import (probe_count_sorted, probe_count_merged,
                              probe_count_tiered, probe_count_banded,
                              probe_count_diagonal, bias_keys,
                              join_materialize)
from ..ops.partition import (partition_relation, partition_keys_rotated,
                             rotate_for_partition)
from ..ops.sort import sort_relation


class JoinResult(NamedTuple):
    """Device-side join outputs; aggregate with :func:`total_matches`."""
    matches: jnp.ndarray    # int32 partitioned-path matches
    heavy_cr: jnp.ndarray   # int32[K] per-heavy-key R frequency
    heavy_cs: jnp.ndarray   # int32[K] per-heavy-key S frequency
    ok: jnp.ndarray         # bool: no partition overflowed its tier


def total_matches(res: JoinResult) -> int:
    """64-bit host-side aggregation (the reference's uint64 RESULT_COUNTER,
    operators/HashJoin.cpp:28; final sum at rank 0, Measurements.cpp:599-606).
    Heavy-key products are multiplied here, in 64-bit — cr*cs overflows
    int32 under double-sided skew."""
    heavy = np.sum(np.asarray(res.heavy_cr, dtype=np.int64)
                   * np.asarray(res.heavy_cs, dtype=np.int64))
    return int(np.int64(np.asarray(res.matches)) + heavy)


def auto_fanout_bits(n: int, target_mean: int = 1024, max_bits: int = 20) -> int:
    """Radix bits so the mean partition is ~target_mean tuples (plays the
    role of the reference's fixed NETWORK+LOCAL fanout choice,
    core/Configuration.h:30-34, scaled to the input)."""
    bits = max(1, (max(2, n // target_mean) - 1).bit_length())
    return min(bits, max_bits)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "bits", "skew_aware", "mode", "shift"))
def join_count(r: Relation, s: Relation,
               cfg: JoinConfig = DEFAULT_CONFIG,
               bits: int | None = None,
               skew_aware: bool = False,
               mode: str = "partitioned",
               prng_seed: int = 0,
               shift: int = 0,
               r_valid_count=None,
               s_valid_count=None) -> JoinResult:
    """Count equi-join matches |{(i,j) : r.keys[i] == s.keys[j]}|.

    Phase structure (cf. HashJoin.cpp:45-223):
      1. (skew pre-pass) heavy-hitter detect + closed-form heavy counts
      2. histogram+partition both relations  [phases 1+3 of the reference,
         fused: the sort produces the layout the histogram/offset machinery
         of the reference only describes]
      3. per-partition tiered build/probe    [phase 4]

    ``r_valid_count``/``s_valid_count``: optional scalar counts marking a
    valid prefix (rows beyond are padding — used by the out-of-core driver's
    fixed-shape chunks).  In sortmerge mode padding rows are remapped to
    reserved sentinel keys, so the engine key domain is [0, 2^32 - 2).
    """
    zero_heavy = (jnp.zeros((cfg.max_heavy_keys,), jnp.int32),
                  jnp.zeros((cfg.max_heavy_keys,), jnp.int32))
    drop_r = drop_s = None
    if r_valid_count is not None:
        drop_r = jnp.arange(r.size, dtype=jnp.int32) >= r_valid_count
    if s_valid_count is not None:
        drop_s = jnp.arange(s.size, dtype=jnp.int32) >= s_valid_count

    if mode == "sortmerge":
        rk = r.keys if drop_r is None else \
            jnp.where(drop_r, jnp.uint32(0xFFFFFFFF), r.keys)
        sk = s.keys if drop_s is None else \
            jnp.where(drop_s, jnp.uint32(0xFFFFFFFE), s.keys)
        matches = probe_count_sorted(jnp.sort(rk), sk)
        if drop_r is not None:
            # sentinel self-matches are impossible (distinct sentinels), but
            # real keys equal to a sentinel are excluded from the domain.
            pass
        return JoinResult(matches, *zero_heavy, jnp.bool_(True))

    if bits is None:
        if cfg.two_level_partitioning and mode == "partitioned":
            # Reference geometry parity (ENABLE_TWO_LEVEL_PARTITIONING,
            # core/Configuration.h:28-34): network + local fanout levels.
            # Adjacent radix levels collapse into one sort (see
            # partition_two_level), so only the total bit count matters.
            bits = cfg.network_fanout_bits + cfg.local_fanout_bits
        else:
            # The banded probe wants fine partitions (its compare volume is
            # the S-window, ~ the per-row pid span), the padded/tiered probe
            # coarser ones (its cost is the padded capacity).
            target = 128 if mode == "banded" else 1024
            bits = auto_fanout_bits(max(r.size, s.size), target_mean=target,
                                    max_bits=22)
    n_parts = 1 << bits

    heavy_cr, heavy_cs = zero_heavy
    if skew_aware:
        # Padded rows must not pollute frequency estimates or heavy counts:
        # remap them to side-distinct sentinels (outside the key domain)
        # before detection; sentinel "heavy keys" then contribute
        # cr*cs = cr*0 = 0.
        rk_eff = r.keys if drop_r is None else \
            jnp.where(drop_r, jnp.uint32(0xFFFFFFFF), r.keys)
        sk_eff = s.keys if drop_s is None else \
            jnp.where(drop_s, jnp.uint32(0xFFFFFFFE), s.keys)
        key_r, key_s = jax.random.split(jax.random.key(prng_seed))
        hh_r = skew_ops.detect_heavy_keys(rk_eff, key_r, cfg.max_heavy_keys // 2)
        hh_s = skew_ops.detect_heavy_keys(sk_eff, key_s, cfg.max_heavy_keys // 2)
        hh = skew_ops.HeavyHitters(
            jnp.concatenate([hh_r.keys, hh_s.keys]),
            jnp.concatenate([hh_r.valid, hh_s.valid]))
        hh = skew_ops.dedup_heavy(hh)
        hmask_r = skew_ops.heavy_mask(r.keys, hh)
        hmask_s = skew_ops.heavy_mask(s.keys, hh)
        drop_r = hmask_r if drop_r is None else (drop_r | hmask_r)
        drop_s = hmask_s if drop_s is None else (drop_s | hmask_s)
        heavy_cr, heavy_cs = skew_ops.heavy_match_count(rk_eff, sk_eff, hh)

    if mode == "mergecount":
        # Always-exact concat-sort count (probe_count_merged): one sort of
        # |R|+|S|, no probe, no windows, arbitrary skew.  Placed after the
        # skew pre-pass so heavy keys (whose products need 64-bit) are
        # dropped here and multiplied host-side.  This is the terminal
        # escalation rung — ~3-5x cheaper than the searchsorted sortmerge.
        rk = r.keys if drop_r is None else \
            jnp.where(drop_r, jnp.uint32(0xFFFFFFFF), r.keys)
        sk = s.keys if drop_s is None else \
            jnp.where(drop_s, jnp.uint32(0xFFFFFFFE), s.keys)
        return JoinResult(probe_count_merged(rk, sk), heavy_cr, heavy_cs,
                          jnp.bool_(True))

    if mode == "diagonal":
        # Fastest count path for locally balanced sides: full key sort of
        # both relations (biased int32, order-preserving), then the
        # rank-diagonal probe — no partition ids, no histogram, no windows
        # beyond one searchsorted over row heads.  ok=False (drift beyond
        # +-k, band overflow, or size ratio >> 1) escalates to banded.
        rs = jax.lax.sort(bias_keys(r.keys, drop_r, 0xFFFFFFFF),
                          is_stable=False)   # keys-only: 2x vs stable
        ss = jax.lax.sort(bias_keys(s.keys, drop_s, 0xFFFFFFFE),
                          is_stable=False)
        matches, ok = probe_count_diagonal(
            rs, ss, k_drift=cfg.diagonal_k,
            rows_per_group=cfg.diagonal_rows_per_group)
        return JoinResult(matches, heavy_cr, heavy_cs, ok)

    if mode == "banded":
        # Count-only fast path: keys-only rotated partitioning (half the
        # sort traffic — rids never matter for counting, and rotation makes
        # the radix bits the sort prefix; see partition_keys_rotated).
        r_part = partition_keys_rotated(r.keys, bits, shift, drop_r)
        s_part = partition_keys_rotated(s.keys, bits, shift, drop_s)
        # Window sized to the expected S-rows an R row's pid span covers
        # (2 alignment rows + 4x the mean per-partition S rows of slack);
        # violations flip `ok` and callers escalate.
        mean_s_rows = max(1, -(-s.size // (n_parts * 128)))
        window = 2 + 4 * mean_s_rows
        gr = 32
        band = -(-(2 * gr * mean_s_rows + window + 8) // 8)
        matches, ok = probe_count_banded(
            r_part, s_part, window_rows=window, band_blocks=band,
            rows_per_group=gr,
            # Sentinels must be rotations of out-of-domain keys so no
            # rotated real key can collide with padding.
            r_pad_key=rotate_for_partition(0xFFFFFFFF, bits, shift),
            s_pad_key=rotate_for_partition(0xFFFFFFFE, bits, shift))
        return JoinResult(matches, heavy_cr, heavy_cs, ok)

    r_part = partition_relation(r, bits, shift, drop_r)
    s_part = partition_relation(s, bits, shift, drop_s)
    cap_r = cfg.partition_capacity(r.size, n_parts)
    cap_s = cfg.partition_capacity(s.size, n_parts)
    matches, ok = probe_count_tiered(
        r_part, s_part, cap_r, cap_s,
        tile=cfg.probe_tile, use_pallas=cfg.use_pallas)
    return JoinResult(matches, heavy_cr, heavy_cs, ok)


def join_count_checked(r: Relation, s: Relation,
                       cfg: JoinConfig = DEFAULT_CONFIG, **kw) -> int:
    """join_count + overflow escalation: if any partition overflowed the
    capacity tiers (extreme skew without skew_aware, or adversarial hashing),
    rerun via the always-correct sort-merge path — the runtime analogue of
    the reference's JOIN_ASSERT invariants (data/Window.cpp:180-191)."""
    res = join_count(r, s, cfg, **kw)
    if not bool(res.ok):
        kw2 = {k: v for k, v in kw.items()
               if k in ("r_valid_count", "s_valid_count", "shift")}
        mode = kw.get("mode", "partitioned")
        skew = kw.get("skew_aware", False)
        # Escalation ladder: diagonal -> banded -> tiered -> mergecount.
        # Each rung widens the probe's coverage (rank-diagonal band ->
        # partition windows -> padded capacity tiers); the terminal rung
        # is the unconditional concat-sort count (skew-aware so heavy-key
        # products are aggregated host-side in 64-bit).
        ladder = {"diagonal": ("banded", "partitioned"),
                  "banded": ("partitioned",)}
        for nxt in ladder.get(mode, ()):
            res = join_count(r, s, cfg, mode=nxt, skew_aware=skew, **kw2)
            if bool(res.ok):
                return total_matches(res)
        res = join_count(r, s, cfg, mode="mergecount", skew_aware=True, **kw2)
    return total_matches(res)


@functools.partial(jax.jit, static_argnames=("max_out",))
def join_rows(r: Relation, s: Relation, max_out: int):
    """Materialising join: (r_rid, s_rid) pairs (reference `probe`,
    kernels.cu:199-246).  Static output bound ``max_out``; see
    ops/buildprobe.join_materialize for overflow semantics."""
    return join_materialize(r.keys, r.rids, s.keys, s.rids, max_out)


@functools.partial(jax.jit, static_argnames=("bits",))
def prepare_build_side(r: Relation, bits: int):
    """Partition the build relation once for reuse across many probes.

    Real deployments join a fact stream against the same dimension side
    repeatedly; the reference rebuilds its hash table per join
    (BuildProbe.cpp:47-68).  Here the 'hash table' is the rotated sorted
    layout (docs/DESIGN.md §2), so preparing the build side once removes
    its sort — roughly halving steady-state join cost.  Count-only (keys
    are rotated in place).
    """
    return partition_keys_rotated(r.keys, bits)


@functools.partial(jax.jit, static_argnames=("cfg", "bits"))
def join_count_prepared(build, s: Relation,
                        cfg: JoinConfig = DEFAULT_CONFIG,
                        bits: int | None = None):
    """Banded count join against a prepared build side.

    ``build`` must come from prepare_build_side with the same ``bits``.
    Returns (matches_i32, ok); escalate via join_count on ok=False.
    """
    if bits is None:
        bits = auto_fanout_bits(s.size, target_mean=128, max_bits=22)
    n_parts = 1 << bits
    s_part = partition_keys_rotated(s.keys, bits)
    mean_s_rows = max(1, -(-s.size // (n_parts * 128)))
    window = 2 + 4 * mean_s_rows
    gr = 32
    band = -(-(2 * gr * mean_s_rows + window + 8) // 8)
    return probe_count_banded(
        build, s_part, window_rows=window, band_blocks=band,
        rows_per_group=gr,
        r_pad_key=rotate_for_partition(0xFFFFFFFF, bits),
        s_pad_key=rotate_for_partition(0xFFFFFFFE, bits))


@jax.jit
def prepare_build_sorted(r: Relation):
    """Sort the build side once (biased int32) for reuse across many
    diagonal probes — the steady-state 'hash table' of the fastest path."""
    return jax.lax.sort(bias_keys(r.keys), is_stable=False)


@functools.partial(jax.jit, static_argnames=("cfg",))
def join_count_prepared_diagonal(r_sorted_biased, s: Relation,
                                 cfg: JoinConfig = DEFAULT_CONFIG):
    """Diagonal count join against a prepared (pre-sorted) build side.

    Steady-state cost = one S sort + the rank-band probe.  Returns
    (matches_i32, ok); escalate via join_count on ok=False.
    """
    ss = jax.lax.sort(bias_keys(s.keys, None, 0xFFFFFFFE), is_stable=False)
    return probe_count_diagonal(
        r_sorted_biased, ss, k_drift=cfg.diagonal_k,
        rows_per_group=cfg.diagonal_rows_per_group)


def join_rows_auto(r: Relation, s: Relation, start_max_out: int | None = None,
                   growth: int = 4, max_attempts: int = 8):
    """join_rows with the reference's overflow-retry protocol: when the
    output bound overflows (cf. probe_match_rate's partition-done flags and
    re-invocation, kernels.cu:376-403), rerun with a ``growth``x larger
    bound.  Each bound is one compiled executable; repeated workloads reuse
    the cache."""
    max_out = start_max_out or max(1024, max(r.size, s.size))
    for _ in range(max_attempts):
        out_r, out_s, out_k, valid, total = join_rows(r, s, max_out)
        if int(total) <= max_out:
            return out_r, out_s, out_k, valid, int(total)
        max_out = max(int(total), max_out * growth)
    raise RuntimeError(f"join output exceeded bound after {max_attempts} "
                       f"attempts (last bound {max_out})")
