"""Skew detection and heavy-hitter handling.

TPU-native replacement for the reference's skew subsystem
(operators/gpu/kernels_optimized.cu):
  - ``skew_detect`` / ``skew_detect_pth`` (:301-311, :467-476) — flag
    partitions whose probe side exceeds a threshold.
  - ``generate_block_mapping`` + ``probe_skew`` (:321-457) — spread a heavy
    partition across many blocks.
  - ``probe_skew_dynamic`` (:864-943) — CUDA dynamic parallelism for
    recursively splitting ranges.

On TPU the same three capability classes become:
  1. **Partition-level skew** -> capacity *tiers*: the padded-partition probe
     runs once per tier with geometrically growing capacity, each pass
     masking partitions outside its tier (ops/buildprobe handles any tier via
     its counts masks).  This replaces block remapping: the "blocks" are grid
     steps of a wider kernel, assigned statically.
  2. **Key-level skew** (single keys too frequent for any tier) -> explicit
     heavy-hitter extraction: estimate top keys by sampling, count exact
     R/S frequencies by vectorised compare-reduce, contribute
     ``count_R(k) * count_S(k)`` matches directly, and drop those rows from
     the partitioned path via the partitioner's drop_mask.  This replaces
     the recursive dynamic-parallelism kernel with closed-form math — a
     frequency-f key needs no hash table at all.
  3. A whole-relation **sort-merge fallback** (ops/buildprobe.probe_count_
     sorted) remains correct for any skew, used when tiering is disabled.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .aggregate import aggregate_count

# Filler for unused heavy-key slots; rows are removed from the partitioned
# path via heavy_mask + partition drop_mask, never by key rewriting, so this
# value only needs to be an unlikely key, not a reserved one.
# (Plain int, NOT jnp: a module-level jnp constant would initialise the
# default jax backend at import time, before callers can choose a platform.)
_R_SENTINEL = 0xFFFFFFFF


def detect_skewed_partitions(counts: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Boolean mask of partitions exceeding the padded capacity — the
    analogue of skew_detect's threshold test (kernels_optimized.cu:301-311).
    """
    return counts > jnp.int32(capacity)


def partition_tiers(counts: jnp.ndarray, base_capacity: int, n_tiers: int,
                    growth: int = 4) -> jnp.ndarray:
    """Assign each partition the smallest tier whose capacity holds it.

    tier t capacity = base_capacity * growth**t; partitions larger than the
    top tier get tier == n_tiers (escalate to the heavy path).
    """
    tier = jnp.full(counts.shape, n_tiers, jnp.int32)
    for t in range(n_tiers - 1, -1, -1):
        cap = base_capacity * (growth ** t)
        tier = jnp.where(counts <= jnp.int32(cap), jnp.int32(t), tier)
    return tier


class HeavyHitters(NamedTuple):
    keys: jnp.ndarray   # uint32[K] candidate heavy keys
    valid: jnp.ndarray  # bool[K]


def detect_heavy_keys(keys: jnp.ndarray, prng_key, max_heavy: int,
                      sample_size: int = 1 << 16,
                      min_est_frequency: float = 1e-3) -> HeavyHitters:
    """Estimate the top-``max_heavy`` keys by frequency via uniform sampling.

    A key is flagged heavy if its estimated global frequency exceeds
    ``min_est_frequency``.  Deterministic in ``prng_key``.
    """
    n = keys.shape[0]
    sample_size = min(sample_size, n)
    idx = jax.random.randint(prng_key, (sample_size,), 0, n)
    sample = keys[idx]
    gkeys, gcounts, gvalid, _ = aggregate_count(sample, sample_size)
    gcounts = jnp.where(gvalid, gcounts, 0)
    top = jax.lax.top_k(gcounts, max_heavy)
    top_counts, top_idx = top
    min_count = jnp.int32(max(1, int(min_est_frequency * sample_size)))
    valid = top_counts >= min_count
    hkeys = jnp.where(valid, gkeys[top_idx], jnp.uint32(_R_SENTINEL))
    return HeavyHitters(hkeys, valid)


def dedup_heavy(hh: HeavyHitters) -> HeavyHitters:
    """Invalidate duplicate heavy-key slots (keep the first occurrence).

    Needed when heavy sets detected on R and S are merged — a key present in
    both would otherwise contribute its match product twice.
    """
    k = hh.keys.shape[0]
    eq = hh.keys[:, None] == hh.keys[None, :]          # [K, K]
    earlier = (jnp.arange(k)[None, :] < jnp.arange(k)[:, None])
    dup = jnp.any(eq & earlier & hh.valid[None, :], axis=1)
    return HeavyHitters(hh.keys, hh.valid & ~dup)


def count_exact(keys: jnp.ndarray, hh: HeavyHitters) -> jnp.ndarray:
    """Exact frequency of each heavy key by compare-reduce (VPU, one pass)."""
    eq = keys[None, :] == hh.keys[:, None]          # [K, N]
    return jnp.sum(eq, axis=1, dtype=jnp.int32) * hh.valid.astype(jnp.int32)


def heavy_match_count(r_keys: jnp.ndarray, s_keys: jnp.ndarray,
                      hh: HeavyHitters):
    """Join contribution of heavy keys: per-key (count_R, count_S) factors.

    Closed-form replacement for probing heavy partitions
    (kernels_optimized.cu:364-457).  Returns (cr, cs) int32 per key; the
    products cr*cs can exceed int32 under double-sided skew (e.g. a 22M-
    frequency Zipf key on both sides), so callers multiply HOST-side in
    64-bit — exactly where the reference's uint64 RESULT_COUNTER lives.
    """
    cr = count_exact(r_keys, hh)
    cs = count_exact(s_keys, hh)
    return cr, cs


def heavy_mask(keys: jnp.ndarray, hh: HeavyHitters) -> jnp.ndarray:
    """Boolean mask of rows whose key is a (valid) heavy hitter.

    Fed to partition_relation(drop_mask=...) so heavy rows leave the
    partitioned path entirely (they are accounted by heavy_match_count).
    """
    eq = keys[None, :] == hh.keys[:, None]            # [K, N]
    eq = eq & hh.valid[:, None]
    return jnp.any(eq, axis=0)


# ---------------------------------------------------------------------------
# 64-bit (hi, lo)-plane variants — the wide-key mirror of the machinery
# above (reference keys are uint64 end-to-end, data/Tuple.h:15-22; its
# skew kernels act on the 8 B data words regardless of key width).
# ---------------------------------------------------------------------------


class HeavyHitters64(NamedTuple):
    key_hi: jnp.ndarray   # uint32[K]
    key_lo: jnp.ndarray   # uint32[K]
    valid: jnp.ndarray    # bool[K]


def detect_heavy_keys64(key_hi: jnp.ndarray, key_lo: jnp.ndarray,
                        prng_key, max_heavy: int,
                        sample_size: int = 1 << 16,
                        min_est_frequency: float = 1e-3) -> HeavyHitters64:
    """Top-``max_heavy`` 64-bit keys by sampled frequency.

    Pair-exact (no hash folding): the sample's (hi, lo) pairs are
    2-key-sorted, per-group counts come from the cumsum-difference over
    run starts, and a compaction sort carries BOTH planes to the top-k
    slots — the same gather-free pattern as ops/aggregate."""
    n = key_hi.shape[0]
    sample_size = min(sample_size, n)
    idx = jax.random.randint(prng_key, (sample_size,), 0, n)
    sh, sl = key_hi[idx], key_lo[idx]
    sh, sl = jax.lax.sort((sh, sl), num_keys=2, is_stable=False)
    prev_h = jnp.concatenate([sh[:1] ^ jnp.uint32(1), sh[:-1]])
    prev_l = jnp.concatenate([sl[:1] ^ jnp.uint32(1), sl[:-1]])
    is_start = ((sh != prev_h) | (sl != prev_l)).at[0].set(True)
    pos = jnp.arange(sample_size, dtype=jnp.int32)
    csum = jnp.cumsum(jnp.ones((sample_size,), jnp.int32))
    csum_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), csum[:-1]])
    a = jnp.where(is_start, pos, jnp.int32(0x7FFFFFFF))
    n_groups = jnp.sum(is_start.astype(jnp.int32))
    _, before, gh, gl = jax.lax.sort((a, csum_prev, sh, sl), num_keys=1,
                                     is_stable=False)
    gslot = jnp.arange(sample_size, dtype=jnp.int32)
    gvalid = gslot < n_groups
    nxt = jnp.where(gslot == n_groups - 1, csum[sample_size - 1],
                    jnp.concatenate([before[1:], csum[-1:]]))
    gcounts = jnp.where(gvalid, nxt - before, 0)
    top_counts, top_idx = jax.lax.top_k(gcounts, max_heavy)
    min_count = jnp.int32(max(1, int(min_est_frequency * sample_size)))
    valid = top_counts >= min_count
    hk_hi = jnp.where(valid, gh[top_idx], jnp.uint32(0xFFFFFFFF))
    hk_lo = jnp.where(valid, gl[top_idx], jnp.uint32(0xFFFFFFFF))
    return HeavyHitters64(hk_hi, hk_lo, valid)


def dedup_heavy64(hh: HeavyHitters64) -> HeavyHitters64:
    k = hh.key_hi.shape[0]
    eq = ((hh.key_hi[:, None] == hh.key_hi[None, :])
          & (hh.key_lo[:, None] == hh.key_lo[None, :]))
    earlier = (jnp.arange(k)[None, :] < jnp.arange(k)[:, None])
    dup = jnp.any(eq & earlier & hh.valid[None, :], axis=1)
    return HeavyHitters64(hh.key_hi, hh.key_lo, hh.valid & ~dup)


def count_exact64(key_hi, key_lo, hh: HeavyHitters64) -> jnp.ndarray:
    eq = ((key_hi[None, :] == hh.key_hi[:, None])
          & (key_lo[None, :] == hh.key_lo[:, None]))
    return jnp.sum(eq, axis=1, dtype=jnp.int32) * hh.valid.astype(jnp.int32)


def heavy_mask64(key_hi, key_lo, hh: HeavyHitters64) -> jnp.ndarray:
    eq = ((key_hi[None, :] == hh.key_hi[:, None])
          & (key_lo[None, :] == hh.key_lo[:, None])
          & hh.valid[:, None])
    return jnp.any(eq, axis=0)
