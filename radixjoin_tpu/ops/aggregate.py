"""Hash aggregate (group-by) operator.

Extended-operator-set member (BASELINE.json north star: "hash aggregate").
The scatter/atomic hash table of a GPU aggregate is recast as
**sort-by-key + segment reduction**: after a key sort, each group is a
contiguous run; per-group sums fall out of an inclusive cumsum differenced at
run boundaries, and boundaries come from a vectorised neighbour-compare.
This shares all of its machinery with the join's partitioner (ops/partition)
— the same "scatter becomes sort" design decision.

Output shape is static: ``max_groups`` slots, valid-prefix + count, matching
the engine-wide (data, count) convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _group_reduce_compact(sorted_keys, is_start, csum, n_groups,
                          max_groups: int):
    """Shared segment-reduction core: compact per-group (before-sum, key)
    triples into ``max_groups`` slots WITHOUT data-dependent gathers.

    The obvious formulation — ``searchsorted`` for each group's start /
    end then ``csum[...]`` — lowers to ~log2(n) binary-search passes of
    max_groups-sized random gathers, the measured-slowest op class on
    this TPU (322 ms per 16.7M-element gather; it made the SF100
    pipeline's aggregation ~25 s per 2^28-row run).  Instead, ONE
    unstable sort compacts the group starts: sort (pos-if-start else
    INT_MAX) carrying (csum-before-position, key) as payload operands,
    then slice the first max_groups+1 entries.  group_sum[g] =
    before[g+1] - before[g] (the masked/non-start rows between groups
    contribute zero to csum, so the difference is exact), with the last
    live group closed by the total.  Cost: one 3-operand n-sort — ~30x
    cheaper than the gather cascade at 2^28.
    """
    n = sorted_keys.shape[0]
    csum_prev = jnp.concatenate(
        [jnp.zeros((1,), csum.dtype), csum[:-1]])
    pos = jnp.arange(n, dtype=jnp.int32)
    a = jnp.where(is_start, pos, jnp.int32(0x7FFFFFFF))
    keys_in = sorted_keys
    if max_groups + 1 > n:
        # the slices below read max_groups+1 leading entries; pad with
        # non-start filler (masked by ``valid`` anyway)
        pad = max_groups + 1 - n
        a = jnp.concatenate([a, jnp.full((pad,), jnp.int32(0x7FFFFFFF))])
        csum_prev = jnp.concatenate(
            [csum_prev, jnp.zeros((pad,), csum.dtype)])
        keys_in = jnp.concatenate(
            [keys_in, jnp.zeros((pad,), keys_in.dtype)])
    _, sb, sc = jax.lax.sort((a, csum_prev, keys_in), num_keys=1,
                             is_stable=False)
    gslot = jnp.arange(max_groups, dtype=jnp.int32)
    valid = gslot < n_groups
    before = sb[:max_groups]
    nxt = jnp.where(gslot == n_groups - 1, csum[n - 1],
                    sb[1:max_groups + 1])
    sums = jnp.where(valid, nxt - before, 0)
    gkeys = jnp.where(valid, sc[:max_groups], 0)
    return gkeys, sums, valid


def aggregate_sum(keys: jnp.ndarray, values: jnp.ndarray, max_groups: int):
    """Group-by-key sum.  Returns (group_keys, group_sums, valid, n_groups).

    ``values`` may be any integer/float dtype; sums are in float32 for
    float inputs, int32 for integer inputs.  A single group whose true sum
    exceeds 2^31 wraps (int) or loses precision (float32) — callers must
    either chunk values to stay inside int32, or use
    :func:`aggregate_sum_exact`, the 64-bit-exact plane-decomposed variant
    with an explicit ok flag.  Groups beyond ``max_groups`` are dropped
    from the output slots; check the returned ``n_groups <= max_groups``
    when every group must be present.
    """
    sk, sv = jax.lax.sort((keys, values), num_keys=1)
    # Run starts: position 0 or key differs from predecessor.
    prev = jnp.concatenate([sk[:1] ^ jnp.uint32(1), sk[:-1]]) \
        if sk.dtype == jnp.uint32 else jnp.concatenate([sk[:1] - 1, sk[:-1]])
    is_start = (sk != prev).at[0].set(True)
    n_groups = jnp.sum(is_start.astype(jnp.int32))

    csum = jnp.cumsum(sv.astype(jnp.int32 if jnp.issubdtype(sv.dtype, jnp.integer)
                                else jnp.float32))
    gkeys, sums, valid = _group_reduce_compact(sk, is_start, csum,
                                               n_groups, max_groups)
    return gkeys, sums, valid, n_groups


def aggregate_count(keys: jnp.ndarray, max_groups: int):
    """Group-by-key count (values = 1)."""
    ones = jnp.ones_like(keys, dtype=jnp.int32)
    return aggregate_sum(keys, ones, max_groups)


def aggregate_sum_exact(keys: jnp.ndarray, values: jnp.ndarray,
                        max_groups: int):
    """Group-by-key sum, exact past int32 — the overflow-safe sibling of
    :func:`aggregate_sum` (the same guarantee the engine's count paths get
    from 15/15-bit merged partials, ops/buildprobe._merged_partials).

    ``values`` must be non-negative integers < 2^32 (uint32/int32).  Each
    value is split into four 8-bit PLANES; per-plane per-group sums come
    from the usual cumsum-difference, which is exact mod 2^32 uncondition-
    ally, and exactly representable in int32 whenever the group has fewer
    than 2^23 rows (count * 255 < 2^31).  The host combiner
    :func:`combine_sum_planes` reassembles true 64-bit sums (up to ~2^55).

    Returns (group_keys, plane_sums int32[4, max_groups], group_counts,
    valid, n_groups, ok) — ``ok`` False iff some group has >= 2^23 rows,
    in which case plane sums may have wrapped; split the input (by value
    chunking or key range) and re-aggregate.  As with
    :func:`aggregate_sum`, groups beyond ``max_groups`` are dropped from
    the output slots — callers must check the returned ``n_groups <=
    max_groups`` if they need every group.
    """
    v = values.astype(jnp.uint32)
    sk, sv = jax.lax.sort((keys, v), num_keys=1)
    n = sk.shape[0]
    prev = jnp.concatenate([sk[:1] ^ jnp.uint32(1), sk[:-1]]) \
        if sk.dtype == jnp.uint32 else jnp.concatenate([sk[:1] - 1, sk[:-1]])
    is_start = (sk != prev).at[0].set(True)
    n_groups = jnp.sum(is_start.astype(jnp.int32))

    # Compaction-sort formulation (see _group_reduce_compact): ONE sort
    # carrying all four plane prefix sums + the count prefix + the key,
    # instead of gather-lowered searchsorted boundary lookups.
    def prev_of(csum):
        return jnp.concatenate([jnp.zeros((1,), csum.dtype), csum[:-1]])

    csums = [jnp.cumsum(((sv >> jnp.uint32(8 * p)) & jnp.uint32(0xFF))
                        .astype(jnp.int32)) for p in range(4)]
    ccnt = jnp.cumsum(jnp.ones((n,), jnp.int32))
    pos = jnp.arange(n, dtype=jnp.int32)
    a = jnp.where(is_start, pos, jnp.int32(0x7FFFFFFF))
    key_col = sk
    before_cols = [prev_of(c) for c in csums] + [prev_of(ccnt)]
    if max_groups + 1 > n:
        # the slices below read max_groups+1 leading entries (same
        # padding branch as _group_reduce_compact: pad with non-start
        # filler, masked by ``valid``) — so max_groups == n is legal,
        # matching aggregate_count-style usage
        pad = max_groups + 1 - n
        a = jnp.concatenate([a, jnp.full((pad,), jnp.int32(0x7FFFFFFF))])
        key_col = jnp.concatenate([key_col, jnp.zeros((pad,), sk.dtype)])
        before_cols = [jnp.concatenate([c, jnp.zeros((pad,), c.dtype)])
                       for c in before_cols]
    sorted_ops = jax.lax.sort(
        (a, key_col, *before_cols), num_keys=1, is_stable=False)
    skey = sorted_ops[1]
    befores = sorted_ops[2:]
    gslot = jnp.arange(max_groups, dtype=jnp.int32)
    valid = gslot < n_groups

    def seg(before_sorted, csum):
        nxt = jnp.where(gslot == n_groups - 1, csum[n - 1],
                        before_sorted[1:max_groups + 1])
        return jnp.where(valid, nxt - before_sorted[:max_groups], 0)

    planes = jnp.stack([seg(befores[p], csums[p]) for p in range(4)])
    counts = seg(befores[4], ccnt)
    ok = jnp.all(counts < jnp.int32(1 << 23))
    gkeys = jnp.where(valid, skey[:max_groups], 0)
    return gkeys, planes, counts, valid, n_groups, ok


def combine_sum_planes(planes) -> "np.ndarray":
    """Host-side reassembly of :func:`aggregate_sum_exact` plane sums into
    true int64 group sums (the 'result aggregation node' role, reference
    Configuration.h:19)."""
    import numpy as np
    p = np.asarray(planes).astype(np.int64)
    return p[0] + (p[1] << 8) + (p[2] << 16) + (p[3] << 24)


def aggregate_sum_sorted(sorted_keys: jnp.ndarray, values: jnp.ndarray,
                         mask: jnp.ndarray, max_groups: int):
    """Group-by over **already key-sorted** data, skipping masked-out rows.

    The sort-free fast path for pipelines whose join output is emitted in
    sorted-key order (ops/buildprobe.join_materialize_windowed).
    PRECONDITION: ``mask`` must be constant within each equal-key run —
    true by construction for join-match masks (every row of a key matches
    the same dim rows) — so a masked group start reduces to a shifted-
    neighbour compare, no segmented scan.  Groups whose rows are masked
    out produce no output slot (unmatched keys can't flood ``max_groups``).

    Returns (group_keys, group_sums, valid, n_groups) like aggregate_sum.
    """
    m = mask.astype(jnp.int32)
    prev_mask = jnp.concatenate([jnp.zeros((1,), jnp.int32), m[:-1]])
    prev_key = jnp.concatenate([sorted_keys[:1], sorted_keys[:-1]])
    is_start = (m == 1) & ((prev_mask == 0) | (sorted_keys != prev_key))
    is_start = is_start.at[0].set(mask[0])
    n_groups = jnp.sum(is_start.astype(jnp.int32))

    vals = jnp.where(mask, values, 0)
    csum = jnp.cumsum(vals.astype(
        jnp.int32 if jnp.issubdtype(vals.dtype, jnp.integer)
        else jnp.float32))
    # Masked rows between groups contribute zero to csum, so the
    # compaction core's before[g+1]-before[g] differences stay exact.
    gkeys, sums, valid = _group_reduce_compact(sorted_keys, is_start,
                                               csum, n_groups, max_groups)
    return gkeys, sums, valid, n_groups
