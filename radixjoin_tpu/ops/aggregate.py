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


def aggregate_sum(keys: jnp.ndarray, values: jnp.ndarray, max_groups: int):
    """Group-by-key sum.  Returns (group_keys, group_sums, valid, n_groups).

    ``values`` may be any integer/float dtype; sums are in float32 for
    float inputs, int32 for integer inputs.  A single group whose true sum
    exceeds 2^31 wraps (int) or loses precision (float32) — callers must
    either chunk values to stay inside int32, or use
    :func:`aggregate_sum_exact`, the 64-bit-exact plane-decomposed variant
    with an explicit ok flag.
    """
    sk, sv = jax.lax.sort((keys, values), num_keys=1)
    n = sk.shape[0]
    # Run starts: position 0 or key differs from predecessor.
    prev = jnp.concatenate([sk[:1] ^ jnp.uint32(1), sk[:-1]]) \
        if sk.dtype == jnp.uint32 else jnp.concatenate([sk[:1] - 1, sk[:-1]])
    is_start = sk != prev
    is_start = is_start.at[0].set(True)
    group_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1   # [0, G)
    n_groups = group_id[-1] + 1

    csum = jnp.cumsum(sv.astype(jnp.int32 if jnp.issubdtype(sv.dtype, jnp.integer)
                                else jnp.float32))
    # start index of each group g (first position with group_id == g)
    gslot = jnp.arange(max_groups, dtype=jnp.int32)
    starts = jnp.searchsorted(group_id, gslot, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(group_id, gslot, side="right").astype(jnp.int32)
    valid = gslot < n_groups
    starts_c = jnp.clip(starts, 0, n - 1)
    ends_c = jnp.clip(ends - 1, 0, n - 1)
    hi = csum[ends_c]
    lo = jnp.where(starts_c > 0, csum[starts_c - 1], 0)
    sums = jnp.where(valid, hi - lo, 0)
    gkeys = jnp.where(valid, sk[starts_c], 0)
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
    chunking or key range) and re-aggregate.
    """
    v = values.astype(jnp.uint32)
    sk, sv = jax.lax.sort((keys, v), num_keys=1)
    n = sk.shape[0]
    prev = jnp.concatenate([sk[:1] ^ jnp.uint32(1), sk[:-1]]) \
        if sk.dtype == jnp.uint32 else jnp.concatenate([sk[:1] - 1, sk[:-1]])
    is_start = (sk != prev).at[0].set(True)
    group_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    n_groups = group_id[-1] + 1

    gslot = jnp.arange(max_groups, dtype=jnp.int32)
    starts = jnp.searchsorted(group_id, gslot, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(group_id, gslot, side="right").astype(jnp.int32)
    valid = gslot < n_groups
    starts_c = jnp.clip(starts, 0, n - 1)
    ends_c = jnp.clip(ends - 1, 0, n - 1)

    def seg_sums(plane_vals):
        csum = jnp.cumsum(plane_vals.astype(jnp.int32))
        hi = csum[ends_c]
        lo = jnp.where(starts_c > 0, csum[starts_c - 1], 0)
        return jnp.where(valid, hi - lo, 0)

    planes = jnp.stack([seg_sums((sv >> jnp.uint32(8 * p))
                                 & jnp.uint32(0xFF))
                        for p in range(4)])
    counts = jnp.where(valid, ends - starts, 0)
    ok = jnp.all(counts < jnp.int32(1 << 23))
    gkeys = jnp.where(valid, sk[starts_c], 0)
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
    n = sorted_keys.shape[0]
    m = mask.astype(jnp.int32)
    prev_mask = jnp.concatenate([jnp.zeros((1,), jnp.int32), m[:-1]])
    prev_key = jnp.concatenate([sorted_keys[:1], sorted_keys[:-1]])
    is_start = (m == 1) & ((prev_mask == 0) | (sorted_keys != prev_key))
    is_start = is_start.at[0].set(mask[0])
    cstart = jnp.cumsum(is_start.astype(jnp.int32))    # starts <= i
    n_groups = cstart[-1]

    vals = jnp.where(mask, values, 0)
    csum = jnp.cumsum(vals.astype(
        jnp.int32 if jnp.issubdtype(vals.dtype, jnp.integer)
        else jnp.float32))

    gslot = jnp.arange(max_groups, dtype=jnp.int32)
    starts = jnp.searchsorted(cstart, gslot + 1, side="left"
                              ).astype(jnp.int32)
    ends = jnp.searchsorted(cstart, gslot + 2, side="left").astype(jnp.int32)
    valid = gslot < n_groups
    starts_c = jnp.clip(starts, 0, n - 1)
    ends_c = jnp.clip(ends - 1, 0, n - 1)
    hi = csum[ends_c]
    lo = jnp.where(starts_c > 0, csum[starts_c - 1], 0)
    sums = jnp.where(valid, hi - lo, 0)
    gkeys = jnp.where(valid, sorted_keys[starts_c], 0)
    return gkeys, sums, valid, n_groups
