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
    float inputs, int32 for integer inputs (callers chunk to stay exact).
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
