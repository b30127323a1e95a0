"""Filter (selection) operator with scatter-free compaction.

Extended-operator-set member (BASELINE.json north star).  The reference has
no standalone filter, but its pipelines assume selection feeding the join;
the TPC-H-style pipeline config (filter -> join -> aggregate) requires one.

Compaction on TPU: a data-dependent compact is a scatter, so it is recast as
a **stable sort on the negated predicate** — selected rows sort to the front
in original order, and the selected count is the predicate's sum.  Fixed
output shape (same N, valid prefix) keeps everything jit-static; downstream
operators consume (relation, count) pairs and mask, exactly like partitions
carry (starts, counts).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..data.tuples import Relation


def filter_relation(rel: Relation, predicate: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]):
    """Compact rows where predicate(keys, rids) is True.

    Returns (Relation with selected rows as a stable front prefix, count).
    """
    keep = predicate(rel.keys, rel.rids)
    sel_count = jnp.sum(keep.astype(jnp.int32))
    # Stable sort by !keep: True(keep) -> 0 sorts first.
    tag = (~keep).astype(jnp.int32)
    _, keys, rids = jax.lax.sort((tag, rel.keys, rel.rids), num_keys=1,
                                 is_stable=True)
    return Relation(keys, rids), sel_count


def filter_mask(rel: Relation, predicate) -> jnp.ndarray:
    """Mask-only form for fused pipelines (no data movement)."""
    return predicate(rel.keys, rel.rids)
