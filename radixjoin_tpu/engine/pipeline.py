"""Composed query pipelines: filter -> join -> aggregate.

The north-star pipeline config (BASELINE.json: "Pipeline query: filter ->
hash join -> hash aggregate (TPC-H-style lineitem><orders, SF100)").  The
reference engine hard-wires exactly one query shape (the equi-join,
main.cpp:116-126); this module composes the extended operator set into the
canonical analytics pipeline while staying one jit-compiled program, so XLA
fuses the filter mask into the partitioning sort and the aggregate shares
the join's sorted layout.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import JoinConfig, DEFAULT_CONFIG
from ..data.tuples import Relation
from ..ops.aggregate import aggregate_sum
from ..ops.buildprobe import join_materialize
from ..ops.filter import filter_mask


class PipelineResult(NamedTuple):
    group_keys: jnp.ndarray   # uint32[max_groups]
    group_sums: jnp.ndarray   # int32/float32[max_groups]
    group_valid: jnp.ndarray  # bool[max_groups]
    n_groups: jnp.ndarray     # int32
    join_count: jnp.ndarray   # int32 (pre-aggregate join cardinality)


@functools.partial(jax.jit, static_argnames=("r_pred", "s_pred", "max_out",
                                             "max_groups", "value_of"))
def filter_join_aggregate(r: Relation, s: Relation,
                          r_pred: Callable | None,
                          s_pred: Callable | None,
                          max_out: int,
                          max_groups: int,
                          value_of: Callable | None = None
                          ) -> PipelineResult:
    """SELECT r.key, SUM(value) FROM r JOIN s USING(key)
       WHERE r_pred(r) AND s_pred(s) GROUP BY group_key.

    - Filters are fused as masks: filtered-out rows keep their storage but
      are excluded via a key rewrite to a per-side non-joining shadow domain
      (top-bit tagging), so no compaction pass is needed.
    - ``value_of(r_rid, s_rid) -> value`` defaults to counting (value 1).
    - Grouping key is the join key of each output row.
    """
    rk, sk = r.keys, s.keys
    if r_pred is not None:
        keep_r = filter_mask(r, r_pred)
    else:
        keep_r = jnp.ones_like(rk, dtype=bool)
    if s_pred is not None:
        keep_s = filter_mask(s, s_pred)
    else:
        keep_s = jnp.ones_like(sk, dtype=bool)

    # Masked rows must never match: map them into disjoint shadow domains —
    # R-filtered rows into [0x80000000, 0xBFFFFFFF], S-filtered into
    # [0xC0000000, 0xFFFFFFFF] (low 30 key bits kept for stable ordering).
    # The ranges are disjoint from each other AND from live keys (documented
    # < 2^31 for pipeline queries; TPC-H key spaces fit), so no masked row
    # can ever join.
    mask30 = jnp.uint32(0x3FFFFFFF)
    rk = jnp.where(keep_r, rk, jnp.uint32(0x80000000) | (rk & mask30))
    sk = jnp.where(keep_s, sk, jnp.uint32(0xC0000000) | (sk & mask30))

    out_r, out_s, out_key, valid, total = join_materialize(
        rk, r.rids, sk, s.rids, max_out)
    # Shadow group for invalid slots so they aggregate separately and are
    # dropped below.
    out_key = jnp.where(valid, out_key, jnp.uint32(0xFFFFFFFF))

    if value_of is None:
        values = valid.astype(jnp.int32)
    else:
        values = jnp.where(valid, value_of(out_r, out_s), 0)
    gk, gs, gvalid, ng = aggregate_sum(out_key, values, max_groups)
    # The invalid-slot shadow group (key 0xFFFFFFFF) must be dropped.
    real = gvalid & (gk != jnp.uint32(0xFFFFFFFF))
    return PipelineResult(gk, gs, real, jnp.sum(real.astype(jnp.int32)),
                          total)
