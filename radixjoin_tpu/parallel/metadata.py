"""Distributed partition metadata: global histograms, assignment, offsets.

TPU-native replacement for the reference's ``histograms/`` layer:
  - LocalHistogram  (histograms/LocalHistogram.cpp:35-53)  -> per-shard
    bincount (ops/histogram) inside shard_map.
  - GlobalHistogram (histograms/GlobalHistogram.cpp:37-42, MPI_Allreduce)
    -> ``jax.lax.psum`` over the mesh axis.
  - AssignmentMap   (histograms/AssignmentMap.cpp:41-43) -> the same pure
    round-robin ``partition % n_devices``.
  - OffsetMap       (histograms/OffsetMap.cpp:59-93): baseOffsets /
    relativeWriteOffsets (MPI_Exscan) / absoluteWriteOffsets -> an
    ``all_gather`` of local histograms + exclusive scans along the device
    axis.  The reference needs these to make every RMA put disjoint; the TPU
    shuffle (parallel/shuffle.py) needs them to place received segments, and
    they remain the engine's observability surface (per-partition sizes).

All functions are written for use INSIDE ``jax.shard_map`` over a 1-D mesh.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.histogram import histogram_onehot
from ..ops.scan import exclusive_scan


class PartitionMeta(NamedTuple):
    """Everything phase 1 computes (reference HistogramComputation getters,
    tasks/HistogramComputation.cpp:78-130)."""

    local_hist: jnp.ndarray     # int32[P]     this shard's counts
    global_hist: jnp.ndarray    # int32[P]     summed over shards
    assignment: jnp.ndarray     # int32[P]     owner device of partition p
    base_offsets: jnp.ndarray   # int32[P]     start of p in owner's window
    rel_offsets: jnp.ndarray    # int32[P]     this shard's exscan within p
    window_sizes: jnp.ndarray   # int32[D]     recv-buffer size per device


def round_robin_assignment(n_partitions: int, n_devices: int) -> jnp.ndarray:
    """partition -> owner device, ``p % n`` (AssignmentMap.cpp:41-43)."""
    return (jnp.arange(n_partitions, dtype=jnp.int32)
            % jnp.int32(n_devices))


def compute_metadata(pids: jnp.ndarray, n_partitions: int, axis: str
                     ) -> PartitionMeta:
    """Phase 1 for one relation, inside shard_map.

    ``pids``: this shard's per-tuple network-partition ids.
    """
    n_dev = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)

    local = histogram_onehot(pids, n_partitions)
    # MPI_Allreduce(SUM) (GlobalHistogram.cpp:37-42):
    global_hist = jax.lax.psum(local, axis)
    # MPI_Exscan(SUM) (OffsetMap.cpp:78-83): gather everyone's locals and
    # scan along the device dimension.
    all_locals = jax.lax.all_gather(local, axis)          # [D, P]
    rel_offsets = exclusive_scan(all_locals, axis=0)[my]  # int32[P]

    assignment = round_robin_assignment(n_partitions, n_dev)
    # baseOffsets (OffsetMap.cpp:59-73): walk partitions in order,
    # accumulating counts per owner — i.e. an exclusive scan of global counts
    # restricted to each owner's partitions.
    onehot_owner = (assignment[:, None]
                    == jnp.arange(n_dev, dtype=jnp.int32)[None, :])  # [P, D]
    per_owner = global_hist[:, None] * onehot_owner.astype(jnp.int32)
    base_all = exclusive_scan(per_owner, axis=0)          # [P, D]
    base_offsets = jnp.sum(base_all * onehot_owner, axis=1)
    window_sizes = jnp.sum(per_owner, axis=0)             # [D]
    return PartitionMeta(local, global_hist, assignment, base_offsets,
                         rel_offsets, window_sizes)
