"""Radix partitioning — the engine's core data-movement primitive.

TPU-native replacement for the reference's scatter-based radix reorder:
  - CPU software-write-combining scatter with AVX streaming stores
    (tasks/NetworkPartitioning.cpp:116-173, tasks/LocalPartitioning.cpp:194-250)
  - GPU ``reorder_L1`` / ``reorder_L2`` kernels and their optimized / 2008 /
    chunked / tiled variants (operators/gpu/kernels.cu:64-91,145-185,283-298,
    516-554,657-751; kernels_optimized.cu:67-111; kernels_tile.cu:61-151).

TPUs have no efficient random scatter, so data-dependent scatter is recast as
**sort**: partitioning by radix bits is exactly a stable sort on those bits.
``jax.lax.sort`` lowers to XLA:TPU's vectorised sorting network (variadic, so
key and payload move together), after which partitions are contiguous and the
per-partition layout (starts/counts) falls out of a vectorised binary search —
no histogram/prefix-sum/scatter dance, no atomics, and deterministic layout.

The multi-level passes of the reference (L1 network bits then L2 local bits)
collapse into a single sort on the concatenated bit-field when both passes are
on-chip; the engine still exposes two-level mode for parity and for the
out-of-core chunked path (reference ``LD::``/``TLD::`` kernels), where chunked
partitioning is provided by :func:`partition_chunked`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data.tuples import Relation, radix_bits
from .histogram import histogram_sorted


class PartitionedRelation(NamedTuple):
    """A relation reordered so partition p occupies rows
    [starts[p], starts[p] + counts[p]).  ``pids`` is retained for downstream
    masked kernels; all arrays share length N (the original relation size)."""

    keys: jnp.ndarray    # uint32[N]  reordered keys
    rids: jnp.ndarray    # uint32[N]  reordered row ids
    pids: jnp.ndarray    # int32[N]   ascending partition ids
    starts: jnp.ndarray  # int32[P]
    counts: jnp.ndarray  # int32[P]

    @property
    def n_partitions(self) -> int:
        return self.starts.shape[0]


def _sort_by(sort_key: jnp.ndarray, rel: Relation, stable: bool = False):
    """Variadic sort of (key, rid) by ``sort_key``.

    Unstable by default: partitioning only needs *grouping*; within-
    partition order is arbitrary for every consumer (probe kernels,
    shuffle, histograms), and is_stable costs ~20% extra on the TPU sort
    network.  LSD radix sorting (ops/sort.radix_sort_staged) opts back in.
    """
    return jax.lax.sort((sort_key, rel.keys, rel.rids), num_keys=1,
                        is_stable=stable)


def partition_relation(rel: Relation, n_bits: int, shift: int = 0,
                       drop_mask: jnp.ndarray | None = None,
                       stable: bool = False) -> PartitionedRelation:
    """Single partitioning pass on key bits [shift, shift + n_bits).

    Rows where ``drop_mask`` is True are assigned the out-of-range id
    ``2**n_bits`` — they sort to the tail and are excluded from every
    partition's (start, count) range.  This is how the engine removes
    heavy-hitter rows from the partitioned path (ops/skew.py) without the
    data-dependent compaction a filter would need.
    """
    pid = radix_bits(rel.keys, n_bits, shift)
    if drop_mask is not None:
        pid = jnp.where(drop_mask, jnp.int32(1 << n_bits), pid)
    spid, skeys, srids = _sort_by(pid, rel, stable)
    counts, starts = histogram_sorted(spid, 1 << n_bits)
    return PartitionedRelation(skeys, srids, spid, starts, counts)


def rotate_for_partition(value: int, n_bits: int, shift: int = 0) -> int:
    """Static counterpart of the in-graph rotation (for sentinel mapping)."""
    r = (32 - shift - n_bits) % 32
    return ((value << r) | (value >> (32 - r))) & 0xFFFFFFFF if r else value


def partition_keys_rotated(keys: jnp.ndarray, n_bits: int, shift: int = 0,
                           drop_mask: jnp.ndarray | None = None
                           ) -> PartitionedRelation:
    """Keys-only partitioning via bit rotation — HALF the sort traffic.

    For count-only probes the row ids never matter, and the partition id is
    a *function of the key*, so instead of sorting (pid, key, rid) triples
    we rotate each key left so its radix bits become the most-significant
    bits and sort the single rotated array.  Rotation is a bijection, so
    equality of rotated keys == equality of keys — the probe can compare
    rotated keys directly and never needs to un-rotate.

    The returned PartitionedRelation carries rotated keys in ``keys`` (valid
    for equality tests only), a zero rids placeholder, and correct
    pids/starts/counts.  With a drop mask the sort gains a second operand
    (the out-of-range pid tag), still one less than the general path.
    """
    r = (32 - shift - n_bits) % 32
    if r:
        rotk = (keys << jnp.uint32(r)) | (keys >> jnp.uint32(32 - r))
    else:
        rotk = keys
    if drop_mask is None:
        srot = jax.lax.sort(rotk)
        spid = (srot >> jnp.uint32(32 - n_bits)).astype(jnp.int32)
    else:
        pid = radix_bits(keys, n_bits, shift)
        pid = jnp.where(drop_mask, jnp.int32(1 << n_bits), pid)
        spid, srot = jax.lax.sort((pid, rotk), num_keys=1, is_stable=False)
    counts, starts = histogram_sorted(spid, 1 << n_bits)
    return PartitionedRelation(srot, jnp.zeros_like(srot), spid,
                               starts, counts)


def partition_two_level(rel: Relation, l1_bits: int, l2_bits: int,
                        shift: int = 0) -> PartitionedRelation:
    """Two-level pass (reference ENABLE_TWO_LEVEL_PARTITIONING,
    core/Configuration.h:28): equivalent to one pass on l1+l2 bits since the
    radix levels are adjacent bit ranges — one sort, same final layout as the
    reference's L1-then-L2 scatter cascade (small_data.cu:85-163)."""
    return partition_relation(rel, l1_bits + l2_bits, shift)


def partition_by_key_order(rel: Relation, n_bits: int, shift: int = 0,
                           ) -> PartitionedRelation:
    """Partition AND fully key-sort within each partition in one sort.

    Sorting by the full key with the radix bits as most-significant digits
    yields contiguous partitions whose contents are key-ordered — the layout
    the merge-style probe kernel wants.  One fused sort replaces the
    reference's partition-then-bucket-build sequence (eth.cu:81-109)."""
    pid = radix_bits(rel.keys, n_bits, shift)
    # Two sort keys: pid major, full key minor.
    spid, skeys, srids = jax.lax.sort(
        (pid, rel.keys, rel.rids), num_keys=2, is_stable=False)
    counts, starts = histogram_sorted(spid, 1 << n_bits)
    return PartitionedRelation(skeys, srids, spid, starts, counts)


def partition_chunked(rel: Relation, n_bits: int, chunk_tuples: int,
                      shift: int = 0) -> PartitionedRelation:
    """Out-of-core-shaped partitioning (reference ``LD::`` chunked kernels,
    kernels.cu:563-857): each chunk is partitioned independently, then chunks
    are merged partition-by-partition.

    On-device this is a capability-parity path (a single sort is faster when
    everything fits); the host-streaming driver in engine/outofcore.py uses
    the same per-chunk layout to stream >HBM relations through the chip.
    """
    n = rel.size
    n_chunks = max(1, -(-n // chunk_tuples))
    if n_chunks == 1:
        return partition_relation(rel, n_bits, shift)
    # Pad to equal chunks with sentinel pid = P (sorts to the tail).
    pad = n_chunks * chunk_tuples - n
    pid = radix_bits(rel.keys, n_bits, shift)
    if pad:
        pid = jnp.concatenate([pid, jnp.full((pad,), 1 << n_bits, jnp.int32)])
        keys = jnp.concatenate([rel.keys, jnp.zeros((pad,), jnp.uint32)])
        rids = jnp.concatenate([rel.rids, jnp.zeros((pad,), jnp.uint32)])
    else:
        keys, rids = rel.keys, rel.rids

    cp = pid.reshape(n_chunks, chunk_tuples)
    ck = keys.reshape(n_chunks, chunk_tuples)
    cr = rids.reshape(n_chunks, chunk_tuples)
    spid, skeys, srids = jax.lax.sort((cp, ck, cr), num_keys=1,
                                      is_stable=True, dimension=1)
    # Merge: global order = (pid, chunk) — sort the concatenation of the
    # per-chunk runs by pid (stable keeps chunk order), which is a cheap
    # nearly-sorted merge for XLA's sort network.
    mpid, mkeys, mrids = jax.lax.sort(
        (spid.reshape(-1), skeys.reshape(-1), srids.reshape(-1)),
        num_keys=1, is_stable=True)
    mpid, mkeys, mrids = mpid[:n], mkeys[:n], mrids[:n]
    counts, starts = histogram_sorted(mpid, 1 << n_bits)
    return PartitionedRelation(mkeys, mrids, mpid, starts, counts)


def gather_padded(keys: jnp.ndarray, starts: jnp.ndarray,
                  counts: jnp.ndarray, capacity: int):
    """Materialise value slices [starts[p], starts[p]+counts[p]) as a dense
    [P, capacity] tensor (left-justified, zero-padded) + validity mask.

    The fixed-shape analogue of the reference's per-partition pointers
    (Window::getPartition, data/Window.cpp:146-152).  Works for any value
    array (keys or rids) and any subset of partitions (starts/counts may be
    gathered/masked views).
    """
    slot = jnp.arange(capacity, dtype=jnp.int32)[None, :]
    idx = starts[:, None] + slot                          # [P, cap]
    valid = slot < counts[:, None]
    idx = jnp.clip(idx, 0, keys.shape[0] - 1)
    return jnp.where(valid, keys[idx], 0), valid


# ---------------------------------------------------------------------------
# Pallas padded-partition materialisation.
#
# After the sort, partition p is the contiguous slice
# [starts[p], starts[p]+counts[p]) — but unaligned, and XLA's general gather
# is ~100x off HBM speed-of-light for this access pattern.  This kernel
# exploits contiguity: per partition it DMAs the 128-aligned superset of the
# slice (row-granular, DMA-friendly), then realigns by the (start % 128)
# element offset entirely with lane/sublane rolls — the Mosaic-legal way to
# shift a flattened vector, since cross-lane relayouts are unsupported.
# Slots past the partition's count are filled with a caller-chosen sentinel
# (the probe kernels mask by value, not by index).
# ---------------------------------------------------------------------------

def _gather_kernel(sentinel, st_ref, c_ref, src_ref, out_ref,
                   scr_a, scr_b, sem_a, sem_b):
    p = pl.program_id(0)
    rows = out_ref.shape[0]            # cap // 128
    start = st_ref[p]
    count = c_ref[p]
    row0 = start // 128                # aligned DMA row
    k = start - row0 * 128             # in-row offset, 0..127

    # Two row-granular DMAs, one row apart: every op below stays on
    # uniform (rows, 128) tiles — no odd-height vectors, no sublane-offset
    # reads (both fault Mosaic/the DMA engine).
    copy_a = pltpu.make_async_copy(
        src_ref.at[pl.ds(row0, rows), :], scr_a, sem_a)
    copy_b = pltpu.make_async_copy(
        src_ref.at[pl.ds(row0 + 1, rows), :], scr_b, sem_b)
    copy_a.start()
    copy_b.start()
    copy_a.wait()
    copy_b.wait()

    # Element shift by k: lane roll both images by (128 - k) % 128, then
    # take low lanes from the row-r image and high lanes from the row-r+1
    # image (rolls are the only Mosaic-legal cross-position moves).
    sh = jax.lax.rem(128 - k, 128)
    rolled_a = pltpu.roll(scr_a[...], sh, axis=1)         # (rows, 128)
    rolled_b = pltpu.roll(scr_b[...], sh, axis=1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    shifted = jnp.where(lanes < 128 - k, rolled_a, rolled_b)

    slot = (jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1))
    out_ref[...] = jnp.where(slot < count, shifted,
                             jnp.full((), sentinel, out_ref.dtype))


@functools.partial(jax.jit,
                   static_argnames=("capacity", "sentinel", "interpret"))
def gather_padded_aligned(values: jnp.ndarray, starts: jnp.ndarray,
                          counts: jnp.ndarray, capacity: int,
                          sentinel: int, interpret: bool = False):
    """[P * capacity/128, 128] padded partition tensor via aligned DMA.

    ``capacity`` must be a multiple of 1024.  Returns the native-layout 2-D
    view consumed by the probe kernels (partition p = rows
    [p*cap/128, (p+1)*cap/128)), padding slots = ``sentinel``.
    """
    assert capacity % 1024 == 0
    P = starts.shape[0]
    rows = capacity // 128
    n = values.shape[0]
    # Tail headroom so the aligned superset DMA never runs off the array.
    m = ((n + capacity + 256) // 128 + 1)
    pad = m * 128 - n
    src = jnp.concatenate(
        [values,
         jnp.full((pad,), jnp.asarray(sentinel, values.dtype))]
    ).reshape(m, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((rows, 128), lambda p, st_, c_: (p, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), values.dtype),
            pltpu.VMEM((rows, 128), values.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, sentinel),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P * rows, 128), values.dtype),
        interpret=interpret,
    )(starts.astype(jnp.int32), counts.astype(jnp.int32), src)


def gather_padded_partitions(part: PartitionedRelation, capacity: int):
    """[P, capacity] keys, rids and validity mask for a PartitionedRelation."""
    keys, valid = gather_padded(part.keys, part.starts, part.counts, capacity)
    rids, _ = gather_padded(part.rids, part.starts, part.counts, capacity)
    return keys, rids, valid
