"""Histogram-driven all-to-all shuffle — the "network partitioning" phase.

TPU-native replacement for the reference's MPI-RMA machinery:
  - ``Window`` (data/Window.cpp:35-200): MPI_Alloc_mem + MPI_Win_create
    symmetric windows, passive-target lock_all, per-buffer MPI_Put into
    disjoint precomputed offsets, flush/unlock.
  - ``NetworkPartitioning`` (tasks/NetworkPartitioning.cpp:64-268): radix
    scatter through software write-combine buffers flushed with AVX
    streaming stores, 64 KiB RDMA buffers double-buffered per partition.

On a TPU mesh the one-sided put storm becomes a single **ICI all-to-all**:
each device groups its tuples by destination (a sort — same primitive as the
local partitioner), pads each destination segment to a static capacity
(the analogue of the reference's fixed 64 KiB buffers: capacity is
``mean * ALLOCATION_FACTOR``, core/Configuration.h:36), and one
``jax.lax.all_to_all`` moves every segment to its owner over ICI.  Validity
masks replace the reference's write-counter bookkeeping; the all-written
invariant (data/Window.cpp:180-191) becomes a count check returned to the
caller.  XLA schedules the collective asynchronously, so downstream local
work on already-received chunks overlaps with the transfer when the chunked
variant (``shuffle_chunked``) splits the exchange into rounds.

All functions run INSIDE ``jax.shard_map`` over a 1-D mesh axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.histogram import histogram_sorted
from ..ops.partition import gather_padded  # noqa: F401  (re-exported for callers)


class ShuffledShard(NamedTuple):
    """Tuples this device received: [D * capacity] arrays + validity."""
    keys: jnp.ndarray    # uint32[D*C]
    rids: jnp.ndarray    # uint32[D*C]
    valid: jnp.ndarray   # bool[D*C]
    sent_counts: jnp.ndarray  # int32[D] tuples this shard sent to each dest
    overflow: jnp.ndarray     # bool: some segment exceeded capacity


class ShuffledShardMulti(NamedTuple):
    """N-operand shuffle result: each operand as a [D * capacity] array.

    The wide-tuple form of :class:`ShuffledShard` — e.g. 64-bit keys cross
    as (hi, lo, rid) planes (reference keys are uint64, data/Tuple.h:15-22,
    compressed to one 8 B word for the wire; here each plane is its own
    all_to_all operand)."""
    operands: tuple               # each uint32[D*C]
    valid: jnp.ndarray            # bool[D*C]
    sent_counts: jnp.ndarray      # int32[D]
    overflow: jnp.ndarray         # bool


def shuffle_multi(operands: tuple, dest: jnp.ndarray, capacity: int,
                  axis: str, drop_mask: jnp.ndarray | None = None
                  ) -> ShuffledShardMulti:
    """Exchange N parallel per-tuple arrays so device d ends up with all
    tuples whose ``dest == d``.  ``dest``: int32[n] in [0, axis_size).

    Rows with ``drop_mask`` True are not sent at all (they sort past the
    last destination) — used by the skew path to keep heavy keys out of
    the network phase entirely.
    """
    n_dev = jax.lax.axis_size(axis)
    if drop_mask is not None:
        dest = jnp.where(drop_mask, n_dev, dest)
    # Group by destination (the reference's WC-buffer scatter,
    # NetworkPartitioning.cpp:116-173, as a sort).
    sd, *sorted_ops = jax.lax.sort((dest, *operands), num_keys=1,
                                   is_stable=False)
    counts, starts = histogram_sorted(sd, n_dev)
    overflow = jnp.any(counts > jnp.int32(capacity))

    sends, valid = _segments_padded(sorted_ops, starts, counts, capacity,
                                    n_dev)

    # The put storm (Window::write -> MPI_Put, data/Window.cpp:86-144):
    recv = tuple(jax.lax.all_to_all(sb, axis, 0, 0, tiled=False)
                 .reshape(-1) for sb in sends)
    recv_valid = jax.lax.all_to_all(valid, axis, 0, 0,
                                    tiled=False).reshape(-1)
    return ShuffledShardMulti(recv, recv_valid, counts, overflow)


def _segments_padded(sorted_ops, starts, counts, capacity, n_dev):
    """[D, C] left-justified padded send buffers from dest-sorted arrays.

    The segments are CONTIGUOUS slices of the sorted array, so the padded
    matrix is D dynamic-slice copies (memcpy-speed) — not the general
    gather the obvious ``values[starts[:,None] + slot]`` formulation
    lowers to, which is ~100x off HBM speed at shuffle scale on this
    hardware (round-4 finding: it dominated the 2^27 distributed join).
    Each slice over-reads up to ``capacity`` elements past its segment
    into the next one; the validity mask (slot < count) is what receivers
    consume, and values in invalid slots are zeroed for determinism.
    """
    slot = jnp.arange(capacity, dtype=jnp.int32)
    valid = slot[None, :] < counts[:, None]               # [D, C]

    def seg_rows(vals):
        src = jnp.concatenate(
            [vals, jnp.zeros((capacity,), vals.dtype)])
        rows = [jax.lax.dynamic_slice_in_dim(src, starts[p], capacity)
                for p in range(n_dev)]
        return jnp.where(valid, jnp.stack(rows), 0)

    return [seg_rows(so) for so in sorted_ops], valid


def shuffle_by_destination(keys: jnp.ndarray, rids: jnp.ndarray,
                           dest: jnp.ndarray, capacity: int, axis: str,
                           drop_mask: jnp.ndarray | None = None
                           ) -> ShuffledShard:
    """Two-operand (key, rid) shuffle — see :func:`shuffle_multi`."""
    m = shuffle_multi((keys, rids), dest, capacity, axis, drop_mask)
    return ShuffledShard(m.operands[0], m.operands[1], m.valid,
                         m.sent_counts, m.overflow)


def shuffle_chunked(keys: jnp.ndarray, rids: jnp.ndarray, dest: jnp.ndarray,
                    capacity: int, axis: str, n_rounds: int,
                    drop_mask: jnp.ndarray | None = None) -> ShuffledShard:
    """Multi-round shuffle: the exchange is split into ``n_rounds`` slices
    of the send buffer — the TPU analogue of the reference's
    double-buffered 64 KiB put pipeline (NetworkPartitioning.cpp:146-165),
    structured so XLA's scheduler MAY overlap round k's ICI transfer with
    round k-1's downstream compute on real multi-chip hardware.

    Measured statement (benchmarks/shuffle_overlap_check.py, BENCH_NOTES):
    on the 8-virtual-device CPU mesh — the only multi-device platform
    available here, where XLA runs collectives synchronously — chunking
    costs +1.7% (2 rounds) / +5.9% (4 rounds) over the single-shot
    exchange; actual transfer/compute overlap is unverified until >=2
    real chips exist, so ``shuffle_rounds=1`` stays the default.

    Capacity must be divisible by n_rounds.
    """
    n_dev = jax.lax.axis_size(axis)
    if drop_mask is not None:
        dest = jnp.where(drop_mask, n_dev, dest)
    sd, sk, sr = jax.lax.sort((dest, keys, rids), num_keys=1,
                              is_stable=False)
    counts, starts = histogram_sorted(sd, n_dev)
    overflow = jnp.any(counts > jnp.int32(capacity))

    (send_keys, send_rids), valid = _segments_padded(
        (sk, sr), starts, counts, capacity, n_dev)
    step = capacity // n_rounds
    rk, rr, rv = [], [], []
    for i in range(n_rounds):
        sl = slice(i * step, (i + 1) * step)
        rk.append(jax.lax.all_to_all(send_keys[:, sl], axis, 0, 0))
        rr.append(jax.lax.all_to_all(send_rids[:, sl], axis, 0, 0))
        rv.append(jax.lax.all_to_all(valid[:, sl], axis, 0, 0))
    recv_keys = jnp.concatenate(rk, axis=1)
    recv_rids = jnp.concatenate(rr, axis=1)
    recv_valid = jnp.concatenate(rv, axis=1)
    return ShuffledShard(recv_keys.reshape(-1), recv_rids.reshape(-1),
                         recv_valid.reshape(-1), counts, overflow)
