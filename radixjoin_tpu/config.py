"""Runtime configuration for the TPU radix hash join engine.

TPU-native replacement for the reference's compile-time constant header
(``core/Configuration.h:15-40``): every tunable that the reference bakes in
with ``static const`` / ``-D`` defines is a field of a runtime dataclass here,
so a single build serves every experiment.

Reference parity map (reference file:line -> field):
  - core/Configuration.h:19  RESULT_AGGREGATION_NODE      -> result_aggregation_node
  - core/Configuration.h:28  ENABLE_TWO_LEVEL_PARTITIONING-> two_level_partitioning
  - core/Configuration.h:30  NETWORK_PARTITIONING_FANOUT  -> network_fanout_bits
  - core/Configuration.h:33  LOCAL_PARTITIONING_FANOUT    -> local_fanout_bits
  - core/Configuration.h:36  ALLOCATION_FACTOR            -> allocation_factor
  - core/Configuration.h:38  PAYLOAD_BITS                 -> payload_bits
  - core/Configuration.h:21-26 (cacheline/buffer geometry) -> shuffle_chunk_tuples
    (the MPI-RMA 64 KiB write-combine buffers become the per-round chunk size
     of the ICI all-to-all shuffle)
  - data/data.hpp:17-39 (MAX_CHUNK_SIZE / MAX_MATCH_RATE / MAX_OUTPUT_SIZE)
    -> chunk_tuples / max_match_rate / max_output_factor
  - utils/gpu/cuda_parameters.hpp:13-25 (grid geometry) -> kernel block tunables
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional


def next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_pow2(x: int) -> int:
    return 1 if x <= 1 else 1 << (x - 1).bit_length()


@dataclasses.dataclass(frozen=True)
class JoinConfig:
    """All tunables of the join engine. Frozen so it can be a static jit arg."""

    # ---- partitioning geometry (reference core/Configuration.h:28-34) ----
    # Number of radix bits consumed by the cross-device ("network") partition
    # pass.  The reference fixes 5 (32 partitions); we default the same but the
    # engine round-robins partitions over the actual mesh size, so any value
    # >= log2(n_devices) works.
    network_fanout_bits: int = 5
    # Radix bits of the local (on-chip) partition pass(es).
    local_fanout_bits: int = 5
    # Second local pass (reference ENABLE_TWO_LEVEL_PARTITIONING).
    two_level_partitioning: bool = False

    # ---- tuple packing (reference core/Configuration.h:38) ----
    # Bits of the packed tuple reserved for the row id ("payload").
    payload_bits: int = 27
    # Key width in bits for the native SoA path (u32 keys by default).
    key_bits: int = 32

    # ---- memory sizing ----
    # Over-allocation headroom for received partitions
    # (reference ALLOCATION_FACTOR = 1.1, core/Configuration.h:36).
    allocation_factor: float = 1.1
    # Padded per-partition capacity factor for the fixed-shape build/probe
    # kernels: capacity = ceil(mean_partition * partition_pad_factor),
    # rounded up to a lane multiple.  Plays the role the fixed-width GPU hash
    # buckets play in operators/gpu/eth.cu:81-109.
    partition_pad_factor: float = 2.0

    # ---- out-of-core chunking (reference data/data.hpp:17-20 MAX_CHUNK_SIZE)
    # Tuples processed per device-resident chunk when a relation exceeds the
    # HBM working-set budget.
    chunk_tuples: int = 128 * 1024 * 1024
    # Per-round chunk (tuples per destination) of the all-to-all shuffle; the
    # analogue of the reference's 64 KiB RDMA write-combine buffers
    # (core/Configuration.h:21-26).
    shuffle_chunk_tuples: int = 64 * 1024

    # ---- probe output sizing (reference data/data.hpp:21-39) ----
    max_match_rate: int = 8
    max_output_factor: float = 2.0

    # ---- skew handling (reference kernels_optimized.cu:301-344) ----
    # A partition whose size exceeds skew_threshold_factor * mean is "heavy"
    # and is routed through the heavy-hitter path.
    skew_threshold_factor: float = 1.5
    # Number of top heavy keys tracked by the heavy-hitter detector.
    max_heavy_keys: int = 128

    # ---- kernel tuning ----
    # Diagonal probe drift half-width K: shifts within +-K of the rank
    # diagonal are compared; larger K tolerates more local density drift
    # before escalation at ~8 VPU ops per unit of K per row.
    diagonal_k: int = 16
    # 128-element R rows per diagonal-probe grid step (multiple of 8).
    diagonal_rows_per_group: int = 32
    # Rows per Pallas probe tile (S side); lane-aligned.
    probe_tile: int = 1024
    # Chunk size (tuples) for the Pallas histogram kernel.
    histogram_chunk: int = 128 * 1024
    # Use Pallas kernels when available (False -> pure jnp/XLA path, used as
    # the reference implementation in tests).
    use_pallas: bool = True

    # ---- distributed (reference main.cpp:36-48, HashJoin.cpp:50) ----
    result_aggregation_node: int = 0
    mesh_axis: str = "nodes"

    # ------------------------------------------------------------------
    @property
    def network_partitions(self) -> int:
        return 1 << self.network_fanout_bits

    @property
    def local_partitions(self) -> int:
        return 1 << self.local_fanout_bits

    @property
    def total_fanout_bits(self) -> int:
        extra = self.local_fanout_bits if self.two_level_partitioning else 0
        return self.network_fanout_bits + self.local_fanout_bits + extra

    @property
    def total_partitions(self) -> int:
        return 1 << self.total_fanout_bits

    def partition_capacity(self, n_tuples: int, n_partitions: int) -> int:
        """Static padded capacity of one partition for fixed-shape kernels."""
        mean = max(1, math.ceil(n_tuples / max(1, n_partitions)))
        return next_multiple(math.ceil(mean * self.partition_pad_factor), 128)

    def shuffle_capacity(self, n_tuples_per_shard: int, n_devices: int) -> int:
        """Static per-destination send capacity for the all-to-all shuffle."""
        mean = max(1, math.ceil(n_tuples_per_shard / max(1, n_devices)))
        return next_multiple(math.ceil(mean * self.allocation_factor), 128)

    def replace(self, **kw) -> "JoinConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = JoinConfig()
