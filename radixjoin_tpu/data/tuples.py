"""Tuple formats and packing bit-math.

TPU-native replacement for the reference's ``data/Tuple.h`` (16-byte
``{uint64 key; uint64 rid;}``, data/Tuple.h:15-22) and
``data/CompressedTuple.h`` (8-byte packed value, data/CompressedTuple.h:14-20).

Design difference (deliberate, TPU-first): relations are **structure-of-arrays**
— two lane-aligned ``uint32`` vectors ``(keys, rids)`` — instead of an
interleaved array-of-structs.  The VPU operates on 8x128 lanes of 32-bit
elements; SoA u32 is its native diet, and it halves HBM traffic versus the
reference's 16-byte tuples.  The reference's packed ``CompressedTuple``
(``value = rid | ((key >> F) << (F + PAYLOAD_BITS))``, packing at
tasks/NetworkPartitioning.cpp:128-129) is still provided, both as a real
64-bit packing (pair-of-u32 on TPU, where x64 is off) and as the 32-bit
variant the engine uses after the network pass has consumed ``F`` key bits.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Relation(NamedTuple):
    """SoA relation shard: parallel ``uint32`` vectors of equal length.

    Mirrors reference ``data/Relation.h`` storage (pool-backed Tuple array,
    data/Relation.cpp:33) in SoA form.  ``rid`` is the row id ("payload",
    reference data/Tuple.h:20).
    """

    keys: jnp.ndarray  # uint32[n]
    rids: jnp.ndarray  # uint32[n]

    @property
    def size(self) -> int:
        return self.keys.shape[0]


def make_relation(keys, rids) -> Relation:
    return Relation(jnp.asarray(keys, jnp.uint32), jnp.asarray(rids, jnp.uint32))


# ---------------------------------------------------------------------------
# Radix / hash bit extraction (reference histograms/LocalHistogram.cpp:20
# HASH_BIT_MODULO(key, mask, shift) = ((key & mask) >> shift))
# ---------------------------------------------------------------------------

def radix_bits(keys: jnp.ndarray, n_bits: int, shift: int = 0) -> jnp.ndarray:
    """Partition id = bits [shift, shift+n_bits) of the key.

    Reference: HASH_BIT_MODULO at histograms/LocalHistogram.cpp:20 and its use
    for the network pass (key & 31, LocalHistogram.cpp:44-47) and the local
    pass (value bits [32..37), tasks/LocalPartitioning.cpp:147-149).
    """
    mask = jnp.uint32((1 << n_bits) - 1)
    return ((keys >> jnp.uint32(shift)) & mask).astype(jnp.int32)


# ---------------------------------------------------------------------------
# CompressedTuple packing (reference tasks/NetworkPartitioning.cpp:128-129;
# layout documented in SURVEY.md §2.2):
#   value = rid | ((key >> F) << (F + PAYLOAD_BITS))
# with F = network fanout bits, PAYLOAD_BITS = 27.  Key equality downstream
# compares value >> 32 (tasks/BuildProbe.cpp:101-102).
# On TPU (x64 disabled) the 64-bit value is represented as a (hi, lo) pair of
# uint32 words: value = (hi << 32) | lo.
# ---------------------------------------------------------------------------

def pack_compressed(keys: jnp.ndarray, rids: jnp.ndarray, fanout_bits: int,
                    payload_bits: int = 27):
    """Pack (key, rid) into the reference's 64-bit compressed layout.

    Returns ``(hi, lo)`` uint32 words of the 64-bit value.
    """
    keys = keys.astype(jnp.uint32)
    rids = rids.astype(jnp.uint32)
    shift = fanout_bits + payload_bits  # static bit position of the reduced key
    reduced = keys >> jnp.uint32(fanout_bits)
    # value = rid | (reduced << shift), split into 32-bit words.
    if shift >= 32:
        lo = rids
        hi = reduced << jnp.uint32(shift - 32)
    else:
        lo = rids | (reduced << jnp.uint32(shift))
        hi = reduced >> jnp.uint32(32 - shift)
    return hi, lo


def unpack_compressed(hi: jnp.ndarray, lo: jnp.ndarray, fanout_bits: int,
                      partition_id, payload_bits: int = 27):
    """Invert :func:`pack_compressed` given the partition id that was dropped.

    The reference never needs this (it only compares packed values), but the
    TPU engine round-trips it in tests to prove the bit-math is lossless.
    """
    shift = fanout_bits + payload_bits
    payload_mask = jnp.uint32((1 << payload_bits) - 1) if payload_bits < 32 \
        else jnp.uint32(0xFFFFFFFF)
    rid = lo & payload_mask
    if shift >= 32:
        reduced = hi >> jnp.uint32(shift - 32)
    else:
        reduced = (lo >> jnp.uint32(shift)) | (hi << jnp.uint32(32 - shift))
    pid = jnp.asarray(partition_id, jnp.uint32)
    key = (reduced << jnp.uint32(fanout_bits)) | pid
    return key, rid


def pack_compressed32(keys: jnp.ndarray, rids: jnp.ndarray, fanout_bits: int,
                      payload_bits: int) -> jnp.ndarray:
    """32-bit packed tuple for when (key_bits - fanout) + payload_bits <= 32.

    The TPU-native fast path: after the network pass drops ``fanout_bits`` key
    bits (shared by every tuple of a partition), small workloads fit key+rid
    in one u32 word — one vector register lane per tuple.
    """
    reduced = keys.astype(jnp.uint32) >> jnp.uint32(fanout_bits)
    payload_mask = jnp.uint32((1 << payload_bits) - 1)
    return (reduced << jnp.uint32(payload_bits)) | (rids & payload_mask)


def unpack_compressed32(packed: jnp.ndarray, fanout_bits: int,
                        partition_id, payload_bits: int):
    payload_mask = jnp.uint32((1 << payload_bits) - 1)
    rid = packed & payload_mask
    reduced = packed >> jnp.uint32(payload_bits)
    key = (reduced << jnp.uint32(fanout_bits)) | jnp.asarray(partition_id, jnp.uint32)
    return key, rid
