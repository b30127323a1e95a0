"""Radix sort operator.

Part of the extended operator set required by the project north star
(BASELINE.json: "radix partitioning, hash-join build/probe, radix sort, hash
aggregate, and filter").  The reference's radix machinery (histogram -> scan
-> reorder cascades, operators/gpu/kernels.cu) *is* a radix sort in disguise;
here the operator is exposed directly.

On TPU, ``jax.lax.sort`` already lowers to an optimised vectorised sorting
network, so the primary implementation delegates to it (variadic, stable).
``radix_sort_staged`` additionally exposes the literal digit-by-digit LSD
radix formulation built from the engine's own partitioning passes — the shape
needed by the out-of-core path, where each pass streams chunks through HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.tuples import Relation, radix_bits
from .partition import partition_relation


def sort_relation(rel: Relation) -> Relation:
    """Key-sort a relation (ascending), carrying rids."""
    keys, rids = jax.lax.sort((rel.keys, rel.rids), num_keys=1)
    return Relation(keys, rids)


def radix_sort_staged(rel: Relation, key_bits: int = 32,
                      digit_bits: int = 8) -> Relation:
    """LSD radix sort as repeated stable partition passes.

    Each pass is one :func:`partition_relation` on ``digit_bits`` bits —
    identical structure to the reference's L1/L2 reorder cascade
    (small_data.cu:85-163) generalised to a full sort.
    """
    out = rel
    shift = 0
    while shift < key_bits:
        bits = min(digit_bits, key_bits - shift)
        # LSD radix sorting is the one consumer that NEEDS stable passes.
        part = partition_relation(out, bits, shift, stable=True)
        out = Relation(part.keys, part.rids)
        shift += bits
    return out
