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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data.tuples import Relation, radix_bits
from ..utils.backend import pallas_interpret
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


# ---------------------------------------------------------------------------
# In-VMEM bitonic chunk sort (Pallas).
#
# The building block for a future Pallas radix partitioner (and a standalone
# member of the sort-kernel family, cf. the reference's reorder cascades):
# sorts each CHUNK-element slice of the input independently, entirely in
# VMEM, carrying one payload array.  The Batcher bitonic network's XOR
# partner exchange i ^ j is Mosaic-hostile as a gather, but becomes two
# static lane/sublane rolls merged by a bit mask:
#     x[l ^ j] == where((l & j) == 0, roll(x, -j), roll(x, +j))
# so every stage is a handful of static vector ops — no relayouts, no
# dynamic addressing.  8192-element chunks = 91 stages.
# ---------------------------------------------------------------------------

def _butterfly(x, j, rows):
    """x[i ^ j] over the row-major (rows, 128) layout, via two rolls."""
    if j < 128:
        lo = pltpu.roll(x, 128 - j, axis=1)      # x[l + j]  (roll by -j)
        hi = pltpu.roll(x, j, axis=1)            # x[l - j]
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        return jnp.where((lane & j) == 0, lo, hi)
    rj = j // 128
    lo = pltpu.roll(x, rows - rj, axis=0)        # x[r + rj] (roll by -rj)
    hi = pltpu.roll(x, rj, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where((row & rj) == 0, lo, hi)


def _bitonic_kernel(chunk, vals_ref, pay_ref, out_v_ref, out_p_ref):
    rows = chunk // 128
    v = vals_ref[...]
    p = pay_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    idx = row * 128 + lane

    k = 2
    while k <= chunk:
        j = k // 2
        while j >= 1:
            pv = _butterfly(v, j, rows)
            pp = _butterfly(p, j, rows)
            # int32 mask arithmetic throughout: Mosaic cannot lower selects
            # with *boolean-valued* operands (i8->i1 truncation), so the
            # swap predicate is built with xor on 0/1 ints and only the
            # final data select uses a bool condition.
            up = ((idx & k) == 0).astype(jnp.int32)      # ascending run?
            lower = ((idx & j) == 0).astype(jnp.int32)   # i < i ^ j
            partner_smaller = (pv < v).astype(jnp.int32)
            # swap iff partner_smaller == (up == lower); in 0/1 xor algebra:
            # up ^ lower ^ partner_smaller == 1.
            swap = (up ^ lower ^ partner_smaller) == 1
            v, p = (jnp.where(swap, pv, v), jnp.where(swap, pp, p))
            j //= 2
        k *= 2
    out_v_ref[...] = v
    out_p_ref[...] = p


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def bitonic_sort_chunks(values: jnp.ndarray, payload: jnp.ndarray,
                        chunk: int = 8192,
                        interpret: bool | None = None):
    """Sort each ``chunk``-element slice of (values, payload) by value.

    values/payload: uint32[N] with N % chunk == 0 (pad with 0xFFFFFFFF to
    sort filler to chunk tails).  chunk must be a power of two >= 1024.
    """
    if interpret is None:
        interpret = pallas_interpret()
    assert chunk >= 1024 and (chunk & (chunk - 1)) == 0
    n = values.shape[0]
    assert n % chunk == 0, "pad to whole chunks first"
    rows = chunk // 128
    v2 = values.reshape(-1, 128)
    p2 = payload.reshape(-1, 128)

    out_v, out_p = pl.pallas_call(
        functools.partial(_bitonic_kernel, chunk),
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, 128), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(v2.shape, values.dtype),
            jax.ShapeDtypeStruct(p2.shape, payload.dtype),
        ),
        interpret=interpret,
    )(v2, p2)
    return out_v.reshape(-1), out_p.reshape(-1)
