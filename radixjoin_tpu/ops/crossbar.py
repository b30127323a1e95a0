"""Crossbar (dynamic_gather) building blocks for a Pallas radix partitioner.

Round-2 groundwork (docs/ROADMAP.md §1/§1b): replacing the XLA partition
sort needs an in-VMEM *counting* sort, whose missing primitive was a
data-dependent permutation.  Probing established that
``jnp.take_along_axis(x, idx, axis=1)`` lowers to ``tpu.dynamic_gather``
— an arbitrary per-row 128-lane crossbar at roll-like cost
(benchmarks/tpu_gather_probe.py) — so per-row movement is solved; this
module implements the per-row STABLE LSD digit sort on top of it.

The hard step is inverting the counting-sort permutation with gather-only
primitives (scatter does not exist): for one stable binary split the
inverse has a monotone structure — output lane l takes the l-th zero
(or (l - Z)-th one), i.e. the first position where the inclusive
zero/one count reaches a per-lane target — found by a 7-step vectorised
binary search whose probes are crossbar gathers.  Prefix sums ride the
MXU: a (R,128) @ (128,128) triangular-ones matmul computes every row's
inclusive prefix in ~1 MXU pass (f32, exact for counts <= 128).

Reference scatter being replaced: the software-WC radix reorder
(tasks/LocalPartitioning.cpp:194-250, operators/gpu/kernels.cu:64-91).
Cross-row regrouping and the DMA flush are round-2 items; cost pricing
for the full pipeline lives in docs/ROADMAP.md §1b.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.backend import pallas_interpret


def _row_split_body(keys, pay, bit, tri_incl):
    """One stable binary split of every 128-lane row by key bit ``bit``.

    keys/pay: (R, 128) int32-compatible values; tri_incl: (128, 128) f32
    with tri_incl[k, j] = 1.0 iff k <= j (inclusive-prefix matmul).
    Returns (keys', pay') with each row reordered [bit==0 .. | .. bit==1],
    order preserved inside each section.
    """
    flag = ((keys >> jnp.uint32(bit)) & jnp.uint32(1)).astype(jnp.int32)
    fz = (1 - flag).astype(jnp.float32)
    incl0 = jax.lax.dot(fz, tri_incl,
                        precision=jax.lax.Precision.HIGHEST)
    incl0 = incl0.astype(jnp.int32)                  # zeros in row[0..k]
    total0 = jax.lax.dot(fz, jnp.ones_like(tri_incl),
                         precision=jax.lax.Precision.HIGHEST)
    z = total0.astype(jnp.int32)                     # every lane = row zeros
    lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
    ones_sec = (lane >= z).astype(jnp.int32)
    # 1-indexed order statistic this output lane wants
    t = jnp.where(ones_sec == 1, lane - z + 1, lane + 1)

    # src = first k where the section's inclusive count reaches t; the
    # ones-count probe is derived from the SAME gathered zeros count
    # (incl1[k] = k+1 - incl0[k]), so each step costs one gather.
    lo = jnp.zeros(keys.shape, jnp.int32)
    hi = jnp.full(keys.shape, 127, jnp.int32)
    for _ in range(7):
        mid = (lo + hi) >> 1
        v0 = jnp.take_along_axis(incl0, mid, axis=1)
        v = jnp.where(ones_sec == 1, mid + 1 - v0, v0)
        ge = v >= t
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    src = lo
    return (jnp.take_along_axis(keys, src, axis=1),
            jnp.take_along_axis(pay, src, axis=1))


def _row_digit_sort_kernel(n_bits, shift, k_ref, p_ref, ok_ref, op_ref):
    tri = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
           ).astype(jnp.float32)
    keys = k_ref[...]
    pay = p_ref[...]
    for b in range(shift, shift + n_bits):           # LSD: stable splits
        keys, pay = _row_split_body(keys, pay, b, tri)
    ok_ref[...] = keys
    op_ref[...] = pay


@functools.partial(jax.jit,
                   static_argnames=("n_bits", "shift", "block_rows",
                                    "interpret"))
def row_digit_sort(keys: jnp.ndarray, payload: jnp.ndarray,
                   n_bits: int, shift: int = 0,
                   block_rows: int = 256,
                   interpret: bool | None = None):
    """Stable per-row (128-lane) counting sort by key bits
    [shift, shift+n_bits), carrying one payload plane.

    keys/payload: uint32[N], N % (block_rows*128) == 0.  Each 128-element
    row is reordered independently — the row-local stage of a radix
    partition pass (cross-row regrouping is the round-2 follow-on).
    """
    if interpret is None:
        interpret = pallas_interpret()
    n = keys.shape[0]
    assert n % (block_rows * 128) == 0
    k2 = keys.reshape(-1, 128)
    p2 = payload.reshape(-1, 128)
    grid = (k2.shape[0] // block_rows,)
    ok, op = pl.pallas_call(
        functools.partial(_row_digit_sort_kernel, n_bits, shift),
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, 128), lambda i: (i, 0)),
                  pl.BlockSpec((block_rows, 128), lambda i: (i, 0))],
        out_specs=(pl.BlockSpec((block_rows, 128), lambda i: (i, 0)),
                   pl.BlockSpec((block_rows, 128), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct(k2.shape, keys.dtype),
                   jax.ShapeDtypeStruct(p2.shape, payload.dtype)),
        interpret=interpret,
    )(k2, p2)
    return ok.reshape(-1), op.reshape(-1)
