"""Exclusive prefix sums over partition histograms.

TPU-native replacement for the reference's offset computations:
  - thrust::exclusive_scan over GPU histograms
    (operators/gpu/small_data.cu:96-98 et passim)
  - the CPU cacheline-padded prefix sum (tasks/LocalPartitioning.cpp:165-192)
  - MPI_Exscan over ranks (histograms/OffsetMap.cpp:78-83) — the cross-device
    form lives in parallel/metadata.py; this module is the single-device math.

Histograms here are small (<= 2^20 bins), so XLA's fused ``cumsum`` is already
at speed-of-light; no Pallas kernel is warranted.
"""

from __future__ import annotations

import jax.numpy as jnp


def exclusive_scan(hist: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Exclusive prefix sum: out[i] = sum(hist[:i]). Same dtype as input."""
    inc = jnp.cumsum(hist, axis=axis, dtype=hist.dtype)
    return inc - hist


def inclusive_scan(hist: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jnp.cumsum(hist, axis=axis, dtype=hist.dtype)
