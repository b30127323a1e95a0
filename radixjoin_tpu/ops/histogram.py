"""Partition histograms (bincount) — the phase-1 primitive.

TPU-native replacement for the reference's histogram family:
  - CPU per-node bincount (histograms/LocalHistogram.cpp:35-53)
  - GPU shared-memory histogram kernels ``histogram_build_L1/L2``
    (operators/gpu/kernels.cu:19-52,101-142), global-atomics variant
    (kernels.cu:256-270), per-thread 2008 variant (kernels.cu:473-506) and
    chunked/tiled variants (kernels.cu:563-650, kernels_tile.cu:16-49).

TPUs have no fast global atomic scatter-add, so the CUDA "shared-memory
histogram + atomicAdd" shape is replaced by two scatter-free formulations:

  * ``histogram_onehot`` — compare-and-reduce: ``sum(pid == p)`` for all bins
    at once on the VPU.  Cost O(N * P); right for the small-fanout network
    pass (P = 32).  The Pallas kernel version streams chunks through VMEM and
    accumulates the bin vector on-chip, touching HBM once per input element.
  * ``histogram_sorted`` — for sorted partition ids (which the sort-based
    partitioner produces anyway): bin boundaries by vectorised binary search,
    counts by first difference.  Cost O(P log N) after the sort; right for
    large fanouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.backend import pallas_interpret


def histogram_onehot(pids: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """O(N*P) compare-and-reduce bincount. pids: int32[N] in [0, n_bins)."""
    iota = jnp.arange(n_bins, dtype=pids.dtype)
    return jnp.sum(pids[:, None] == iota[None, :], axis=0, dtype=jnp.int32)


def histogram_sorted(sorted_pids: jnp.ndarray, n_bins: int):
    """Counts and starts from an ascending partition-id array.

    Returns ``(counts, starts)`` — the post-scan layout the reference derives
    from histogram + exclusive scan (small_data.cu:96-98).
    """
    bounds = jnp.searchsorted(
        sorted_pids, jnp.arange(n_bins + 1, dtype=sorted_pids.dtype),
        side="left",
    ).astype(jnp.int32)
    return bounds[1:] - bounds[:-1], bounds[:-1]


# ---------------------------------------------------------------------------
# Pallas streaming histogram (the performance path for the network fanout).
# ---------------------------------------------------------------------------

def _hist_kernel(pid_ref, out_ref):
    """Accumulates per-(bin, lane) counts: out[b, l] += |{r : pid[r,l]==b}|.

    Layout chosen for Mosaic: bins on the sublane axis, the 128 input lanes
    kept as lanes, so every op is a plain 2-D broadcast compare — no
    reshape/transpose relayouts.  The final lane-reduction happens outside
    the kernel (one (n_bins, 128) -> (n_bins,) sum in XLA).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = pid_ref.shape[0]
    n_bins = out_ref.shape[0]
    bins_col = jax.lax.broadcasted_iota(jnp.int32, (n_bins, 1), 0)

    def body(r, acc):
        pid_row = pid_ref[pl.ds(r, 1), :]               # (1, 128)
        eq = (pid_row == bins_col).astype(jnp.int32)    # (n_bins, 128)
        return acc + eq

    acc = jax.lax.fori_loop(
        0, rows, body,
        jnp.zeros((n_bins, 128), jnp.int32))
    out_ref[...] += acc


@functools.partial(jax.jit, static_argnames=("n_bins", "chunk", "interpret"))
def histogram_pallas(pids: jnp.ndarray, n_bins: int, chunk: int = 32 * 1024,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Streaming Pallas bincount. pids must be int32[N], N % chunk == 0
    is not required (tail is padded with bin 0 and corrected)."""
    if interpret is None:
        interpret = pallas_interpret()
    n = pids.shape[0]
    n128 = ((n + 127) // 128) * 128
    if chunk >= n128:
        chunk = n128          # single block: block dims == array dims
    else:
        # multi-step grid: sublane dim (chunk/128) must be divisible by 8
        chunk = max(1024, (chunk // 1024) * 1024)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pad = n_pad - n
    if pad:
        pids = jnp.concatenate([pids, jnp.zeros((pad,), pids.dtype)])
    pids2d = pids.reshape(n_pad // 128, 128)
    rows_per_chunk = chunk // 128

    per_lane = pl.pallas_call(
        _hist_kernel,
        grid=(n_pad // chunk,),
        in_specs=[pl.BlockSpec((rows_per_chunk, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_bins, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_bins, 128), jnp.int32),
        interpret=interpret,
    )(pids2d)
    out = jnp.sum(per_lane, axis=1)
    if pad:
        out = out.at[0].add(-pad)
    return out


def histogram(pids: jnp.ndarray, n_bins: int, use_pallas: bool = True) -> jnp.ndarray:
    """Dispatch: Pallas streaming kernel for small fanouts, onehot otherwise."""
    if use_pallas and n_bins <= 1024:
        return histogram_pallas(pids, n_bins)
    return histogram_onehot(pids, n_bins)
