"""Out-of-core chunked join driver for relations larger than HBM.

TPU-native replacement for the reference's large-data machinery:
  - ``LD::`` chunked kernels (operators/gpu/kernels.cu:563-857): histograms /
    reorders / probes carrying iterCount so 128M-tuple chunk passes interleave
    into one global layout (MAX_CHUNK_SIZE, data/data.hpp:17-20).
  - ``SD::OPT::TLD`` tiled kernels (operators/gpu/kernels_tile.cu): host-pinned
    tiles streamed through the GPU with cursor state carried between tiles.

Structure (classic Grace-join on one chip):
  pass 1  stream fixed-size chunks of R (then S) through the device
          partitioner on ``coarse_bits`` high-level radix bits; the host
          regroups the returned contiguous partitions into per-partition
          spill buckets (numpy; stands in for host RAM / disk).
  pass 2  for each coarse partition, stream the (now device-sized)
          R_p >< S_p pair through the in-HBM engine (engine/join.py).

Count joins never need row ids, so the spill carries **keys only** — half
the host<->device traffic of a (key, rid) spill — and pass 1 uses the
keys-only rotated partitioner (one sort operand; see
ops/partition.partition_keys_rotated), un-rotating on device before the
D2H so pass 2 sees raw keys.  Chunk steps are **double-buffered**: chunk
i+1's H2D + partition is enqueued before chunk i's result is pulled, so
the relay transfer overlaps device compute (the reference's tiled path
overlaps PCIe the same way via streams, small_data.cu:85-165).

Every device step has a static shape (chunk padding via the engine's
valid-count masks), so exactly two executables are compiled regardless of
relation size.  Host->device transfer is the bottleneck by design, exactly
as PCIe is for the reference's tiled path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import jax
import jax.numpy as jnp

from ..config import JoinConfig, DEFAULT_CONFIG
from ..data.tuples import Relation
from ..ops.partition import partition_keys_rotated
from .join import join_count_checked


def _chunks(n: int, chunk: int) -> Iterator[tuple[int, int]]:
    for lo in range(0, n, chunk):
        yield lo, min(chunk, n - lo)


def _partition_chunk_keys_fn(chunk: int, coarse_bits: int):
    @jax.jit
    def fn(keys, valid_count):
        drop = jnp.arange(chunk, dtype=jnp.int32) >= valid_count
        part = partition_keys_rotated(keys, coarse_bits, 0, drop)
        # Un-rotate (partition_keys_rotated rotated left by 32-coarse_bits)
        # so the spill holds raw keys.  Dropped rows sit past sum(counts).
        k = part.keys
        raw = ((k << jnp.uint32(coarse_bits))
               | (k >> jnp.uint32(32 - coarse_bits)))
        return raw, part.counts
    return fn


def join_count_outofcore(r_keys: np.ndarray, r_rids: np.ndarray,
                         s_keys: np.ndarray, s_rids: np.ndarray,
                         cfg: JoinConfig = DEFAULT_CONFIG,
                         coarse_bits: int = 3,
                         chunk: int | None = None,
                         skew_aware: bool = False,
                         mode: str | None = None) -> int:
    """Join relations held in host memory, streaming through the device.

    ``coarse_bits`` top-level partitions (choose so that the largest
    R_p + S_p pair fits HBM); ``chunk`` tuples per device pass 1 step.
    Count-only: ``r_rids``/``s_rids`` are accepted for signature parity but
    never moved to the device.
    """
    if mode is None:
        # diagonal on real hardware (buckets are balanced splits of both
        # sides); the interpreter-mode kernels are too slow for CPU tests.
        mode = "diagonal" if jax.default_backend() == "tpu" else "partitioned"
    chunk = chunk or cfg.chunk_tuples
    n_r, n_s = r_keys.shape[0], s_keys.shape[0]
    chunk = min(chunk, max(n_r, n_s))
    chunk = max(1024, ((chunk + 1023) // 1024) * 1024)
    n_coarse = 1 << coarse_bits

    part_fn = _partition_chunk_keys_fn(chunk, coarse_bits)

    def spill(keys_np):
        buckets = [[] for _ in range(n_coarse)]
        bufs = [np.zeros(chunk, np.uint32), np.zeros(chunk, np.uint32)]

        def drain(pend):
            pk, counts = pend
            pk = np.asarray(pk)
            counts = np.asarray(counts)
            starts = np.cumsum(counts) - counts
            for p in range(n_coarse):
                c = int(counts[p])
                if c:
                    s0 = int(starts[p])
                    buckets[p].append(pk[s0:s0 + c].copy())

        pending = None
        for i, (lo, sz) in enumerate(_chunks(keys_np.shape[0], chunk)):
            buf = bufs[i & 1]
            buf[:sz] = keys_np[lo:lo + sz]
            # Enqueue chunk i's H2D + partition, then drain chunk i-1 while
            # it runs (double buffering; jax dispatch is asynchronous).
            out = part_fn(jnp.asarray(buf), jnp.int32(sz))
            if pending is not None:
                drain(pending)
            pending = out
        if pending is not None:
            drain(pending)
        return [np.concatenate(b) if b else np.empty(0, np.uint32)
                for b in buckets]

    rk_b = spill(r_keys)
    sk_b = spill(s_keys)

    # pass 2: join partition pairs on device with static padded shapes (one
    # compile for the largest bucket size class).  Rids are device-side
    # zeros — a count join never reads them.
    total = 0
    max_rb = max(1024, max((b.shape[0] for b in rk_b), default=0))
    max_sb = max(1024, max((b.shape[0] for b in sk_b), default=0))
    pad_r = ((max_rb + 1023) // 1024) * 1024
    pad_s = ((max_sb + 1023) // 1024) * 1024
    kr = np.zeros(pad_r, np.uint32)
    ks = np.zeros(pad_s, np.uint32)
    zr = jnp.zeros(pad_r, jnp.uint32)
    zs = jnp.zeros(pad_s, jnp.uint32)
    for p in range(n_coarse):
        nr, ns = rk_b[p].shape[0], sk_b[p].shape[0]
        if nr == 0 or ns == 0:
            continue
        kr[:nr] = rk_b[p]; kr[nr:] = 0
        ks[:ns] = sk_b[p]; ks[ns:] = 0
        total += join_count_checked(
            Relation(jnp.asarray(kr), zr),
            Relation(jnp.asarray(ks), zs),
            cfg, shift=coarse_bits, skew_aware=skew_aware, mode=mode,
            r_valid_count=jnp.int32(nr), s_valid_count=jnp.int32(ns))
    return total
