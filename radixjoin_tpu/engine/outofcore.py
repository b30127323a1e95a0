"""Out-of-core chunked join driver for relations larger than HBM.

TPU-native replacement for the reference's large-data machinery:
  - ``LD::`` chunked kernels (operators/gpu/kernels.cu:563-857): histograms /
    reorders / probes carrying iterCount so 128M-tuple chunk passes interleave
    into one global layout (MAX_CHUNK_SIZE, data/data.hpp:17-20).
  - ``SD::OPT::TLD`` tiled kernels (operators/gpu/kernels_tile.cu): host-pinned
    tiles streamed through the GPU with cursor state carried between tiles.

Structure (classic Grace-join on one chip):
  pass 1  partition both host-resident relations into ``coarse_bits``
          top-radix-bit spill buckets.  Default ``spill="host"``: the
          **native host radix sort** (native.radix_sort_keys — the
          reference's CPU software-write-combine scatter applied per
          byte digit, tasks/NetworkPartitioning.cpp:116-173 /
          LocalPartitioning.cpp:138-250, multithreaded) fully sorts each
          relation; buckets are slices of the sorted array.  Zero device
          transfer, and pass 2 receives PRESORTED buckets.
          ``spill="device"`` instead streams fixed-size chunks through
          the device partitioner (keys-only rotated sort, un-rotated
          before D2H) with double-buffered chunks so transfer overlaps
          device compute (the reference's tiled path overlaps PCIe the
          same way, small_data.cu:85-165).
  pass 2  for each coarse partition, join the (now device-sized)
          R_p >< S_p pair on device.  Host-sorted buckets go straight
          into the rank-diagonal probe — the device runs ZERO sorts, so
          the chip does only the O(n) probe while the host CPU plays the
          reference's partitioning role.

Count joins never need row ids, so the spill carries **keys only** — half
the host<->device traffic of a (key, rid) spill.  With the host-side
pass 1, total interconnect traffic is one H2D pass over both relations
(vs three passes for the device spill).

Every device step has a static shape (chunk padding via the engine's
valid-count masks), so exactly two executables are compiled regardless of
relation size.  Host->device transfer is the remaining bottleneck by
design, exactly as PCIe is for the reference's tiled path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import jax
import jax.numpy as jnp

import functools

from .. import native
from ..config import JoinConfig, DEFAULT_CONFIG
from ..data.tuples import Relation
from ..ops.buildprobe import bias_keys, probe_count_diagonal
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
                         mode: str | None = None,
                         spill: str = "host") -> int:
    """Join relations held in host memory, streaming through the device.

    ``coarse_bits`` top-level partitions (choose so that the largest
    R_p + S_p pair fits HBM); ``chunk`` tuples per device pass 1 step
    (device spill only).  ``spill``: "host" (native CPU write-combine
    scatter, no device round-trip — the default) or "device" (chunked
    device partitioner).  Count-only: ``r_rids``/``s_rids`` are accepted
    for signature parity but never moved to the device.
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

    if spill == "host":
        # Native CPU pass 1: fully radix-sort each relation (a full sort IS
        # the coarse partition — buckets are slices of the sorted array by
        # their top bits) with zero device traffic.  Sorted buckets pay off
        # twice downstream: pass 2 skips BOTH device partition sorts (the
        # in-HBM engine's dominant cost) via the presorted diagonal probe,
        # and the interconnect moves monotone streams.
        def spill_host(keys_np):
            skeys = native.radix_sort_keys(keys_np)
            cuts = (np.arange(1, n_coarse, dtype=np.uint64)
                    << np.uint64(32 - coarse_bits)).astype(np.uint32)
            bounds = [0, *np.searchsorted(skeys, cuts).tolist(),
                      skeys.shape[0]]
            return [skeys[bounds[p]:bounds[p + 1]] for p in range(n_coarse)]

        rk_b = spill_host(r_keys)
        sk_b = spill_host(s_keys)
        if mode == "diagonal":
            return _pass2_presorted(rk_b, sk_b, cfg, skew_aware)
        return _pass2(rk_b, sk_b, cfg, coarse_bits, skew_aware, mode)

    part_fn = _partition_chunk_keys_fn(chunk, coarse_bits)

    def spill_device(keys_np):
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

    rk_b = spill_device(r_keys)
    sk_b = spill_device(s_keys)
    return _pass2(rk_b, sk_b, cfg, coarse_bits, skew_aware, mode)


@functools.partial(jax.jit, static_argnames=("k_drift", "rows_per_group"))
def _diag_presorted(kr, ks, k_drift, rows_per_group):
    # bias_keys is elementwise and order-preserving, so host-sorted uint32
    # buckets (sentinel-padded tails included) feed the diagonal probe with
    # NO device sort — the steady-state "hash table" arrives prebuilt.
    return probe_count_diagonal(bias_keys(kr), bias_keys(ks),
                                k_drift=k_drift,
                                rows_per_group=rows_per_group)


def _pass2_presorted(rk_b, sk_b, cfg, skew_aware) -> int:
    """Join host-SORTED bucket pairs: rank-diagonal probe directly on the
    staged keys (zero device sorts), escalating any bucket that trips the
    probe's exact coverage check to the always-correct mergecount rung."""
    n_coarse = len(rk_b)
    total = 0
    max_rb = max(1024, max((b.shape[0] for b in rk_b), default=0))
    max_sb = max(1024, max((b.shape[0] for b in sk_b), default=0))
    pad_r = ((max_rb + 1023) // 1024) * 1024
    pad_s = ((max_sb + 1023) // 1024) * 1024
    # Sentinel padding keeps the staged array sorted (keys < 2^32 - 16) and
    # maps straight onto the probe's side-distinct padding convention.
    kr = np.full(pad_r, 0xFFFFFFFF, np.uint32)
    ks = np.full(pad_s, 0xFFFFFFFE, np.uint32)
    zr = zs = None
    for p in range(n_coarse):
        nr, ns = rk_b[p].shape[0], sk_b[p].shape[0]
        if nr == 0 or ns == 0:
            continue
        kr[:nr] = rk_b[p]; kr[nr:] = np.uint32(0xFFFFFFFF)
        ks[:ns] = sk_b[p]; ks[ns:] = np.uint32(0xFFFFFFFE)
        kr_dev = jnp.asarray(kr)
        ks_dev = jnp.asarray(ks)
        m, ok = _diag_presorted(kr_dev, ks_dev, cfg.diagonal_k,
                                cfg.diagonal_rows_per_group)
        if bool(ok):
            total += int(m)
            continue
        # Escalation (skew / unbalanced bucket): terminal concat-sort count
        # on the same staged device arrays; sentinels are masked by the
        # valid counts exactly like any padded suffix.
        if zr is None:
            zr = jnp.zeros(pad_r, jnp.uint32)
            zs = jnp.zeros(pad_s, jnp.uint32)
        total += join_count_checked(
            Relation(kr_dev, zr), Relation(ks_dev, zs), cfg,
            mode="mergecount", skew_aware=True,
            r_valid_count=jnp.int32(nr), s_valid_count=jnp.int32(ns))
    return total


def _pass2(rk_b, sk_b, cfg, coarse_bits, skew_aware, mode) -> int:
    """Join coarse bucket pairs on device with static padded shapes (one
    compile for the largest bucket size class).  Rids are device-side
    zeros — a count join never reads them."""
    n_coarse = 1 << coarse_bits
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
