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
from ..utils.debug import join_debug
from .join import join_count_checked


def _chunks(n: int, chunk: int) -> Iterator[tuple[int, int]]:
    for lo in range(0, n, chunk):
        yield lo, min(chunk, n - lo)


def _combined_cuts(sorted_r: np.ndarray, s_unsorted: np.ndarray,
                   n_coarse: int) -> np.ndarray:
    """Bucket cut values = quantiles of the MERGED key distribution, so
    BOTH sides' buckets are bounded by ~(|R|+|S|)/n_coarse: R-only cuts
    would let an S unlike R (e.g. disjoint-range S) land entirely in one
    bucket, making pad_s = |S| — the very single-pair HBM blowup quantile
    cutting exists to avoid.  S is sampled (its sort may not have happened
    yet — the diagonal path overlaps it with R's transfer), which is fine:
    cuts only balance, correctness never depends on them, and a 2^16
    sample pins quantiles to ~0.5% error."""
    m = 1 << 16
    nr_, ns_ = sorted_r.shape[0], s_unsorted.shape[0]
    if nr_ == 0 and ns_ == 0:
        return np.zeros(n_coarse - 1, np.uint32)
    parts = []
    if nr_:
        ix = (np.arange(min(m, nr_), dtype=np.int64) * nr_) \
            // min(m, nr_)
        parts.append(sorted_r[ix])
    if ns_:
        if ns_ <= m:
            parts.append(np.sort(s_unsorted))
        else:
            rng = np.random.default_rng(0xC0FFEE)
            parts.append(np.sort(s_unsorted[rng.integers(0, ns_, m)]))
    merged = np.sort(np.concatenate(parts))
    ix = (np.arange(1, n_coarse, dtype=np.int64)
          * merged.shape[0]) // n_coarse
    return merged[ix]


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
                         spill: str = "host",
                         meas=None) -> int:
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
        # Cut by VALUE QUANTILES, not top radix bits: dense workloads
        # (e.g. unique keys over [0, n) — the BASELINE shape) leave the
        # top bits constant, collapsing bit buckets into one HBM-busting
        # pair (round-3 diagnostic: pairs=1 at 64M).  Equal
        # searchsorted(side="left") on both sides keeps duplicate runs
        # intact and boundaries consistent, so the pairing stays exact
        # for any distribution.
        def bucket_slices(skeys, cuts):
            bounds = [0, *np.searchsorted(skeys, cuts,
                                          side="left").tolist(),
                      skeys.shape[0]]
            return [skeys[bounds[p]:bounds[p + 1]] for p in range(n_coarse)]

        def combined_cuts(sorted_r, s_unsorted):
            return _combined_cuts(sorted_r, s_unsorted, n_coarse)

        if mode == "diagonal":
            # Sort/transfer overlap (the reference's tiled-cursor overlap,
            # kernels_tile.cu:61-102): S's native sort runs on a worker
            # thread (ctypes releases the GIL; the sort is the other
            # core's work) WHILE R's compressed bucket streams cross the
            # interconnect — the transfer is network-bound, so the two
            # costs genuinely stack.
            import threading
            r_sorted = native.radix_sort_keys(r_keys)
            cuts = combined_cuts(r_sorted, s_keys)
            rk_b = bucket_slices(r_sorted, cuts)
            box: dict = {}
            th = threading.Thread(
                target=lambda: box.__setitem__(
                    "s", native.radix_sort_keys(s_keys)))
            th.start()
            max_rb = max(1024, max((b.shape[0] for b in rk_b), default=0))
            pad_r = ((max_rb + 1023) // 1024) * 1024
            r_staged = {p: _stage(_delta_encode(rk_b[p], pad_r,
                                                0xFFFFFFFF))
                        for p in range(n_coarse) if rk_b[p].shape[0]}
            th.join()
            sk_b = bucket_slices(box["s"], cuts)
            return _pass2_presorted(rk_b, sk_b, cfg, skew_aware,
                                    r_staged=r_staged, pad_r=pad_r,
                                    meas=meas)
        r_sorted = native.radix_sort_keys(r_keys)
        cuts = combined_cuts(r_sorted, s_keys)
        rk_b = bucket_slices(r_sorted, cuts)
        sk_b = bucket_slices(native.radix_sort_keys(s_keys), cuts)
        # shift=0: quantile buckets share no fixed top bits (unlike the
        # device radix spill), so downstream hashing must use all bits.
        return _pass2(rk_b, sk_b, cfg, coarse_bits, skew_aware, mode,
                      shift=0)

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


def _delta_encode(keys: np.ndarray, pad_to: int, sentinel: int):
    """Delta-compress a host-SORTED uint32 bucket for the wire.

    A sorted stream's first differences are tiny (mean gap = domain/n),
    so the interconnect moves a uint8 (4x) or uint16 (2x) delta stream
    instead of raw keys — the OOC path's entire bottleneck (the
    reference compresses its network tuples for the same reason,
    CompressedTuple / NetworkPartitioning.cpp:128-129).

    Returns ("delta", stream[pad_to] u8|u16, first_key u32, n_valid i32,
    sentinel u32) or ("raw", keys_padded[pad_to] u32) when the bucket is
    too sparse for 16-bit gaps.
    """
    n = keys.shape[0]
    if n == 0:
        return ("raw", np.full(pad_to, np.uint32(sentinel)))
    d = np.zeros(pad_to, np.uint32)
    np.subtract(keys[1:], keys[:-1], out=d[1:n])
    mx = int(d[1:n].max()) if n > 1 else 0
    # Width chosen by the bucket's max gap; the first key rides as a
    # uint32 SCALAR and the padded tail is masked to the sentinel by
    # valid-count on device, so there is NO exception machinery at all.
    # (Round-3 lessons, each measured on chip: per-bucket exception
    # shapes triggered 30-40 s remote compiles each; a scatter-add
    # decode serialised ~minutes/bucket; the searchsorted rewrite still
    # cost ~14 s per 64M bucket in its 23 gather passes.  A pure
    # cumsum+mask decode is the only shape the TPU runs at speed.)
    if mx < 256:
        stream = d.astype(np.uint8)
    elif mx < 65536:
        stream = d.astype(np.uint16)
    else:
        # MAX gap >= 2^16 (deliberately max, not mean): one oversized
        # gap forfeits the whole bucket's compression, but every exact
        # repair mechanism was measured out on this TPU (round-3 notes
        # above: per-bucket exception shapes recompile 30-40 s each,
        # scatter-add patching serialises, searchsorted costs seconds)
        # — and splitting the stream at rare oversized gaps makes the
        # segment count/shapes data-dependent, which is the same
        # recompile trap.  Raw costs 2-4x wire on near-dense data with
        # one hole; accepted until a static-shape patch mechanism
        # exists.
        raw = np.full(pad_to, np.uint32(sentinel))
        raw[:n] = keys
        return ("raw", raw)
    return ("delta", stream, np.uint32(keys[0]), np.int32(n),
            np.uint32(sentinel))


def _stage(enc):
    """Move an encoded bucket's stream to the device, keeping the tag
    (scalars stay host-side: they are dynamic jit args, not shapes)."""
    if enc[0] == "raw":
        return ("raw", jnp.asarray(enc[1]))
    return ("delta", jnp.asarray(enc[1]), *enc[2:])


def _decode_staged(st):
    """Staged encoded bucket -> biased sorted device keys."""
    if st[0] == "raw":
        return _bias_raw(st[1])
    return _delta_decode(*st[1:])


_bias_raw = jax.jit(bias_keys)


@jax.jit
def _delta_decode(stream: jnp.ndarray, first: jnp.ndarray,
                  n_valid: jnp.ndarray, sentinel: jnp.ndarray):
    # NOT donated: pre-staged streams (sort/transfer overlap) are decoded
    # again on the escalation path; donation would consume them.
    """uint8/uint16 deltas -> biased-int32 sorted keys (on device).

    key[j] = first + cumsum(stream)[j] for j < n_valid, else sentinel.
    One cumsum + one mask — no gather, no scatter (see _delta_encode for
    why).  Exact: deltas sum to key[j] - key[0] < 2^32, so uint32
    accumulation never wraps.  Two compiled variants per size class
    (uint8 / uint16 stream)."""
    cum = first + jnp.cumsum(stream.astype(jnp.uint32), dtype=jnp.uint32)
    j = jnp.arange(stream.shape[0], dtype=jnp.int32)
    return bias_keys(jnp.where(j < n_valid, cum, sentinel))


@functools.partial(jax.jit, static_argnames=("k_drift", "rows_per_group"))
def _diag_prebias(kr_b, ks_b, k_drift, rows_per_group):
    # Decoded buckets arrive already biased (bias_keys fused into decode).
    return probe_count_diagonal(kr_b, ks_b, k_drift=k_drift,
                                rows_per_group=rows_per_group)


def _pass2_presorted(rk_b, sk_b, cfg, skew_aware, r_staged=None,
                     pad_r=None, meas=None) -> int:
    """Join host-SORTED bucket pairs: rank-diagonal probe directly on the
    staged keys (zero device sorts), escalating any bucket that trips the
    probe's exact coverage check to the always-correct mergecount rung.

    Interconnect and overlap discipline (this path is transfer-bound —
    the relay here moves ~25 MB/s; PCIe on a real host is ~100x but the
    ratios persist): buckets cross as uint8 delta streams (4x), and no
    result is pulled until every pair's decode+probe is dispatched, so
    bucket p's device work overlaps the host-side encode + H2D of bucket
    p+1 (the reference's tiled-cursor overlap, kernels_tile.cu:61-102).
    Escalations re-probe only the failing pairs afterwards.
    """
    n_coarse = len(rk_b)
    max_rb = max(1024, max((b.shape[0] for b in rk_b), default=0))
    max_sb = max(1024, max((b.shape[0] for b in sk_b), default=0))
    if pad_r is None:
        pad_r = ((max_rb + 1023) // 1024) * 1024
    pad_s = ((max_sb + 1023) // 1024) * 1024

    import contextlib as _ctx

    def _detail(name, elements=0):
        # per-bucket counters (reference MEASUREMENT_DETAILS per-put
        # tier, Measurements.cpp:247-541): encode = host CPU work,
        # stage_dispatch = H2D + decode + probe enqueue
        if meas is None:
            return _ctx.nullcontext()
        return meas.detail(name, elements=elements)

    def decode_pair(p):
        # Sentinel padding keeps the staged array sorted (keys <
        # 2^32 - 16) and maps onto the probe's side-distinct convention.
        if r_staged is not None and p in r_staged:
            kr_dev = _decode_staged(r_staged[p])
        else:
            with _detail("OOC_ENCODE_R", elements=rk_b[p].shape[0]):
                enc = _delta_encode(rk_b[p], pad_r, 0xFFFFFFFF)
            kr_dev = _decode_staged(_stage(enc))
        with _detail("OOC_ENCODE_S", elements=sk_b[p].shape[0]):
            enc_s = _delta_encode(sk_b[p], pad_s, 0xFFFFFFFE)
        ks_dev = _decode_staged(_stage(enc_s))
        return kr_dev, ks_dev

    # One-deep pipeline: dispatch pair p's decode+probe, then pull pair
    # p-1's count — bucket p's host encode + H2D overlaps bucket p-1's
    # device probe, while at most two pairs are resident (~4 x bucket).
    import time as _time
    t_disp = _time.perf_counter()
    results = []                              # (p, nr, ns, m, ok)
    prev = None
    live = [q for q in range(n_coarse)
            if rk_b[q].shape[0] and sk_b[q].shape[0]]
    for p in live:
        with _detail("OOC_BUCKET_DISPATCH",
                     elements=rk_b[p].shape[0] + sk_b[p].shape[0]):
            kr_dev, ks_dev = decode_pair(p)
            m, ok = _diag_prebias(kr_dev, ks_dev, cfg.diagonal_k,
                                  cfg.diagonal_rows_per_group)
        del kr_dev, ks_dev                    # freed once the probe runs
        if prev is not None:
            q, m0, ok0 = prev
            results.append((q, int(m0), bool(ok0)))
        prev = (p, m, ok)
    t_drain = _time.perf_counter()
    if prev is not None:
        q, m0, ok0 = prev
        results.append((q, int(m0), bool(ok0)))
    n_esc = sum(1 for _, _, ok in results if not ok)
    join_debug("OOC", "pairs=%d dispatch+overlap=%.1fs last_drain=%.1fs "
               "escalations=%d", len(live), t_drain - t_disp,
               _time.perf_counter() - t_drain, n_esc)

    total = 0
    zr = zs = None
    unbias = jax.jit(lambda b: jax.lax.bitcast_convert_type(
        b, jnp.uint32) ^ jnp.uint32(0x80000000))
    for p, m, ok in results:
        if ok:
            total += m
            continue
        # Escalation (skew / unbalanced bucket): terminal concat-sort
        # count; the bucket is re-staged (escalations are the rare tail —
        # re-transfer beats pinning every bucket on device).  Bias is
        # undone first (mergecount expects raw uint32 keys); sentinels
        # are masked by the valid counts exactly like any padded suffix.
        nr, ns = rk_b[p].shape[0], sk_b[p].shape[0]
        if zr is None:
            zr = jnp.zeros(pad_r, jnp.uint32)
            zs = jnp.zeros(pad_s, jnp.uint32)
        kr_dev, ks_dev = decode_pair(p)
        total += join_count_checked(
            Relation(unbias(kr_dev), zr), Relation(unbias(ks_dev), zs),
            cfg, mode="mergecount", skew_aware=True,
            r_valid_count=jnp.int32(nr), s_valid_count=jnp.int32(ns))
    return total


def _pass2(rk_b, sk_b, cfg, coarse_bits, skew_aware, mode,
           shift: int | None = None) -> int:
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
            cfg, shift=coarse_bits if shift is None else shift,
            skew_aware=skew_aware, mode=mode,
            r_valid_count=jnp.int32(nr), s_valid_count=jnp.int32(ns))
    return total
