"""64-bit-key join support.

The reference's tuples carry ``uint64`` keys (data/Tuple.h:15-22).  The TPU
engine's fast path is 32-bit SoA (the VPU's native word), but capability
parity requires 64-bit keys for >4G key domains.  Wide keys are (hi, lo)
``uint32`` pairs — x64 stays off, and ``jax.lax.sort`` is variadic with
``num_keys=2``, so lexicographic (hi, lo) sorting is native.

``join64_count`` counts equi-join matches with one concat-sort:
  sort [R ++ S] by (hi, lo, side); equal keys form runs; each run
  contributes (#R in run) * (#S in run).  Run extents come from
  change-point scans (no scatter, no hash table), and per-element run
  boundaries from associative max/min scans — the same scatter-free
  discipline as the rest of the engine (docs/DESIGN.md §1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Relation64(NamedTuple):
    """Wide-key relation: parallel (key_hi, key_lo, rid) uint32 vectors."""
    key_hi: jnp.ndarray
    key_lo: jnp.ndarray
    rids: jnp.ndarray

    @property
    def size(self) -> int:
        return self.key_hi.shape[0]


def make_relation64(keys64, rids) -> Relation64:
    import numpy as np
    keys64 = np.asarray(keys64, np.uint64)
    return Relation64(jnp.asarray((keys64 >> np.uint64(32)).astype(np.uint32)),
                      jnp.asarray((keys64 & np.uint64(0xFFFFFFFF))
                                  .astype(np.uint32)),
                      jnp.asarray(rids, jnp.uint32))


@jax.jit
def join64_count(r: Relation64, s: Relation64) -> jnp.ndarray:
    """Exact match count over 64-bit keys. int32 result (chunk upstream for
    larger totals, as with the 32-bit engine).

    Gather-free: the side tag rides as a third sort key, so within every
    equal-key run all R rows precede all S rows; each S element then
    contributes (R-count before it) - (R-count before its run), and the
    run baseline propagates by a running max of run-start prefix counts
    (monotone, so max-scan is exact) — scans and sums only, no
    data-dependent gathers (XLA:TPU gathers at 10^7+ elements are the
    slowest op class in this engine)."""
    n_r = r.size
    hi = jnp.concatenate([r.key_hi, s.key_hi])
    lo = jnp.concatenate([r.key_lo, s.key_lo])
    side = jnp.concatenate([jnp.zeros((n_r,), jnp.int32),
                            jnp.ones((s.size,), jnp.int32)])
    shi, slo, stag = jax.lax.sort((hi, lo, side), num_keys=3,
                                  is_stable=False)
    change = jnp.concatenate([
        jnp.ones((1,), bool),
        (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
    cum_r = jnp.cumsum((stag == 0).astype(jnp.int32))     # R rows <= i
    cum_r_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum_r[:-1]])
    # cummax, not associative_scan: lax.cummax lowers to one fused
    # reduce-window; associative_scan's slice/concat log-tree ballooned
    # TPU compile time at 16M+ elements (see buildprobe.probe_count_merged).
    base = jax.lax.cummax(jnp.where(change, cum_r_prev, 0),
                          axis=0)                         # R rows < run
    return jnp.sum(jnp.where(stag == 1, cum_r - base, 0))


def _merged_contrib64(r_hi, r_lo, s_hi, s_lo) -> jnp.ndarray:
    """Per-element int32 contributions of the 64-bit mergecount (each
    <= |R|; the scan scheme of :func:`join64_count`)."""
    n_r = r_hi.shape[0]
    hi = jnp.concatenate([r_hi, s_hi])
    lo = jnp.concatenate([r_lo, s_lo])
    side = jnp.concatenate([jnp.zeros((n_r,), jnp.int32),
                            jnp.ones((s_hi.shape[0],), jnp.int32)])
    shi, slo, stag = jax.lax.sort((hi, lo, side), num_keys=3,
                                  is_stable=False)
    change = jnp.concatenate([
        jnp.ones((1,), bool),
        (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
    cum_r = jnp.cumsum((stag == 0).astype(jnp.int32))
    cum_r_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum_r[:-1]])
    base = jax.lax.cummax(jnp.where(change, cum_r_prev, 0), axis=0)
    return jnp.where(stag == 1, cum_r - base, 0)


@jax.jit
def join64_count_keys(r_hi, r_lo, s_hi, s_lo) -> jnp.ndarray:
    """Keys-only exact 64-bit count (concat-sort mergecount) — the
    escalation rung for run-pair probes at large N (engine/large.py),
    where materialising rid planes would waste HBM.  int32 device total;
    for pair totals that may pass 2^31 use :func:`join64_count_keys_exact`."""
    return jnp.sum(_merged_contrib64(r_hi, r_lo, s_hi, s_lo))


@jax.jit
def _merged_partials64(r_hi, r_lo, s_hi, s_lo):
    # Same overflow-free 15/15-bit block-sum scheme as
    # ops/buildprobe._merged_partials (see proof there).
    c = _merged_contrib64(r_hi, r_lo, s_hi, s_lo)
    block = 1 << 15
    pad = (-c.shape[0]) % block
    if pad:
        c = jnp.concatenate([c, jnp.zeros((pad,), jnp.int32)])
    c = c.reshape(-1, block)
    return (jnp.sum(c & jnp.int32(0x7FFF), axis=1, dtype=jnp.int32),
            jnp.sum(c >> 15, axis=1, dtype=jnp.int32))


def join64_count_keys_exact(r_hi, r_lo, s_hi, s_lo) -> int:
    """Host-finished exact 64-bit-key mergecount: no int32 wraparound
    under arbitrary skew (e.g. a degenerate-hi pair with >2^31 intra-pair
    matches) — the escalation rung large-N wide-key paths must use."""
    lo_p, hi_p = _merged_partials64(r_hi, r_lo, s_hi, s_lo)
    lo_h = np.asarray(jax.device_get(lo_p), dtype=np.int64).sum()
    hi_h = np.asarray(jax.device_get(hi_p), dtype=np.int64).sum()
    return int(lo_h + (hi_h << 15))


# ---------------------------------------------------------------------------
# Wide diagonal rank-band probe — the 64-bit fast path.
#
# The 32-bit diagonal kernel (ops/buildprobe.probe_count_diagonal) carried
# to (hi, lo) plane pairs: both planes are biased int32, compared with
# 64-bit lexicographic predicates built from signed int32 compares.  The
# per-row window offset j0 uses the hi plane only (a *lower bound* on the
# lexicographic rank — matches can never fall below the window, and any
# slack from long hi-runs shows up as drift and trips the exact coverage
# check).  Degenerate-hi workloads (few distinct hi words) therefore
# escalate to the always-correct concat-sort join64_count.
# ---------------------------------------------------------------------------

import functools

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.backend import pallas_interpret
from .buildprobe import bias_keys, _ROWS, _diag_geometry

_SENT_HI = 0x7FFFFFFF          # biased hi of both padding sentinels
_R_SENT_LO = 0x7FFFFFFF        # biased lo of the R padding sentinel
_S_SENT_LO = 0x7FFFFFFE        # biased lo of the S padding sentinel
# (64-bit key domain: [0, 2^64 - 16) — mirrors the 32-bit engine.)


def _lt64(ah, al, bh, bl):
    """(ah,al) < (bh,bl) lexicographic, as an int32 0/1 mask."""
    return ((ah < bh).astype(jnp.int32)
            + (ah == bh).astype(jnp.int32) * (al < bl).astype(jnp.int32))


def _le64(ah, al, bh, bl):
    return ((ah < bh).astype(jnp.int32)
            + (ah == bh).astype(jnp.int32) * (al <= bl).astype(jnp.int32))


def _probe_diag64_kernel(K, b8, gr, e_cap, wg_ref, rh_ref, rl_ref,
                         sh_ref, sl_ref, out_ref, scr_h, scr_l,
                         sem_h, sem_l):
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    k = jax.lax.rem(g, _ROWS)
    slot = jax.lax.rem(g, 2)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def band_dma(gi, sl):
        return (pltpu.make_async_copy(
                    sh_ref.at[pl.ds(wg_ref[gi], b8), :], scr_h.at[sl],
                    sem_h.at[sl]),
                pltpu.make_async_copy(
                    sl_ref.at[pl.ds(wg_ref[gi], b8), :], scr_l.at[sl],
                    sem_l.at[sl]))

    @pl.when(g == 0)
    def _():
        for c in band_dma(0, 0):
            c.start()

    @pl.when(g + 1 < n_g)
    def _():
        for c in band_dma(g + 1, jax.lax.rem(g + 1, 2)):
            c.start()

    for c in band_dma(g, slot):
        c.wait()

    lanes1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
    band_h = scr_h[slot]                                # (b8, 128)

    cnt = jnp.zeros((1, 128), jnp.int32)
    viol = jnp.zeros((1, 128), jnp.int32)
    for i in range(gr):                                 # static unroll
        # In-band window start (cf. _probe_diag_kernel): the hi-plane-only
        # count matches the host's old hi-plane searchsorted lower bound —
        # equal-hi/smaller-lo slack is absorbed by K and the coverage
        # check, exactly as before.
        rh_i = rh_ref[i:i + 1, :]
        head_h = rh_i[0, 0]
        rl_i = rl_ref[i:i + 1, :]
        head_l = rl_i[0, 0]
        rvalid_i = 1 - ((head_h == jnp.int32(_SENT_HI)).astype(jnp.int32)
                        * (head_l == jnp.int32(_R_SENT_LO))
                        .astype(jnp.int32))
        e_raw = jnp.sum((band_h < head_h).astype(jnp.int32))
        overflow = (e_raw > e_cap).astype(jnp.int32) * rvalid_i
        viol = viol + jnp.where(lanes1 == 0, overflow, 0)
        e = jnp.clip(e_raw, 0, e_cap) * rvalid_i
        base = e // 128
        ksh = e - base * 128
        sh_al = jax.lax.rem(128 - ksh, 128)
        lane_lo = lanes2 < 128 - ksh

        def realign(scr):
            a = scr[slot, pl.ds(base, 2), :]
            b = scr[slot, pl.ds(base + 1, 2), :]
            return jnp.where(lane_lo, pltpu.roll(a, sh_al, axis=1),
                             pltpu.roll(b, sh_al, axis=1))

        swin_h = realign(scr_h)                         # (2,128)
        swin_l = realign(scr_l)
        s0h, s1h = swin_h[0:1, :], swin_h[1:2, :]
        s0l, s1l = swin_l[0:1, :], swin_l[1:2, :]
        rh, rl = rh_i, rl_i

        acc = ((s0h == rh).astype(jnp.int32)
               * (s0l == rl).astype(jnp.int32))
        for sh in range(1, K + 1):
            roh = pltpu.roll(rh, sh, axis=1)
            rol = pltpu.roll(rl, sh, axis=1)
            acc = acc + (s0h == roh).astype(jnp.int32) \
                * (s0l == rol).astype(jnp.int32) \
                + (s1h == roh).astype(jnp.int32) \
                * (s1l == rol).astype(jnp.int32)
        for sh in range(128 - K, 128):
            roh = pltpu.roll(rh, sh, axis=1)
            rol = pltpu.roll(rl, sh, axis=1)
            acc = acc + (s0h == roh).astype(jnp.int32) \
                * (s0l == rol).astype(jnp.int32)
        cnt = cnt + acc

        rvalid = 1 - ((rh == jnp.int32(_SENT_HI)).astype(jnp.int32)
                      * (rl == jnp.int32(_R_SENT_LO)).astype(jnp.int32))
        # s[l+K+1] (two-plane shifted reads, row 0/1 select by lane)
        sel = lanes1 < 127 - K
        hi_h = jnp.where(sel, pltpu.roll(s0h, 127 - K, axis=1),
                         pltpu.roll(s1h, 127 - K, axis=1))
        hi_l = jnp.where(sel, pltpu.roll(s0l, 127 - K, axis=1),
                         pltpu.roll(s1l, 127 - K, axis=1))
        viol = viol + _le64(hi_h, hi_l, rh, rl) * rvalid
        lo_h = pltpu.roll(s0h, K + 1, axis=1)           # s[l-K-1]
        lo_l = pltpu.roll(s0l, K + 1, axis=1)
        v2 = (1 - _lt64(lo_h, lo_l, rh, rl)) * rvalid   # s >= r
        viol = viol + jnp.where(lanes1 >= K + 1, v2, 0)

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 128), 1)
    out_ref[...] += jnp.where((iota_r == k) & (iota_l == 0), jnp.sum(cnt), 0) \
        + jnp.where((iota_r == k) & (iota_l == 1), jnp.sum(viol), 0)


# Two key planes double the unrolled body's live temporaries: halve the
# rows*K budget of the 32-bit kernel (see buildprobe._diag_geometry).
_BUDGET64 = 512


@functools.partial(jax.jit, static_argnames=("side", "n_r", "n_s", "k_drift",
                                             "rows_per_group", "band_blocks"))
def diagonal_prepad64(sorted_hi: jnp.ndarray, sorted_lo: jnp.ndarray,
                      side: str, n_r: int, n_s: int,
                      k_drift: int = 16, rows_per_group: int = 32,
                      band_blocks: int | None = None):
    """Sentinel-pad ONE lex-sorted (hi, lo) side for paired diagonal
    probes — the 64-bit mirror of buildprobe.diagonal_prepad (pad each
    sorted run once; pass ``prepadded=(n_r, n_s)`` to the probe so pair
    probes trigger no padding copies)."""
    _, _, _, _, n_r_pad, n_s_pad = _diag_geometry(
        n_r, n_s, k_drift, rows_per_group, band_blocks, budget=_BUDGET64)
    if side == "r":
        assert sorted_hi.shape[0] == n_r
        pad = n_r_pad - n_r
        sent_lo = _R_SENT_LO
    else:
        assert side == "s" and sorted_hi.shape[0] == n_s
        pad = n_s_pad - n_s
        sent_lo = _S_SENT_LO
    return (jnp.concatenate(
                [sorted_hi, jnp.full((pad,), jnp.int32(_SENT_HI))]),
            jnp.concatenate(
                [sorted_lo, jnp.full((pad,), jnp.int32(sent_lo))]))


@functools.partial(jax.jit, static_argnames=("k_drift", "rows_per_group",
                                             "band_blocks", "interpret",
                                             "prepadded"))
def probe_count_diagonal64(r_hi, r_lo, s_hi, s_lo,
                           k_drift: int = 16,
                           rows_per_group: int = 32,
                           band_blocks: int | None = None,
                           interpret: bool | None = None,
                           prepadded: tuple[int, int] | None = None):
    """Diagonal rank-band count join over lex-sorted biased (hi, lo) pairs.

    Inputs come from ``jax.lax.sort((bias(hi), bias(lo)), num_keys=2)``.
    Returns (total_i32, ok); ok False -> escalate to join64_count.

    ``prepadded=(n_r, n_s)``: inputs already carry the sentinel padding
    from :func:`diagonal_prepad64` (same k_drift / rows_per_group /
    band_blocks); n_r/n_s are the true unpadded sizes.
    """
    if interpret is None:
        interpret = pallas_interpret()
    K = k_drift
    if prepadded is not None:
        n_r, n_s = prepadded
    else:
        n_r = r_hi.shape[0]
        n_s = s_hi.shape[0]
    gr, b8, gelems, n_groups8, n_r_pad, n_s_pad = _diag_geometry(
        n_r, n_s, K, rows_per_group, band_blocks, budget=_BUDGET64)

    rh, rl = r_hi, r_lo
    if prepadded is not None:
        assert rh.shape[0] == n_r_pad and s_hi.shape[0] == n_s_pad, \
            "prepadded shapes disagree with geometry (same params?)"
        sh_p, sl_p = s_hi, s_lo
    else:
        if n_r_pad != n_r:
            rh = jnp.concatenate(
                [rh, jnp.full((n_r_pad - n_r,), jnp.int32(_SENT_HI))])
            rl = jnp.concatenate(
                [rl, jnp.full((n_r_pad - n_r,), jnp.int32(_R_SENT_LO))])
        sh_p = jnp.concatenate(
            [s_hi, jnp.full((n_s_pad - n_s,), jnp.int32(_SENT_HI))])
        sl_p = jnp.concatenate(
            [s_lo, jnp.full((n_s_pad - n_s,), jnp.int32(_S_SENT_LO))])
    r2h = rh.reshape(-1, 128)
    r2l = rl.reshape(-1, 128)
    s2h = sh_p.reshape(-1, 128)
    s2l = sl_p.reshape(-1, 128)
    s_max_row = s2h.shape[0] - b8

    # Coarse band starts: one hi-plane search per GROUP over S row heads
    # (cf. probe_count_diagonal — the old per-R-row global searchsorted
    # went superlinear past ~100M).  Exact per-row hi-plane lower bounds
    # come from the in-kernel count over the loaded band.
    gheads_h = rh[::gelems]
    s_heads_h = sh_p[::128]   # sentinel heads sort last — harmless
    t0 = jnp.searchsorted(s_heads_h, gheads_h, side="left").astype(jnp.int32)
    wg = jnp.clip(t0 - 1, 0, s_max_row)
    e_cap = (b8 - 3) * 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups8,),
        in_specs=[
            pl.BlockSpec((gr, 128), lambda g, wg_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gr, 128), lambda g, wg_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((_ROWS, 128), lambda g, wg_: (g // _ROWS, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, b8, 128), jnp.int32),
            pltpu.VMEM((2, b8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    per_group = pl.pallas_call(
        functools.partial(_probe_diag64_kernel, K, b8, gr, e_cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups8, 128), jnp.int32),
        interpret=interpret,
    )(wg, r2h, r2l, s2h, s2l)
    matches = jnp.sum(per_group[:, 0])
    ok = jnp.sum(per_group[:, 1]) == 0
    return matches, ok


@functools.partial(jax.jit, static_argnames=("k_drift",))
def _join64_diag(r: Relation64, s: Relation64, k_drift: int = 16):
    rh, rl = jax.lax.sort((bias_keys(r.key_hi), bias_keys(r.key_lo)),
                          num_keys=2)
    sh_, sl_ = jax.lax.sort(
        (bias_keys(s.key_hi, None, 0xFFFFFFFF),
         bias_keys(s.key_lo, None, 0xFFFFFFFE)), num_keys=2)
    return probe_count_diagonal64(rh, rl, sh_, sl_, k_drift=k_drift)


def join64_count_fast(r: Relation64, s: Relation64,
                      k_drift: int = 16) -> int:
    """64-bit count join: diagonal fast path with escalation to the
    concat-sort join64_count on drift/band/degenerate-hi violations."""
    matches, ok = _join64_diag(r, s, k_drift)
    if bool(ok):
        return int(matches)
    return int(join64_count(r, s))


def join64_count_checked(r: Relation64, s: Relation64) -> int:
    return int(join64_count(r, s))


@jax.jit
def dense_rank_surrogates(rh, rl, rr, sh, sl, sr):
    """Joint dense-rank surrogates for 64-bit materialisation: rank-encode
    the (hi, lo) keys of BOTH sides into one join-consistent uint32
    surrogate (concat both sides, ONE 2-key sort, run-boundary cumsum —
    equal surrogates <=> equal 64-bit keys), then a second sort splits
    the sides back in surrogate order so the proven single-plane emit
    kernels run directly on the surrogates.  The reference reaches the
    same effect by carrying its 8 B compressed word through every kernel
    (data/data.hpp:47); the surrogate is narrower than the wire format.

    Inputs are uint32 planes + uint32 rids; pad rows must already carry
    the engine's 64-bit sentinels — R pad (FFFFFFFF, FFFFFFFF), S pad
    (FFFFFFFF, FFFFFFFE) — which map onto the standard 32-bit R/S pad
    surrogates (so downstream emit kernels see ordinary padding).
    Returns (rbk, rrs, sbk, srs): biased-int32 surrogate keys + int32
    rids, each side key-sorted.
    """
    from .buildprobe import bias_keys as _bias
    len_r = rh.shape[0]
    hi_c = jnp.concatenate([rh, sh])
    lo_c = jnp.concatenate([rl, sl])
    side = jnp.concatenate(
        [jnp.zeros((len_r,), jnp.int32),
         jnp.ones((sh.shape[0],), jnp.int32)])
    rid_c = jnp.concatenate([rr, sr]).astype(jnp.int32)
    bh, bl, bside, brid = jax.lax.sort(
        (_bias(hi_c), _bias(lo_c), side, rid_c),
        num_keys=2, is_stable=False)
    prev_h = jnp.concatenate([bh[:1] ^ 1, bh[:-1]])
    prev_l = jnp.concatenate([bl[:1] ^ 1, bl[:-1]])
    is_start = ((bh != prev_h) | (bl != prev_l)).at[0].set(True)
    gid = (jnp.cumsum(is_start.astype(jnp.int32)) - 1)
    sent_hi = jax.lax.bitcast_convert_type(
        jnp.uint32(0xFFFFFFFF) ^ jnp.uint32(0x80000000), jnp.int32)
    sent_lo_s = jax.lax.bitcast_convert_type(
        jnp.uint32(0xFFFFFFFE) ^ jnp.uint32(0x80000000), jnp.int32)
    is_rpad = (bh == sent_hi) & (bl == sent_hi)
    is_spad = (bh == sent_hi) & (bl == sent_lo_s)
    gkey = jnp.where(is_rpad, jnp.uint32(0xFFFFFFFF),
                     jnp.where(is_spad, jnp.uint32(0xFFFFFFFE),
                               gid.astype(jnp.uint32)))
    _, gk2, rid2 = jax.lax.sort((bside, gkey, brid), num_keys=2,
                                is_stable=False)
    return (_bias(gk2[:len_r]), rid2[:len_r],
            _bias(gk2[len_r:]), rid2[len_r:])
