"""In-HBM large-N count join — the north-star scale without the spill path.

The reference reaches its largest workloads by streaming tiles through the
GPU (operators/gpu/kernels_tile.cu, data/data.hpp:17-20 MAX_CHUNK_SIZE)
because its device memory is small.  A v5e chip has 16 GB HBM, and a count
join needs only the keys (4 B/tuple/side — rids never matter for counting,
engine/join.py mode="diagonal"), so even 1B x 1B fits ON the chip:

    live peak = sorted_R (4 GB) + S + sorted_S = 12 GB at the second sort.

This module phases the join explicitly — sort runs, pad runs, probe —
so Python-level liveness (not one fused jit's worst case) bounds peak
HBM.  Donation is requested throughout but this backend ignores it
(measured), hence the per-run callable sources: never materialise a
4 GB parent that a split would keep alive.  Two measured hard limits
shape everything here (BENCH_NOTES.md): XLA's flat u32 sort exhausts
HBM above 2^29 elements, and eager N-sized op chains OOM from Python
local liveness.  The out-of-core driver (engine/outofcore.py) remains
the path for relations that truly exceed HBM; this module replaces it
whenever the key arrays fit.
"""

from __future__ import annotations

import contextlib
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.buildprobe import (bias_keys, diagonal_prepad,
                              join_materialize_windowed,
                              probe_count_diagonal,
                              probe_count_merged_exact)
from ..ops.wide import (diagonal_prepad64, join64_count_keys_exact,
                        probe_count_diagonal64)


@functools.partial(jax.jit, donate_argnums=0)
def _sort_biased(keys: jnp.ndarray) -> jnp.ndarray:
    """uint32 keys -> sorted biased-int32 (the diagonal probe's input form).

    Donation lets the backend reuse the input buffer for a sort pass, which
    is what makes the 12 GB peak of 1B x 1B viable.  Unstable: stability
    is meaningless for a keys-only operand and costs 2x on this chip
    (measured at 2^29: 2.08 s stable vs 1.07 s unstable).
    """
    return jax.lax.sort(bias_keys(keys), is_stable=False)


def join_count_keys_inhbm(r_keys: jnp.ndarray, s_keys: jnp.ndarray,
                          k_drift: int = 16,
                          rows_per_group: int = 32):
    """Keys-only diagonal count join, phased for minimal HBM residency.

    Arguments are DONATED (consumed).  Returns (matches, ok) as device
    scalars; ``ok`` False means the rank-diagonal band overflowed (heavy
    skew or strongly unbalanced sides) — escalate to the out-of-core
    driver or a partitioned mode, exactly like join_count_checked.
    """
    rs = _sort_biased(r_keys)
    ss = _sort_biased(s_keys)
    return probe_count_diagonal(rs, ss, k_drift=k_drift,
                                rows_per_group=rows_per_group)


@functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
def _split_donate(keys: jnp.ndarray, runs: int):
    n = keys.shape[0] // runs
    return tuple(jax.lax.slice_in_dim(keys, i * n, (i + 1) * n)
                 for i in range(runs))


def join_count_keys_runs(r_keys, s_keys,
                         r_runs: int = 1, s_runs: int = 1,
                         k_drift: int = 16,
                         rows_per_group: int = 32,
                         sync=None,
                         n_r_total: int | None = None,
                         n_s_total: int | None = None,
                         meas=None,
                         ranged_domain: int | None = None,
                         blocked: bool = False):
    """Count join via sorted-RUN decomposition: XLA's sort OOMs beyond
    2^29 u32 elements on a 16 GB chip (measured: a solo 1B lax.sort
    exhausts HBM — its scratch is ~2x the operand), so each side is split
    into ``*_runs`` equal position-slices, each slice sorted separately,
    and every (R-run, S-run) pair probed with the rank-diagonal kernel.

    Position slices of a shuffled relation are themselves balanced random
    samples, so each pair probe sees locally balanced sides — the regime
    the diagonal probe wants.  Every (r, s) match lives in exactly one run
    pair: the sum of pair counts is exact.  Cost: sorts are the same total
    element count (slightly cheaper, smaller n); probe work scales with
    r_runs * s_runs — keep runs at the minimum that fits memory.

    ``r_keys``/``s_keys``: either a full key array (sliced on device —
    note the parent array stays live through the split: +4 GB at 1B,
    because this backend ignores buffer donation), or a callable
    ``fn(run, n_runs) -> keys`` that materialises one run's keys at a
    time (engine-side generators / host loaders) — the memory-lean form
    the 1B benchmark uses.  ``sync`` (optional callable) fences the
    device between phases so peak residency stays deterministic.

    ``ranged_domain``: declare the runs VALUE-RANGE-partitioned — run k of
    either side only holds keys in [k*D/runs, (k+1)*D/runs), D = the
    domain size.  Then matches exist only in diagonal pairs (k, k), so
    probe work drops from r_runs*s_runs pair probes to ``runs`` — the
    single-chip mirror of the reference's network-partition-then-local-
    process structure (tasks/NetworkPartitioning.cpp -> per-partition
    BuildProbe), with the partition pass moved into the data source (a
    generator emits partition-contiguous runs for free; a real loader
    would radix-bucket on the host, engine/outofcore.py).  The claim is
    VERIFIED on device: after sorting, each run's first/last element is
    checked against its range bounds — if any run violates, this falls
    back to the exact all-pairs decomposition (correctness never rests
    on the declaration).  Requires r_runs == s_runs.

    Returns (matches: int, ok: bool) — host-side exact accumulation (a
    device int32 total would cap at 2^31 matches).
    """
    if ranged_domain is not None:
        assert r_runs == s_runs, "ranged runs require equal run counts"
        assert callable(r_keys) and callable(s_keys), (
            "ranged mode re-generates runs on fallback; pass callables")
        got = _join_ranged_runs(r_keys, s_keys, r_runs, k_drift,
                                rows_per_group, sync or (lambda x: None),
                                n_r_total, n_s_total, meas, ranged_domain,
                                blocked)
        if got is not None:
            return got
        # range check tripped: fall through to the all-pairs decomposition
    if not callable(r_keys) and not callable(s_keys) \
            and r_runs == 1 and s_runs == 1:
        m, ok = join_count_keys_inhbm(r_keys, s_keys, k_drift,
                                      rows_per_group)
        return int(m), bool(ok)
    sync = sync or (lambda x: None)

    def total_of(keys, given):
        if callable(keys):
            assert given is not None, "pass n_*_total with callable sources"
            return given
        return keys.shape[0]

    n_r_total = total_of(r_keys, n_r_total)
    n_s_total = total_of(s_keys, n_s_total)
    # Divisibility must hold for callable sources too: a truncating split
    # would silently drop the remainder keys from the count.
    assert n_r_total % r_runs == 0 and n_s_total % s_runs == 0
    nr = n_r_total // r_runs
    ns = n_s_total // s_runs

    def run_parts(keys, runs):
        if callable(keys):
            return (keys(i, runs) for i in range(runs))
        assert keys.shape[0] % runs == 0
        return _split_donate(keys, runs)

    # Sort + sentinel-pad each run ONCE (diagonal_prepad) — the probe's
    # internal padding would otherwise copy both sides on EVERY pair
    # probe, and at 4x2GB resident that transient is what exhausts HBM.
    # All runs share one geometry: (nr, ns) are equal across runs.
    # Per-run sync keeps peak residency deterministic (buffers are
    # allocated at enqueue on this backend): each run's sort scratch
    # (~2x operand) is retired before the next run materialises.
    def _phase(name, tuples=0):
        if meas is None:
            return contextlib.nullcontext()
        return meas.phase(name, tuples=tuples)

    rs_runs = []
    with _phase("GEN_SORT_R", tuples=n_r_total):
        for part in run_parts(r_keys, r_runs):
            assert part.shape[0] == nr
            rp = diagonal_prepad(_sort_biased(part), "r", nr, ns,
                                 k_drift=k_drift,
                                 rows_per_group=rows_per_group)
            sync(rp)
            rs_runs.append(rp)
    ss_runs = []
    with _phase("GEN_SORT_S", tuples=n_s_total):
        for part in run_parts(s_keys, s_runs):
            assert part.shape[0] == ns
            sp = diagonal_prepad(_sort_biased(part), "s", nr, ns,
                                 k_drift=k_drift,
                                 rows_per_group=rows_per_group)
            sync(sp)
            ss_runs.append(sp)

    # Dispatch every pair probe before pulling any result: outputs are
    # tiny, inputs are already resident, and batching saves one relay
    # round-trip per pair.
    with _phase("PROBE", tuples=n_r_total + n_s_total):
        parts = [probe_count_diagonal(rs, ss, k_drift=k_drift,
                                      rows_per_group=rows_per_group,
                                      prepadded=(nr, ns), blocked=blocked)
                 for rs in rs_runs for ss in ss_runs]
        total = sum(int(m) for m, _ in parts)
        ok = all(bool(o) for _, o in parts)
    return total, ok


@functools.partial(jax.jit,
                   static_argnames=("n", "runs", "r_mult", "s_mult",
                                    "k_drift", "rows_per_group", "blocked"))
def _ranged_fused_all(n: int, runs: int, r_mult: int, s_mult: int,
                      k_drift: int, rows_per_group: int, blocked: bool):
    """The ENTIRE ranged-runs join as one XLA executable: a fori_loop over
    the ``runs`` diagonal pairs whose body generates, sorts, prepads and
    diagonal-probes one pair.  Returns (counts i32[runs], oks i32[runs]).

    Why this beats the per-pair dispatch loop (round-4 measurement,
    benchmarks/tpu_sort_scaling.py): XLA's flat sort costs 1.85 ns/elem at
    2^28 operands but an effective ~0.8 ns/elem at 2^22 INSIDE a fused
    step (the standalone small sort is dispatch-bound; fused, its working
    set is cache-resident and generation/bias fuse into the first pass) —
    so many small ranged pairs beat few large ones, provided per-pair
    dispatch cost is zero.  One executable = one relay round-trip total,
    scratch reuse across iterations by XLA, and per-run counts summed
    host-side in int64 (so no 2^31 wrap at any n).
    """
    nr = n // runs

    def body(k, carry):
        counts, oks = carry
        x = jnp.arange(0, nr, dtype=jnp.uint32)
        base = jnp.uint32(k) * jnp.uint32(nr)
        rk = ((x * jnp.uint32(r_mult)) & jnp.uint32(nr - 1)) + base
        sk = ((x * jnp.uint32(s_mult)) & jnp.uint32(nr - 1)) + base
        rs = jax.lax.sort(bias_keys(rk), is_stable=False)
        ss = jax.lax.sort(bias_keys(sk), is_stable=False)
        # on-device range verification (the ranged_domain contract):
        # sorted => ends are min/max; biased bounds computed from base.
        lo_b = jax.lax.bitcast_convert_type(
            base ^ jnp.uint32(0x80000000), jnp.int32)
        hi_b = jax.lax.bitcast_convert_type(
            (base + jnp.uint32(nr - 1)) ^ jnp.uint32(0x80000000), jnp.int32)
        in_range = ((rs[0] >= lo_b) & (rs[nr - 1] <= hi_b)
                    & (ss[0] >= lo_b) & (ss[nr - 1] <= hi_b))
        rp = diagonal_prepad(rs, "r", nr, nr, k_drift=k_drift,
                             rows_per_group=rows_per_group)
        sp = diagonal_prepad(ss, "s", nr, nr, k_drift=k_drift,
                             rows_per_group=rows_per_group)
        m, okp = probe_count_diagonal(rp, sp, k_drift=k_drift,
                                      rows_per_group=rows_per_group,
                                      prepadded=(nr, nr), blocked=blocked)
        ok_k = (okp & in_range).astype(jnp.int32)
        return (jax.lax.dynamic_update_index_in_dim(counts, m, k, 0),
                jax.lax.dynamic_update_index_in_dim(oks, ok_k, k, 0))

    return jax.lax.fori_loop(
        0, runs, body,
        (jnp.zeros((runs,), jnp.int32), jnp.zeros((runs,), jnp.int32)))


@functools.partial(jax.jit,
                   static_argnames=("runs", "domain", "k_drift",
                                    "rows_per_group", "blocked"))
def _ranged_fused_arrays(r_keys, s_keys, runs: int, domain: int,
                         k_drift: int, rows_per_group: int, blocked: bool):
    """Array-input form of :func:`_ranged_fused_all`: both sides are
    RESIDENT uint32 key arrays already value-range-partitioned into
    ``runs`` equal position-slices (run k = keys in [k*domain/runs,
    (k+1)*domain/runs), e.g. host-sorted out-of-core buckets after H2D,
    or data that arrived partition-contiguous through the shuffle).  The
    loop slices run pairs with dynamic_slice — no per-pair dispatch, one
    executable, range claims verified per run on device."""
    nr = r_keys.shape[0] // runs
    ns = s_keys.shape[0] // runs
    span = domain // runs

    def body(k, carry):
        counts, oks = carry
        rk = jax.lax.dynamic_slice_in_dim(r_keys, k * nr, nr)
        sk = jax.lax.dynamic_slice_in_dim(s_keys, k * ns, ns)
        rs = jax.lax.sort(bias_keys(rk), is_stable=False)
        ss = jax.lax.sort(bias_keys(sk), is_stable=False)
        base = jnp.uint32(k) * jnp.uint32(span)
        lo_b = jax.lax.bitcast_convert_type(
            base ^ jnp.uint32(0x80000000), jnp.int32)
        hi_b = jax.lax.bitcast_convert_type(
            (base + jnp.uint32(span - 1)) ^ jnp.uint32(0x80000000),
            jnp.int32)
        in_range = ((rs[0] >= lo_b) & (rs[nr - 1] <= hi_b)
                    & (ss[0] >= lo_b) & (ss[ns - 1] <= hi_b))
        rp = diagonal_prepad(rs, "r", nr, ns, k_drift=k_drift,
                             rows_per_group=rows_per_group)
        sp = diagonal_prepad(ss, "s", nr, ns, k_drift=k_drift,
                             rows_per_group=rows_per_group)
        m, okp = probe_count_diagonal(rp, sp, k_drift=k_drift,
                                      rows_per_group=rows_per_group,
                                      prepadded=(nr, ns), blocked=blocked)
        ok_k = (okp & in_range).astype(jnp.int32)
        return (jax.lax.dynamic_update_index_in_dim(counts, m, k, 0),
                jax.lax.dynamic_update_index_in_dim(oks, ok_k, k, 0))

    return jax.lax.fori_loop(
        0, runs, body,
        (jnp.zeros((runs,), jnp.int32), jnp.zeros((runs,), jnp.int32)))


def join_count_keys_ranged_fused_arrays(r_keys, s_keys, runs: int,
                                        domain: int, k_drift: int = 8,
                                        rows_per_group: int = 64,
                                        blocked: bool = True):
    """Fused ranged join over resident range-partitioned key ARRAYS (see
    :func:`_ranged_fused_arrays`).  Returns (matches: int, ok: bool);
    ok=False (range/coverage trip on any run) -> escalate, e.g. via
    :func:`join_count_keys_runs` or a skew-aware path."""
    assert r_keys.shape[0] % runs == 0 and s_keys.shape[0] % runs == 0
    assert domain % runs == 0
    counts, oks = _ranged_fused_arrays(r_keys, s_keys, runs, domain,
                                       k_drift, rows_per_group, blocked)
    counts = np.asarray(jax.device_get(counts), dtype=np.int64)
    oks = np.asarray(jax.device_get(oks))
    return int(counts.sum()), bool((oks == 1).all())


def join_count_keys_ranged_fused_arrays_checked(r_keys, s_keys, runs: int,
                                                domain: int,
                                                k_drift: int = 8,
                                                rows_per_group: int = 64,
                                                blocked: bool = True):
    """Escalating form of :func:`join_count_keys_ranged_fused_arrays` —
    the fused path's rung on the engine ladder (cf. join_count_checked):
    a tripped diagonal coverage check (duplicate-heavy runs) escalates
    each diagonal run pair to the exact host-finished mergecount.  A
    violated RANGE claim is a caller contract bug (the data was declared
    range-partitioned) and raises instead of silently recomputing with
    the wrong pairing.

    Returns (matches: int, escalated: bool).
    """
    m, ok = join_count_keys_ranged_fused_arrays(
        r_keys, s_keys, runs, domain, k_drift, rows_per_group, blocked)
    if ok:
        return m, False
    nr = r_keys.shape[0] // runs
    ns = s_keys.shape[0] // runs
    span = domain // runs
    rng_ok = jax.jit(lambda a, lo, hi: (jnp.min(a) >= lo)
                     & (jnp.max(a) <= hi))
    for k in range(runs):
        lo = jnp.uint32(k * span)
        hi = jnp.uint32((k + 1) * span - 1)
        if not (bool(rng_ok(jax.lax.slice_in_dim(r_keys, k * nr,
                                                 (k + 1) * nr), lo, hi))
                and bool(rng_ok(jax.lax.slice_in_dim(s_keys, k * ns,
                                                     (k + 1) * ns),
                                lo, hi))):
            raise ValueError(
                f"run {k} violates the declared value-range partition — "
                "the ranged-fused contract does not hold for this data; "
                "use join_count_keys_runs / join_count_checked instead")
    total = 0
    for k in range(runs):
        total += probe_count_merged_exact(
            jax.lax.slice_in_dim(r_keys, k * nr, (k + 1) * nr),
            jax.lax.slice_in_dim(s_keys, k * ns, (k + 1) * ns))
    return total, True


def join_count_keys_ranged_fused(n: int, runs: int,
                                 r_mult: int, s_mult: int,
                                 k_drift: int = 8,
                                 rows_per_group: int = 32,
                                 blocked: bool = True):
    """Dense-unique self-validating ranged join (the bench workload:
    both sides enumerate [0, n) partition-contiguously via odd-multiplier
    bijections, reference Relation::fillUniqueValues main.cpp:94-98) run
    as ONE fused executable — see :func:`_ranged_fused_all`.

    Returns (matches: int, ok: bool); host-side int64 total.  On ok=False
    (a tripped coverage/range check) callers escalate exactly like
    join_count_keys_runs — e.g. retry with larger k_drift or fall back to
    the per-pair path.
    """
    assert n % runs == 0 and (n // runs) & ((n // runs) - 1) == 0
    counts, oks = _ranged_fused_all(n, runs, r_mult, s_mult,
                                    k_drift, rows_per_group, blocked)
    counts = np.asarray(jax.device_get(counts), dtype=np.int64)
    oks = np.asarray(jax.device_get(oks))
    return int(counts.sum()), bool((oks == 1).all())


@functools.partial(jax.jit,
                   static_argnames=("n", "runs", "mult", "k_drift",
                                    "rows_per_group"))
def prepare_ranged_fused(n: int, runs: int, mult: int,
                         k_drift: int = 8, rows_per_group: int = 32):
    """Build-side preparation for the fused steady state: every ranged
    run generated, sorted and sentinel-prepadded in ONE executable,
    stacked as int32[runs, nr_pad] (the 'prebuilt hash table' — the
    deployment shape where a dimension relation is joined repeatedly,
    cf. engine/join.prepare_build_side).  Returns (build2d, ok) where ok
    verifies every run's range claim."""
    nr = n // runs
    from ..ops.buildprobe import _diag_geometry
    *_, n_r_pad, _ = _diag_geometry(nr, nr, k_drift, rows_per_group, None)

    def body(k, carry):
        build, oks = carry
        x = jnp.arange(0, nr, dtype=jnp.uint32)
        base = jnp.uint32(k) * jnp.uint32(nr)
        keys = ((x * jnp.uint32(mult)) & jnp.uint32(nr - 1)) + base
        rs = jax.lax.sort(bias_keys(keys), is_stable=False)
        lo_b = jax.lax.bitcast_convert_type(
            base ^ jnp.uint32(0x80000000), jnp.int32)
        hi_b = jax.lax.bitcast_convert_type(
            (base + jnp.uint32(nr - 1)) ^ jnp.uint32(0x80000000), jnp.int32)
        in_range = ((rs[0] >= lo_b) & (rs[nr - 1] <= hi_b)).astype(jnp.int32)
        rp = diagonal_prepad(rs, "r", nr, nr, k_drift=k_drift,
                             rows_per_group=rows_per_group)
        return (jax.lax.dynamic_update_slice_in_dim(
                    build, rp[None, :], k, axis=0),
                jax.lax.dynamic_update_index_in_dim(oks, in_range, k, 0))

    build0 = jnp.zeros((runs, n_r_pad), jnp.int32)
    build, oks = jax.lax.fori_loop(
        0, runs, body, (build0, jnp.zeros((runs,), jnp.int32)))
    return build, jnp.all(oks == 1)


@functools.partial(jax.jit,
                   static_argnames=("n", "runs", "s_mult", "k_drift",
                                    "rows_per_group", "blocked"))
def _ranged_fused_steady(build2d, n: int, runs: int, s_mult: int,
                         k_drift: int, rows_per_group: int, blocked: bool):
    nr = n // runs

    def body(k, carry):
        counts, oks = carry
        x = jnp.arange(0, nr, dtype=jnp.uint32)
        base = jnp.uint32(k) * jnp.uint32(nr)
        sk = ((x * jnp.uint32(s_mult)) & jnp.uint32(nr - 1)) + base
        ss = jax.lax.sort(bias_keys(sk), is_stable=False)
        lo_b = jax.lax.bitcast_convert_type(
            base ^ jnp.uint32(0x80000000), jnp.int32)
        hi_b = jax.lax.bitcast_convert_type(
            (base + jnp.uint32(nr - 1)) ^ jnp.uint32(0x80000000), jnp.int32)
        in_range = (ss[0] >= lo_b) & (ss[nr - 1] <= hi_b)
        sp = diagonal_prepad(ss, "s", nr, nr, k_drift=k_drift,
                             rows_per_group=rows_per_group)
        rp = jax.lax.dynamic_index_in_dim(build2d, k, axis=0,
                                          keepdims=False)
        m, okp = probe_count_diagonal(rp, sp, k_drift=k_drift,
                                      rows_per_group=rows_per_group,
                                      prepadded=(nr, nr), blocked=blocked)
        ok_k = (okp & in_range).astype(jnp.int32)
        return (jax.lax.dynamic_update_index_in_dim(counts, m, k, 0),
                jax.lax.dynamic_update_index_in_dim(oks, ok_k, k, 0))

    return jax.lax.fori_loop(
        0, runs, body,
        (jnp.zeros((runs,), jnp.int32), jnp.zeros((runs,), jnp.int32)))


def join_count_keys_ranged_fused_steady(build2d, n: int, runs: int,
                                        s_mult: int, k_drift: int = 8,
                                        rows_per_group: int = 32,
                                        blocked: bool = True):
    """Steady-state fused join: probe a prepared build side
    (:func:`prepare_ranged_fused`) against freshly generated+sorted S
    runs, one executable per pass.  Returns (matches: int, ok: bool).

    The caller must pass the SAME (k_drift, rows_per_group) used by
    prepare_ranged_fused — the build rows' sentinel-pad geometry depends
    on both; the assert below turns a mismatch into a named error
    instead of an opaque shape failure deep in probe_count_diagonal."""
    from ..ops.buildprobe import _diag_geometry
    nr = n // runs
    *_, n_r_pad, _ = _diag_geometry(nr, nr, k_drift, rows_per_group, None)
    assert build2d.shape == (runs, n_r_pad), (
        f"build2d shape {build2d.shape} != ({runs}, {n_r_pad}): was "
        "prepare_ranged_fused called with the same (k_drift, "
        "rows_per_group)?")
    counts, oks = _ranged_fused_steady(build2d, n, runs, s_mult,
                                       k_drift, rows_per_group, blocked)
    counts = np.asarray(jax.device_get(counts), dtype=np.int64)
    oks = np.asarray(jax.device_get(oks))
    return int(counts.sum()), bool((oks == 1).all())


@functools.partial(jax.jit,
                   static_argnames=("n", "runs", "r_mult", "s_mult",
                                    "hi_shift", "k_drift", "rows_per_group"))
def _ranged_fused_all64(n: int, runs: int, r_mult: int, s_mult: int,
                        hi_shift: int, k_drift: int, rows_per_group: int):
    """64-bit mirror of :func:`_ranged_fused_all`: one executable looping
    over ranged run pairs of (hi, lo)-plane keys — per iteration a
    two-operand lex sort + diagonal64 probe (ops/wide.py).

    Workload (self-validating): v in [0, n) enumerated per run k by an
    odd-multiplier bijection over subrange k; key64(v) = (v >> hi_shift,
    v * LO64_MULT mod 2^32).  2^hi_shift consecutive v's share one hi
    word, so the probe's hi-plane window search sees duplicate runs and
    the lo-plane comparisons genuinely decide matches; both sides
    enumerate the same key set => matches == n.
    """
    nr = n // runs

    def body(k, carry):
        counts, oks = carry
        j = jnp.arange(0, nr, dtype=jnp.uint32)
        base = jnp.uint32(k) * jnp.uint32(nr)

        def keyplanes(mult):
            v = ((j * jnp.uint32(mult)) & jnp.uint32(nr - 1)) + base
            return v >> jnp.uint32(hi_shift), v * jnp.uint32(_LO64_MULT)

        rh, rl = keyplanes(r_mult)
        sh, sl = keyplanes(s_mult)
        rbh, rbl = jax.lax.sort((bias_keys(rh), bias_keys(rl)),
                                num_keys=2, is_stable=False)
        sbh, sbl = jax.lax.sort((bias_keys(sh), bias_keys(sl)),
                                num_keys=2, is_stable=False)
        lo_b = jax.lax.bitcast_convert_type(
            (base >> jnp.uint32(hi_shift)) ^ jnp.uint32(0x80000000),
            jnp.int32)
        hi_b = jax.lax.bitcast_convert_type(
            ((base + jnp.uint32(nr - 1)) >> jnp.uint32(hi_shift))
            ^ jnp.uint32(0x80000000), jnp.int32)
        in_range = ((rbh[0] >= lo_b) & (rbh[nr - 1] <= hi_b)
                    & (sbh[0] >= lo_b) & (sbh[nr - 1] <= hi_b))
        rp_h, rp_l = diagonal_prepad64(rbh, rbl, "r", nr, nr,
                                       k_drift=k_drift,
                                       rows_per_group=rows_per_group)
        sp_h, sp_l = diagonal_prepad64(sbh, sbl, "s", nr, nr,
                                       k_drift=k_drift,
                                       rows_per_group=rows_per_group)
        m, okp = probe_count_diagonal64(rp_h, rp_l, sp_h, sp_l,
                                        k_drift=k_drift,
                                        rows_per_group=rows_per_group,
                                        prepadded=(nr, nr))
        ok_k = (okp & in_range).astype(jnp.int32)
        return (jax.lax.dynamic_update_index_in_dim(counts, m, k, 0),
                jax.lax.dynamic_update_index_in_dim(oks, ok_k, k, 0))

    return jax.lax.fori_loop(
        0, runs, body,
        (jnp.zeros((runs,), jnp.int32), jnp.zeros((runs,), jnp.int32)))


def join64_count_keys_ranged_fused(n: int, runs: int,
                                   r_mult: int, s_mult: int,
                                   hi_shift: int = 3,
                                   k_drift: int = 16,
                                   rows_per_group: int = 32):
    """Fused 64-bit ranged join — see :func:`_ranged_fused_all64`.
    Returns (matches: int, ok: bool)."""
    assert n % runs == 0 and (n // runs) & ((n // runs) - 1) == 0
    counts, oks = _ranged_fused_all64(n, runs, r_mult, s_mult,
                                      hi_shift, k_drift, rows_per_group)
    counts = np.asarray(jax.device_get(counts), dtype=np.int64)
    oks = np.asarray(jax.device_get(oks))
    return int(counts.sum()), bool((oks == 1).all())


def _join_ranged_runs(r_source, s_source, runs, k_drift, rows_per_group,
                      sync, n_r_total, n_s_total, meas, domain,
                      blocked=False):
    """Diagonal-pairs-only probe over value-range-partitioned runs (see
    join_count_keys_runs ``ranged_domain``).  Returns (matches, ok), or
    None if any run's on-device range check fails — the caller then falls
    back to the exact all-pairs decomposition.

    Per-pair processing bounds residency to ~8 GB at the 1B scale (one
    side's sort scratch + both prepped runs), so no cross-pair sync
    choreography is needed; each pair's probe is synced inside its PROBE
    phase so per-phase attribution stays honest (the dispatch alone would
    bill the probe to the next pair's sort).
    """
    assert n_r_total is not None and n_s_total is not None, (
        "pass n_*_total with callable sources")
    assert n_r_total % runs == 0 and n_s_total % runs == 0
    assert domain % runs == 0, "domain must split evenly across runs"
    nr = n_r_total // runs
    ns = n_s_total // runs
    span = domain // runs

    def _phase(name, tuples=0):
        if meas is None:
            return contextlib.nullcontext()
        return meas.phase(name, tuples=tuples)

    def _detail(name, elements=0):
        # per-step counters (reference MEASUREMENT_DETAILS tier): one
        # "step" = one run's synced sort+pad or one pair's probe dispatch
        if meas is None:
            return contextlib.nullcontext()
        return meas.detail(name, elements=elements)

    def _bias_const(u):                   # biased-int32 image of a uint32
        return int(np.int32(np.uint32(u) ^ np.uint32(0x80000000)))

    def prep(source, k, side, n_side):
        sb = _sort_biased(source(k, runs))
        assert sb.shape[0] == n_side
        lo_b = _bias_const(k * span)
        hi_b = _bias_const((k + 1) * span - 1)
        # exact range check: sorted => min/max are the ends
        in_range = (sb[0] >= lo_b) & (sb[n_side - 1] <= hi_b)
        return diagonal_prepad(sb, side, nr, ns, k_drift=k_drift,
                               rows_per_group=rows_per_group), in_range

    pair = []
    for k in range(runs):
        # Both sides dispatched, ONE fence: at run sizes <= 2^28 the two
        # sorts' enqueue-time scratch coexists comfortably (~6 GB), and
        # every host sync is a full relay round-trip (~30-50 ms) —
        # 3 syncs/pair -> 2 was worth ~0.2 s at the 1B scale.
        with _phase("GEN_SORT", tuples=(n_r_total + n_s_total) // runs), \
                _detail("RUN_GEN_SORT", elements=nr + ns):
            rp, rin = prep(r_source, k, "r", nr)
            if max(nr, ns) > (1 << 28):
                sync(rp)     # 2^29 runs: don't let two sort scratches
                             # coexist (~12 GB enqueue-time peak)
            sp, sin = prep(s_source, k, "s", ns)
            sync(sp)
        with _phase("PROBE", tuples=nr + ns), \
                _detail("PAIR_PROBE_DISPATCH", elements=nr + ns):
            m, okp = probe_count_diagonal(rp, sp, k_drift=k_drift,
                                          rows_per_group=rows_per_group,
                                          prepadded=(nr, ns),
                                          blocked=blocked)
        pair.append((m, okp, rin, sin))
        # No sync on the probe: its outputs are scalars and its inputs
        # (this pair's prepped runs, ~2.2 GB) stay live only until it
        # executes.  Deferring the pull (a) saves a 30-50 ms relay
        # round-trip per pair and (b) lets the probe execute while the
        # host dispatches pair k+1's generation+sort.  Peak enqueue-time
        # residency adds one probed pair to the two sort scratches:
        # ~9 GB at the 1B scale — measured safe.  The final int()/bool()
        # pulls below drain every pair.

    with _phase("PROBE_DRAIN"):
        pair = [(int(m), bool(okp), bool(rin), bool(sin))
                for m, okp, rin, sin in pair]
    if not all(rin and sin for _, _, rin, sin in pair):
        return None                       # declaration false: all-pairs
    total = sum(m for m, _, _, _ in pair)
    ok = all(okp for _, okp, _, _ in pair)
    return total, ok


# ---------------------------------------------------------------------------
# Materialising join at large N — (r_rid, s_rid) row production, the
# reference's output-claiming probe (operators/gpu/kernels.cu:199-246,
# output positions via atomicAdd :236-243) at north-star scale.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _sort_key_rid(keys: jnp.ndarray, rids: jnp.ndarray):
    """(uint32 keys, uint32 rids) -> key-sorted (biased-int32 keys, int32
    rids).  One 2-operand sort — the same HBM-scratch wall as the 64-bit
    path: caps at 2^28 elements on a 16 GB chip, hence the runs wrapper
    below for larger sides.  Unstable: ties permute rids arbitrarily,
    which join semantics don't observe."""
    return jax.lax.sort((bias_keys(keys), rids.astype(jnp.int32)),
                        num_keys=1, is_stable=False)


def join_rows_keys_inhbm(r_keys, r_rids, s_keys, s_rids,
                         window_rows: int = 4, rows_per_group: int = 32):
    """Materialising equi-join of one run pair, phased for large N.

    All four arguments are DONATED device arrays.  Returns
    ``(r_rid_sorted, s_rid, cnt, win_ok, multi)`` — a DENSE output aligned
    to sorted-R order: element i of the sorted R run matched ``cnt[i]`` S
    rows, and where cnt == 1 its partner's rid is ``s_rid[i]`` (the row
    pair is ``(r_rid_sorted[i], s_rid[i])``).  This dense form is the
    TPU-native replacement for the reference probe's atomicAdd output
    claiming (kernels.cu:236-243): no scatter, no static output bound, no
    output-order nondeterminism.

    ``win_ok`` False: some row's S window overflowed — retry with a larger
    ``window_rows``.  ``multi`` True: some element matched >1 S row; counts
    stay exact but that element's s_rid is a rid-sum (consumers needing
    every pair under multi-match use join_materialize /
    join_materialize_windowed_multi at partition scale).
    """
    rbk, rrs = _sort_key_rid(r_keys, r_rids)
    sbk, srs = _sort_key_rid(s_keys, s_rids)
    out_srid, cnt, win_ok, multi = join_materialize_windowed(
        rbk, sbk, srs, window_rows=window_rows,
        rows_per_group=rows_per_group)
    return rrs, out_srid, cnt, win_ok, multi


def join_rows_keys_ranged_runs(r_source, s_source, runs: int,
                               n_r_total: int, n_s_total: int,
                               domain: int, consume,
                               window_rows: int = 4,
                               rows_per_group: int = 32,
                               sync=None,
                               emit: str | None = None,
                               k_drift: int = 8):
    """Materialising join via value-range-partitioned (key, rid) runs —
    the row-producing sibling of ``join_count_keys_runs(ranged_domain=)``
    for sides beyond the 2^28 2-operand sort cap.

    ``r_source``/``s_source``: ``fn(run, n_runs) -> (keys, rids)`` whose
    run k holds only keys in [k*domain/runs, (k+1)*domain/runs) — verified
    on device after each sort.  Every pair's dense output is handed to
    ``consume(k, r_rid_sorted, s_rid, cnt)`` while still on device, so
    peak HBM holds one pair's working set regardless of total output size
    (the caller samples/checksums/streams as it pleases; a full host pull
    of 1B rows is relay-bandwidth-bound here, not engine-bound).

    ``emit``: "diagonal" (prep-free diagonal emit kernel — no window-prep
    sorts; needs balanced pair sides) or "windowed"; default (None)
    auto-selects diagonal when the run sizes match AND retries any pair
    whose diagonal coverage tripped through the windowed kernel (exact
    per-row offsets — robust to rank drift the +-K band can't absorb),
    so auto mode is never weaker than the windowed path.  An explicit
    emit="diagonal" skips the retry and reports the trip in ``ok``.

    Returns (total_rows: int, ok: bool).  ok False when a range check or
    window/multi flag tripped — counts may be partial; escalate to the
    counting paths or partition-scale materialisation.
    """
    from ..ops.buildprobe import join_materialize_diagonal
    sync = sync or (lambda x: None)
    assert n_r_total % runs == 0 and n_s_total % runs == 0
    assert domain % runs == 0
    nr = n_r_total // runs
    ns = n_s_total // runs
    span = domain // runs
    auto = emit is None
    if emit is None:
        emit = "diagonal" if nr == ns else "windowed"
    assert emit in ("diagonal", "windowed"), emit

    def _bias_const(u):
        return int(np.int32(np.uint32(u) ^ np.uint32(0x80000000)))

    total = 0
    ok = True
    for k in range(runs):
        lo_b = _bias_const(k * span)
        hi_b = _bias_const((k + 1) * span - 1)
        rk, rr = r_source(k, runs)
        rbk, rrs = _sort_key_rid(rk, rr)
        rin = (rbk[0] >= lo_b) & (rbk[nr - 1] <= hi_b)
        sync(rbk)
        sk, sr = s_source(k, runs)
        sbk, srs = _sort_key_rid(sk, sr)
        sin = (sbk[0] >= lo_b) & (sbk[ns - 1] <= hi_b)
        sync(sbk)
        if emit == "diagonal":
            out_srid, cnt, win_ok, multi = join_materialize_diagonal(
                rbk, sbk, srs, k_drift=k_drift,
                rows_per_group=rows_per_group)
            if auto and not bool(win_ok):
                # rank drift beyond +-K on this pair (coverage trip) —
                # the windowed kernel's exact per-row offsets absorb any
                # drift, so auto mode retries rather than reporting a
                # capability regression vs the pre-diagonal default
                out_srid, cnt, win_ok, multi = join_materialize_windowed(
                    rbk, sbk, srs, window_rows=window_rows,
                    rows_per_group=rows_per_group)
        else:
            out_srid, cnt, win_ok, multi = join_materialize_windowed(
                rbk, sbk, srs, window_rows=window_rows,
                rows_per_group=rows_per_group)
        pair_rows = jnp.sum(cnt)
        sync(pair_rows)
        ok = ok and bool(rin) and bool(sin) and bool(win_ok) \
            and not bool(multi)
        consume(k, rrs, out_srid, cnt)
        total += int(pair_rows)
    return total, ok


class HeavyRowCollector:
    """Host-side accumulator for the heavy-row side channel of
    :func:`join_rows_keys_skew_runs`: per heavy key, the R-rid and S-rid
    lists whose cross product IS that key's join-row block (reference
    probe_skew writes each pair explicitly, kernels_optimized.cu:440-449;
    the block form carries the same information at O(rows) cost)."""

    def __init__(self, hh_keys, hh_valid):
        self.keys = np.asarray(jax.device_get(hh_keys))
        self.valid = np.asarray(jax.device_get(hh_valid))
        self._r = {}
        self._s = {}

    def add(self, side: str, hix, rids, cnt: int):
        ix = np.asarray(jax.device_get(hix))[:cnt]
        rid = np.asarray(jax.device_get(rids))[:cnt]
        store = self._r if side == "r" else self._s
        for i in np.unique(ix):
            store.setdefault(int(i), []).append(rid[ix == i])

    def blocks(self) -> dict:
        """{key: (r_rids, s_rids)} over keys seen on either side."""
        out = {}
        for i in set(self._r) | set(self._s):
            if not self.valid[i]:
                continue
            out[int(self.keys[i])] = (
                np.concatenate(self._r.get(i, [np.empty(0, np.uint32)])),
                np.concatenate(self._s.get(i, [np.empty(0, np.uint32)])))
        return out

    def total_rows(self) -> int:
        return sum(len(r) * len(s) for r, s in self.blocks().values())


@functools.partial(jax.jit, donate_argnums=(0, 1),
                   static_argnames=("side_sentinel_heavy",))
def _skewrows_split(keys, rids, hk, hv, side_sentinel_heavy: int):
    """One [K, N] compare pass -> (light key-sorted biased keys + rids,
    heavy (candidate_index, rid) compaction, heavy count).  Heavy rows'
    light keys become the side sentinel (sort to the tail, match
    nothing); the compaction is a sort by candidate index — no gathers."""
    eq = (keys[None, :] == hk[:, None]) & hv[:, None]
    m = jnp.any(eq, axis=0)
    hix = jnp.where(m, jnp.argmax(eq, axis=0).astype(jnp.int32),
                    jnp.int32(0x7FFFFFFF))
    hcnt = jnp.sum(m.astype(jnp.int32))
    six, hrid = jax.lax.sort((hix, rids), num_keys=1, is_stable=False)
    lk = jnp.where(m, jnp.uint32(side_sentinel_heavy), keys)
    lbk, lrid = jax.lax.sort((bias_keys(lk), rids.astype(jnp.int32)),
                             num_keys=1, is_stable=False)
    return lbk, lrid, six, hrid, hcnt


def join_rows_keys_skew_runs(r_source, s_source, runs: int,
                             n_r_total: int, n_s_total: int,
                             domain: int, consume,
                             collector_out: list | None = None,
                             max_matches: int = 4,
                             max_heavy_per_run: int = 64,
                             prng_seed: int = 0,
                             window_rows: int = 4,
                             rows_per_group: int = 32,
                             sync=None):
    """Skew-aware MATERIALISING ranged-runs join (round 5, VERDICT r4
    item 3 / missing #1): heavy-key rows emitted as closed-form blocks,
    light rows through the M-plane emit kernel.

    Sources are ``fn(run, n_runs) -> (keys, rids)`` with run k's keys in
    [k*domain/runs, (k+1)*domain/runs) (the join_rows_keys_ranged_runs
    contract).  Per run:

      1. heavy rows (sampled detection, union over 2 runs/side) are
         COMPACTED per side as (candidate_index, rid) lists — their join
         rows are per-key cross products, never probed (reference
         probe_skew, kernels_optimized.cu:364-457, as closed-form
         blocks); streamed into a :class:`HeavyRowCollector` appended to
         ``collector_out`` (if given),
      2. light rows run the M-plane windowed emit: up to ``max_matches``
         S rids per sorted-R element — mid-tail duplicate keys under
         Zipf make cnt > 1 common, which the dense single-plane form
         cannot express; ``consume(k, r_rid_sorted, rid_planes, cnt)``
         receives each pair's output on device.

    Returns (total_rows, ok): total includes heavy block products
    (host int64).  ok False when a window overflowed, some light row
    matched more than ``max_matches`` S rows (raise max_matches or
    max_heavy_per_run so such keys detect as heavy), or a range claim
    failed.  Counts in cnt stay exact even when ok is False.
    """
    from ..ops import skew as skew_ops
    from ..ops.buildprobe import join_materialize_windowed_multi
    sync = sync or (lambda x: None)
    assert n_r_total % runs == 0 and n_s_total % runs == 0
    assert domain % runs == 0
    nr = n_r_total // runs
    ns = n_s_total // runs
    span = domain // runs

    # ---- detection (keys only; 2 iid runs per side, cf. skew_hashed) ----
    hks, hvs = [], []
    base = jax.random.key(prng_seed)
    fold = 0
    for src in (r_source, s_source):
        for i in range(min(runs, 2)):
            k = src(i, runs)[0]
            fold += 1
            win = 1 << 16
            if k.shape[0] > win:
                off = ((i * 2654435761) % (k.shape[0] - win)) & ~127
                k = jax.lax.slice_in_dim(k, off, off + win)
            hh_i = skew_ops.detect_heavy_keys(
                k, jax.random.fold_in(base, fold), max_heavy_per_run)
            hks.append(hh_i.keys)
            hvs.append(hh_i.valid)
    hh = skew_ops.dedup_heavy(skew_ops.HeavyHitters(
        jnp.concatenate(hks), jnp.concatenate(hvs)))
    sync(hh.keys)
    collector = HeavyRowCollector(hh.keys, hh.valid)
    if collector_out is not None:
        collector_out.append(collector)

    def _bias_const(u):
        return int(np.int32(np.uint32(u) ^ np.uint32(0x80000000)))

    gr = rows_per_group
    from ..utils.backend import pallas_interpret
    if pallas_interpret():
        gr = 8

    total_light = 0
    ok = True
    for k in range(runs):
        lo_b = _bias_const(k * span)
        hi_b = _bias_const((k + 1) * span - 1)

        def prep(source, n_side, sent):
            keys, rids = source(k, runs)
            lbk, lrid, six, hrid, hcnt = _skewrows_split(
                keys, rids, hh.keys, hh.valid, side_sentinel_heavy=sent)
            sync(lbk)
            n_real = n_side - hcnt
            in_rng = jnp.where(
                n_real > 0,
                (lbk[0] >= lo_b)
                & (jnp.max(jnp.where(
                    jnp.arange(n_side) < n_real, lbk, lo_b)) <= hi_b),
                True)
            return lbk, lrid, six, hrid, int(hcnt), in_rng

        rbk, rrs, r_six, r_hrid, r_hcnt, rin = prep(r_source, nr,
                                                    0xFFFFFFFF)
        sbk, srs, s_six, s_hrid, s_hcnt, sin = prep(s_source, ns,
                                                    0xFFFFFFFE)
        collector.add("r", r_six, r_hrid, r_hcnt)
        collector.add("s", s_six, s_hrid, s_hcnt)

        rid_planes, cnt, win_ok, overflow = join_materialize_windowed_multi(
            rbk, sbk, srs, max_matches=max_matches,
            window_rows=window_rows, rows_per_group=gr)
        pair_rows = jnp.sum(cnt)
        sync(pair_rows)
        ok = ok and bool(rin) and bool(sin) and bool(win_ok) \
            and not bool(overflow)
        consume(k, rrs, rid_planes, cnt)
        total_light += int(pair_rows)
    return total_light + collector.total_rows(), ok


def gen_unique_tuples_ranged_run(n: int, odd_mult: int):
    """``fn(run, n_runs) -> (keys, rids)``: the (key, rid) form of
    :func:`gen_unique_keys_ranged_run` — run k is a bijection over key
    subrange k with rids equal to the global row index (row t of the
    conceptual relation has key ((t % nr) * odd mod nr) + (t // nr) * nr,
    host-verifiable per emitted row)."""
    assert n & (n - 1) == 0 and odd_mult & 1

    def source(run: int, n_runs: int):
        nr = n // n_runs
        keys = _gen_span_offset(nr, odd_mult, run * nr)
        rids = jnp.arange(run * nr, (run + 1) * nr, dtype=jnp.uint32)
        return keys, rids

    return source


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _sort_biased64(hi: jnp.ndarray, lo: jnp.ndarray):
    """uint32 (hi, lo) planes -> lex-sorted biased-int32 planes (the
    diagonal64 probe's input form).  Stability is meaningless when every
    operand is a key, and unstable sorts are measurably cheaper."""
    return jax.lax.sort((bias_keys(hi), bias_keys(lo)), num_keys=2,
                        is_stable=False)


def join64_count_keys_runs(r_source, s_source,
                           r_runs: int, s_runs: int,
                           n_r_total: int, n_s_total: int,
                           k_drift: int = 64,
                           rows_per_group: int = 32,
                           sync=None):
    """64-bit-key count join via sorted-run decomposition — the wide-key
    mirror of :func:`join_count_keys_runs` (reference keys are uint64,
    data/Tuple.h:15-22; the 32-bit fast path covers only 4G domains).

    Keys are (hi, lo) uint32 planes (8 B/tuple/side), so the two-operand
    sort hits XLA's HBM scratch wall at HALF the 32-bit element count:
    runs keep each per-run sort inside it.  Sources are callables
    ``fn(run, n_runs) -> (hi, lo)`` materialising one run at a time.

    Every pair is probed with the two-plane diagonal kernel
    (ops/wide.py); pairs whose rank-drift/coverage check trips are
    recomputed exactly with the keys-only concat-sort mergecount on the
    already-sorted biased planes (bias preserves order and equality, and
    the R/S padding sentinels differ in their lo word so pads can never
    cross-match — they are sliced off anyway).

    Returns (matches: int, ok: bool); ok False only if escalation itself
    could not run (never, currently — kept for signature parity).
    """
    sync = sync or (lambda x: None)
    assert n_r_total % r_runs == 0 and n_s_total % s_runs == 0
    nr = n_r_total // r_runs
    ns = n_s_total // s_runs

    def prep(source, runs, side, n_side):
        out = []
        for i in range(runs):
            hi, lo = source(i, runs)
            assert hi.shape[0] == n_side
            bh, bl = _sort_biased64(hi, lo)
            ph, plo = diagonal_prepad64(bh, bl, side, nr, ns,
                                        k_drift=k_drift,
                                        rows_per_group=rows_per_group)
            sync(ph)
            out.append((ph, plo))
        return out

    rs_runs = prep(r_source, r_runs, "r", nr)
    ss_runs = prep(s_source, s_runs, "s", ns)

    pairs = [(rp, sp) for rp in rs_runs for sp in ss_runs]
    parts = [probe_count_diagonal64(rh, rl, sh, sl, k_drift=k_drift,
                                    rows_per_group=rows_per_group,
                                    prepadded=(nr, ns))
             for (rh, rl), (sh, sl) in pairs]
    total = 0
    for ((rh, rl), (sh, sl)), (m, okp) in zip(pairs, parts):
        if bool(okp):
            total += int(m)
            continue
        # Escalate this pair: slice off the sentinel padding, mergecount
        # the biased planes (exact under arbitrary skew / degenerate hi;
        # host-finished 64-bit reduction, so a pair with >2^31 matches
        # cannot wrap — the rung that justifies ok=True below).
        total += join64_count_keys_exact(
            jax.lax.slice_in_dim(rh, 0, nr), jax.lax.slice_in_dim(rl, 0, nr),
            jax.lax.slice_in_dim(sh, 0, ns), jax.lax.slice_in_dim(sl, 0, ns))
    return total, True


def join64_rows_keys_ranged_runs(r_source, s_source, runs: int,
                                 n_r_total: int, n_s_total: int, consume,
                                 window_rows: int = 4,
                                 rows_per_group: int = 32,
                                 k_drift: int = 8,
                                 emit: str | None = None,
                                 sync=None):
    """MATERIALISING 64-bit join via hi-plane-range-partitioned runs —
    the wide-key mirror of :func:`join_rows_keys_ranged_runs` (reference
    probes emit pairs over uint64 keys end-to-end, kernels.cu:199-246 /
    data/Tuple.h:15-22).

    ``r_source``/``s_source``: ``fn(run, n_runs) -> (hi, lo, rid)``
    uint32 planes whose run k holds only hi words in
    [k*2^32/runs, (k+1)*2^32/runs) — verified on device per run (min/max
    of the hi plane; no pre-sort is needed because the surrogate
    construction sorts jointly anyway).  Each diagonal pair rank-encodes
    both sides' (hi, lo) keys into join-consistent uint32 surrogates
    (ops/wide.dense_rank_surrogates — the 64-bit distributed dense
    rung's construction) and runs the proven single-plane emit kernels
    on the surrogates: diagonal by default (surrogate ranks of matched
    unique keys sit ON the diagonal), with the windowed retry on a
    coverage trip exactly like the 32-bit wrapper.  Dense per-pair
    output -> ``consume(k, r_rid_sorted, s_rid, cnt)`` on device.

    Returns (total_rows: int, ok: bool); ok False when a range check or
    an emit flag tripped (after the windowed retry in auto mode).
    """
    from ..ops.buildprobe import (join_materialize_diagonal,
                                  join_materialize_windowed)
    from ..ops.wide import dense_rank_surrogates
    sync = sync or (lambda x: None)
    assert n_r_total % runs == 0 and n_s_total % runs == 0
    nr = n_r_total // runs
    ns = n_s_total // runs
    span = (1 << 32) // runs
    auto = emit is None
    if emit is None:
        emit = "diagonal" if nr == ns else "windowed"
    assert emit in ("diagonal", "windowed"), emit

    total = 0
    ok = True
    for k in range(runs):
        rh, rl, rr = r_source(k, runs)
        sh, sl, sr = s_source(k, runs)
        rin = ((jnp.min(rh) >= jnp.uint32(k * span))
               & (jnp.max(rh) <= jnp.uint32((k + 1) * span - 1)))
        sin = ((jnp.min(sh) >= jnp.uint32(k * span))
               & (jnp.max(sh) <= jnp.uint32((k + 1) * span - 1)))
        rbk, rrs, sbk, srs = dense_rank_surrogates(rh, rl, rr, sh, sl, sr)
        sync(rbk)
        if emit == "diagonal":
            out_srid, cnt, win_ok, multi = join_materialize_diagonal(
                rbk, sbk, srs, k_drift=k_drift,
                rows_per_group=rows_per_group)
            if auto and not bool(win_ok):
                out_srid, cnt, win_ok, multi = join_materialize_windowed(
                    rbk, sbk, srs, window_rows=window_rows,
                    rows_per_group=rows_per_group)
        else:
            out_srid, cnt, win_ok, multi = join_materialize_windowed(
                rbk, sbk, srs, window_rows=window_rows,
                rows_per_group=rows_per_group)
        pair_rows = jnp.sum(cnt)
        sync(pair_rows)
        ok = ok and bool(rin) and bool(sin) and bool(win_ok) \
            and not bool(multi)
        consume(k, rrs, out_srid, cnt)
        total += int(pair_rows)
    return total, ok


_RELABEL_MULT = 0x9E3779B1            # odd: equality-preserving bijection
_RELABEL_INV = pow(_RELABEL_MULT, -1, 1 << 32)
# raw keys whose relabeled image collides with the two padding sentinels —
# always routed through the exact heavy-key machinery so the light domain
# never contains 0xFFFFFFFF/0xFFFFFFFE after relabeling
_SENT_PREIMAGES = ((0xFFFFFFFF * _RELABEL_INV) % (1 << 32),
                   (0xFFFFFFFE * _RELABEL_INV) % (1 << 32))


# --- module-level jitted helpers of join_count_keys_skew_hashed ---------
# These were originally closures defined inside the join function; a
# fresh function object per call meant a full retrace + relay
# compile-cache round-trip EVERY REP — measured as ~25-30 s/rep of
# "unattributed" time at the 1B scale (logs/r5_skewattr30.log: _ranges_all
# alone compiles in 26 s but runs warm in 10 s).  Module scope makes the
# jit cache hit across reps.


@functools.partial(jax.jit, donate_argnums=0, static_argnames=("sentinel",))
def _skh_relabel_sort_count(keys, hk, hv, sentinel: int):
    """One [K, N] compare pass feeding exact heavy counts AND the relabel
    mask, then the run sort (heavy rows -> sentinel, sorted to the tail)."""
    eq = (keys[None, :] == hk[:, None]) & hv[:, None]
    hcnt = jnp.sum(eq, axis=1, dtype=jnp.int32)
    m = jnp.any(eq, axis=0)
    rel = keys * jnp.uint32(_RELABEL_MULT)
    return jax.lax.sort(jnp.where(m, jnp.uint32(sentinel), rel),
                        is_stable=False), hcnt


@functools.partial(jax.jit, static_argnames=("n_ranges",))
def _skh_bounds_of(sorted_run, n_ranges: int):
    span = (1 << 32) // n_ranges
    bounds_vals = jnp.asarray(
        np.minimum(np.arange(n_ranges + 1, dtype=np.int64) * span,
                   0xFFFFFFFE).astype(np.uint32))
    return jnp.searchsorted(sorted_run, bounds_vals).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("n_ranges", "cap_r", "cap_s"))
def _skh_ranges_all(r_sorted, r_bounds, s_sorted, s_bounds,
                    n_ranges: int, cap_r: int, cap_s: int):
    """Per-range slice assembly + mergecount partials, one executable
    (fori_loop over ranges; each run's range-rg contribution is a
    CONTIGUOUS dynamic-slice of its sorted array — no gathers)."""
    from ..ops.buildprobe import _merged_partials, _PARTIAL_BLOCK
    concat = len(r_sorted) * cap_r + len(s_sorted) * cap_s
    nb = -(-concat // _PARTIAL_BLOCK)

    def body(rg, carry):
        lo_a, hi_a, oks = carry

        def side_concat(sorted_runs, bounds, cap, sentinel):
            slot = jnp.arange(cap, dtype=jnp.int32)
            parts = []
            ok = jnp.bool_(True)
            for run, arr in enumerate(sorted_runs):
                start = jax.lax.dynamic_index_in_dim(
                    bounds[run], rg, 0, keepdims=False)
                end = jax.lax.dynamic_index_in_dim(
                    bounds[run], rg + 1, 0, keepdims=False)
                size = end - start
                ok = ok & (size <= cap)
                sl = jax.lax.dynamic_slice_in_dim(arr, start, cap)
                parts.append(jnp.where(slot < size, sl,
                                       jnp.uint32(sentinel)))
            return jnp.concatenate(parts), ok

        rr, ok_r = side_concat(r_sorted, r_bounds, cap_r, 0xFFFFFFFF)
        ss, ok_s = side_concat(s_sorted, s_bounds, cap_s, 0xFFFFFFFE)
        lo, hi = _merged_partials(rr, ss)
        ok_k = (ok_r & ok_s).astype(jnp.int32)
        return (jax.lax.dynamic_update_slice_in_dim(
                    lo_a, lo[None, :], rg, 0),
                jax.lax.dynamic_update_slice_in_dim(
                    hi_a, hi[None, :], rg, 0),
                jax.lax.dynamic_update_index_in_dim(oks, ok_k, rg, 0))

    return jax.lax.fori_loop(
        0, n_ranges, body,
        (jnp.zeros((n_ranges, nb), jnp.int32),
         jnp.zeros((n_ranges, nb), jnp.int32),
         jnp.zeros((n_ranges,), jnp.int32)))


def join_count_keys_skew_hashed(r_source, s_source,
                                r_runs: int, s_runs: int,
                                n_r_total: int, n_s_total: int,
                                n_ranges: int = 16,
                                max_heavy_per_run: int = 8,
                                prng_seed: int = 0,
                                cap_slack: float = 1.15,
                                sync=None):
    """Skew-aware exact count join, LINEAR in partition count (round 4).

    The pair-decomposed mergecount (:func:`join_count_keys_skew_runs`)
    re-sorts every (R-run, S-run) pair: total sort work is
    r_runs * s_runs * (nr + ns) — quadratic in the run count, ~48 s of
    the 62 s 1B Zipf config.  Value-range partitioning (the linear
    trick) fails for skewed data only because Zipf mass concentrates in
    key-value space; a multiplicative BIJECTION ``k' = k * H mod 2^32``
    preserves key equality while spreading any distribution uniformly
    over the relabeled domain.  So:

      1. heavy keys detected + counted exactly (closed-form products,
         the existing machinery); the two sentinel preimages are always
         treated as heavy so no light key relabels onto a padding
         sentinel,
      2. each run is relabeled, heavy-masked to sentinels, and sorted
         ONCE (runs sorts instead of runs^2 pair sorts),
      3. per relabeled RANGE, each run's contribution is a CONTIGUOUS
         slice of its sorted array (dynamic-slice copies, never
         gathers); per-range mergecount over the sentinel-padded
         concatenation is exact under arbitrary duplicate structure,
      4. totals recombine from 15/15-bit partials + heavy products in
         host int64.

    A (run, range) slice exceeding the padded capacity flips ok; the
    caller falls back to the quadratic path (correctness never rests on
    the balance estimate).  Returns (matches, ok).

    PRECONDITION (detection quality only, not correctness): heavy-key
    detection samples the first 2 runs per side, assuming runs are iid
    slices of one distribution (true for the engine's generator and
    shuffle sources).  For non-iid sources — e.g. key-ordered runs —
    globally heavy keys can be missed; missed heavy keys degrade to the
    ok=False capacity fallback or a slow mergecount range, never a wrong
    count (the capacity ok flag guards exactness either way).
    """
    from ..ops import skew as skew_ops
    sync = sync or (lambda x: None)
    assert n_r_total % r_runs == 0 and n_s_total % s_runs == 0
    nr = n_r_total // r_runs
    ns = n_s_total // s_runs

    # ---- phase 0: heavy detection (sampled) + exact counts ----
    # Runs are iid sample slices, so a GLOBALLY heavy key is heavy in
    # every run: sampling windows from 2 runs per side routes the same
    # keys as sampling all of them, and saves runs-2 generator passes
    # per side (the Zipf inverse-CDF's float pow is a real cost at 2^27).
    # Detection only ROUTES work — both routes are exact.
    def _detect_all():
        hks, hvs = [], []
        base = jax.random.key(prng_seed)
        fold = 0
        for src, runs in ((r_source, r_runs), (s_source, s_runs)):
            for i in range(min(runs, 2)):
                k = src(i, runs)
                fold += 1
                win = 1 << 16
                if k.shape[0] > win:
                    off = ((i * 2654435761) % (k.shape[0] - win)) & ~127
                    k = jax.lax.slice_in_dim(k, off, off + win)
                hh = skew_ops.detect_heavy_keys(
                    k, jax.random.fold_in(base, fold),
                    max_heavy_per_run * max(1, runs // 2))
                hks.append(hh.keys)
                hvs.append(hh.valid)
        # sentinel preimages ride as always-valid candidates
        hks.append(jnp.asarray(np.array(_SENT_PREIMAGES, np.uint32)))
        hvs.append(jnp.ones((2,), bool))
        hh = skew_ops.dedup_heavy(skew_ops.HeavyHitters(
            jnp.concatenate(hks), jnp.concatenate(hvs)))
        sync(hh.keys)
        return hh

    hh = _detect_all()

    # ---- phase 1: per run, ONE generation and ONE [K, N] compare pass
    # feeding both the exact heavy counts (sum over rows) and the
    # relabel mask (any over rows), then the run sort (module-level
    # jitted helpers: see _skh_* above — rebuilding them per call cost
    # ~25-30 s/rep in relay recompiles at the 1B scale) ----
    cap_r = int(-(-int(nr / n_ranges * cap_slack) // 128) * 128)
    cap_s = int(-(-int(ns / n_ranges * cap_slack) // 128) * 128)

    def _build_side(src, runs, sentinel, cap):
        # per-run sorted arrays as a LIST (one 4 GB array per side would
        # pay a full-copy transient per functional update — this backend
        # ignores donation across dispatches).  Each run carries ``cap``
        # trailing sentinels so phase 2's fixed-size dynamic slices never
        # clamp (a clamped start would shift earlier-range elements under
        # the validity mask).
        pad = jnp.full((cap,), jnp.uint32(sentinel))
        sorted_runs, bnds = [], []
        hcnt = jnp.zeros((hh.keys.shape[0],), jnp.int32)
        for i in range(runs):
            srt, hc = _skh_relabel_sort_count(src(i, runs), hh.keys,
                                              hh.valid, sentinel=sentinel)
            hcnt = hcnt + hc
            bnds.append(_skh_bounds_of(srt, n_ranges))
            srt = jnp.concatenate([srt, pad])
            sync(srt)
            sorted_runs.append(srt)
        # list[[per+cap]], [runs, R+1], int32[K]
        return sorted_runs, jnp.stack(bnds), hcnt

    r_sorted, r_bounds, cr = _build_side(r_source, r_runs, 0xFFFFFFFF,
                                         cap_r)
    s_sorted, s_bounds, cs = _build_side(s_source, s_runs, 0xFFFFFFFE,
                                         cap_s)
    cr_h = np.asarray(jax.device_get(cr)).astype(np.int64)
    cs_h = np.asarray(jax.device_get(cs)).astype(np.int64)
    heavy_total = int(np.sum(cr_h * cs_h))

    # ---- phase 2: per-range slice assembly + mergecount, one jit ----
    lo_a, hi_a, oks = _skh_ranges_all(r_sorted, r_bounds, s_sorted,
                                      s_bounds, n_ranges, cap_r, cap_s)
    lo_h = np.asarray(jax.device_get(lo_a), np.int64).sum()
    hi_h = np.asarray(jax.device_get(hi_a), np.int64).sum()
    ok = bool((np.asarray(jax.device_get(oks)) == 1).all())
    return int(lo_h + (hi_h << 15)) + heavy_total, ok


# --- 64-bit skew-hashed decomposition (round 5: the linear relabel
# trick reused for wide keys, VERDICT r4 item 8) -----------------------


@functools.partial(jax.jit, donate_argnums=(0, 1),
                   static_argnames=("sentinel",))
def _skh64_hash_sort_count(hi, lo, hk_hi, hk_lo, hv, sentinel: int):
    """[K, N] pair-compare -> exact heavy counts + mask; ROUTE hash
    h = hi*A ^ lo*B (collisions harmless: ranges only route work — the
    per-range mergecount compares FULL (hi, lo) keys); one sort by h
    carrying both planes."""
    eq = ((hi[None, :] == hk_hi[:, None])
          & (lo[None, :] == hk_lo[:, None])) & hv[:, None]
    hcnt = jnp.sum(eq, axis=1, dtype=jnp.int32)
    m = jnp.any(eq, axis=0)
    h = (hi * jnp.uint32(_RELABEL_MULT)) ^ (lo * jnp.uint32(0x85EBCA77))
    h = jnp.where(m, jnp.uint32(sentinel), h)
    sh, shi, slo = jax.lax.sort((h, hi, lo), num_keys=1, is_stable=False)
    return sh, shi, slo, hcnt


@functools.partial(jax.jit,
                   static_argnames=("n_ranges", "cap_r", "cap_s"))
def _skh64_ranges_all(r_his, r_los, r_bounds,
                      s_his, s_los, s_bounds,
                      n_ranges: int, cap_r: int, cap_s: int):
    """64-bit mirror of :func:`_skh_ranges_all`: per-range contiguous
    (hi, lo) slice assembly from the hash-sorted runs + mergecount64
    partials, one fori_loop executable."""
    from ..ops.wide import _merged_partials64
    from ..ops.buildprobe import _PARTIAL_BLOCK
    concat = len(r_his) * cap_r + len(s_his) * cap_s
    nb = -(-concat // _PARTIAL_BLOCK)

    def body(rg, carry):
        lo_a, hi_a, oks = carry

        def side_concat(his, los, bounds, cap, pad_hi, pad_lo):
            slot = jnp.arange(cap, dtype=jnp.int32)
            parts_h, parts_l = [], []
            ok = jnp.bool_(True)
            for run in range(len(his)):
                start = jax.lax.dynamic_index_in_dim(
                    bounds[run], rg, 0, keepdims=False)
                end = jax.lax.dynamic_index_in_dim(
                    bounds[run], rg + 1, 0, keepdims=False)
                size = end - start
                ok = ok & (size <= cap)
                sl_h = jax.lax.dynamic_slice_in_dim(his[run], start, cap)
                sl_l = jax.lax.dynamic_slice_in_dim(los[run], start, cap)
                keep = slot < size
                parts_h.append(jnp.where(keep, sl_h, jnp.uint32(pad_hi)))
                parts_l.append(jnp.where(keep, sl_l, jnp.uint32(pad_lo)))
            return (jnp.concatenate(parts_h), jnp.concatenate(parts_l),
                    ok)

        rh, rl, ok_r = side_concat(r_his, r_los, r_bounds, cap_r,
                                   0xFFFFFFFF, 0xFFFFFFFF)
        sh, sl, ok_s = side_concat(s_his, s_los, s_bounds, cap_s,
                                   0xFFFFFFFF, 0xFFFFFFFE)
        lo, hi = _merged_partials64(rh, rl, sh, sl)
        ok_k = (ok_r & ok_s).astype(jnp.int32)
        return (jax.lax.dynamic_update_slice_in_dim(
                    lo_a, lo[None, :], rg, 0),
                jax.lax.dynamic_update_slice_in_dim(
                    hi_a, hi[None, :], rg, 0),
                jax.lax.dynamic_update_index_in_dim(oks, ok_k, rg, 0))

    return jax.lax.fori_loop(
        0, n_ranges, body,
        (jnp.zeros((n_ranges, nb), jnp.int32),
         jnp.zeros((n_ranges, nb), jnp.int32),
         jnp.zeros((n_ranges,), jnp.int32)))


def join64_count_keys_skew_hashed(r_source, s_source,
                                  r_runs: int, s_runs: int,
                                  n_r_total: int, n_s_total: int,
                                  n_ranges: int = 16,
                                  max_heavy_per_run: int = 8,
                                  prng_seed: int = 0,
                                  cap_slack: float = 1.15,
                                  sync=None):
    """64-bit skew-aware exact count join, LINEAR in run count — the
    wide-key reuse of :func:`join_count_keys_skew_hashed`'s fused
    decomposition (VERDICT r4 item 8).

    Sources are ``fn(run, n_runs) -> (hi, lo)`` uint32 plane callables.
    Routing uses the mixed hash h = hi*A ^ lo*B — hash collisions only
    co-locate keys in a range (the per-range mergecount64 compares full
    (hi, lo) pairs), so exactness never depends on the hash.  Heavy
    (hi, lo) keys (pair-exact sampled detection, ops/skew.
    detect_heavy_keys64) are counted closed-form and masked to side
    sentinels before the route sort.  A (run, range) slice over the
    padded capacity flips ok; fall back to
    :func:`join64_count_keys_runs` (whose per-pair escalation is exact
    under any skew).  Returns (matches, ok).
    """
    from ..ops import skew as skew_ops
    sync = sync or (lambda x: None)
    assert n_r_total % r_runs == 0 and n_s_total % s_runs == 0
    nr = n_r_total // r_runs
    ns = n_s_total // s_runs

    # ---- detection: 2 iid runs per side ----
    hhs, hls, hvs = [], [], []
    base = jax.random.key(prng_seed)
    fold = 0
    for src, runs in ((r_source, r_runs), (s_source, s_runs)):
        for i in range(min(runs, 2)):
            hi, lo = src(i, runs)
            fold += 1
            win = 1 << 16
            if hi.shape[0] > win:
                off = ((i * 2654435761) % (hi.shape[0] - win)) & ~127
                hi = jax.lax.slice_in_dim(hi, off, off + win)
                lo = jax.lax.slice_in_dim(lo, off, off + win)
            hh_i = skew_ops.detect_heavy_keys64(
                hi, lo, jax.random.fold_in(base, fold),
                max_heavy_per_run * max(1, runs // 2))
            hhs.append(hh_i.key_hi)
            hls.append(hh_i.key_lo)
            hvs.append(hh_i.valid)
    hh = skew_ops.dedup_heavy64(skew_ops.HeavyHitters64(
        jnp.concatenate(hhs), jnp.concatenate(hls), jnp.concatenate(hvs)))
    sync(hh.key_hi)

    span = (1 << 32) // n_ranges
    bounds_vals = jnp.asarray(
        np.minimum(np.arange(n_ranges + 1, dtype=np.int64) * span,
                   0xFFFFFFFE).astype(np.uint32))
    cap_r = int(-(-int(nr / n_ranges * cap_slack) // 128) * 128)
    cap_s = int(-(-int(ns / n_ranges * cap_slack) // 128) * 128)

    def build_side(src, runs, sentinel, cap, pad_hi, pad_lo):
        pad_h = jnp.full((cap,), jnp.uint32(pad_hi))
        pad_l = jnp.full((cap,), jnp.uint32(pad_lo))
        his, los, bnds = [], [], []
        hcnt = jnp.zeros((hh.key_hi.shape[0],), jnp.int32)
        for i in range(runs):
            hi, lo = src(i, runs)
            sh, shi, slo, hc = _skh64_hash_sort_count(
                hi, lo, hh.key_hi, hh.key_lo, hh.valid,
                sentinel=sentinel)
            hcnt = hcnt + hc
            bnds.append(jnp.searchsorted(sh, bounds_vals)
                        .astype(jnp.int32))
            his.append(jnp.concatenate([shi, pad_h]))
            los.append(jnp.concatenate([slo, pad_l]))
            sync(his[-1])
        return his, los, jnp.stack(bnds), hcnt

    r_his, r_los, r_bounds, cr = build_side(r_source, r_runs, 0xFFFFFFFF,
                                            cap_r, 0xFFFFFFFF, 0xFFFFFFFF)
    s_his, s_los, s_bounds, cs = build_side(s_source, s_runs, 0xFFFFFFFE,
                                            cap_s, 0xFFFFFFFF, 0xFFFFFFFE)
    cr_h = np.asarray(jax.device_get(cr)).astype(np.int64)
    cs_h = np.asarray(jax.device_get(cs)).astype(np.int64)
    heavy_total = int(np.sum(cr_h * cs_h))

    lo_a, hi_a, oks = _skh64_ranges_all(
        r_his, r_los, r_bounds, s_his, s_los, s_bounds,
        n_ranges=n_ranges, cap_r=cap_r, cap_s=cap_s)
    lo_h = np.asarray(jax.device_get(lo_a), np.int64).sum()
    hi_h = np.asarray(jax.device_get(hi_a), np.int64).sum()
    ok = bool((np.asarray(jax.device_get(oks)) == 1).all())
    return int(lo_h + (hi_h << 15)) + heavy_total, ok


def join_count_keys_skew_runs(r_source, s_source,
                              r_runs: int, s_runs: int,
                              n_r_total: int, n_s_total: int,
                              max_heavy_per_run: int = 8,
                              prng_seed: int = 0,
                              sync=None):
    """Skew-aware exact count join at beyond-sort-limit sizes (the
    BASELINE 1B x 1B Zipf(1.05) single-host config).

    The same pair decomposition as :func:`join_count_keys_runs`, but each
    pair is counted with the MERGECOUNT rung (one concat-sort + run-
    product scans — exact under arbitrary skew, engine/join.py
    mode="mergecount"), and heavy hitters are removed first so the
    in-pair products stay within int32:

      1. sample-detect heavy keys per run and union them (a key heavy in
         ANY run is dropped everywhere — classification only routes work,
         both routes are exact),
      2. exact heavy frequencies per side via fused compare-reduce
         (one jit per run: XLA fuses the [K, N] plane into the reduction
         — measured 0.04 s at 2^28; the EAGER ops/skew.count_exact would
         materialise 8 GB there),
      3. per pair: sentinel-out heavy rows (same fused form) + mergecount,
      4. total = sum of pair counts + sum_k cr[k] * cs[k] in host int.

    Sources are callables ``fn(run, n_runs) -> uint32 keys`` (runs are
    re-generated on demand — measured ~0.04 s each — so at most one run
    per side plus the mergecount working set is resident).
    """
    from ..ops import skew as skew_ops
    sync = sync or (lambda x: None)

    def _detect_all():
        hks, hvs = [], []
        base = jax.random.key(prng_seed)
        fold = 0
        for src, runs in ((r_source, r_runs), (s_source, s_runs)):
            for i in range(runs):
                k = src(i, runs)
                fold += 1
                # Pre-slice a contiguous window for the detector: its
                # internal uniform-index gather costs ~23 s EAGERLY on a
                # 1 GB operand over the relay (XLA random gather is the
                # slowest op class on this chip); a static slice is free,
                # and run sources are iid draws, so a contiguous block IS
                # a uniform sample.
                win = 1 << 16
                if k.shape[0] > win:
                    off = ((i * 2654435761) % (k.shape[0] - win)) & ~127
                    k = jax.lax.slice_in_dim(k, off, off + win)
                hh = skew_ops.detect_heavy_keys(
                    k, jax.random.fold_in(base, fold), max_heavy_per_run)
                hks.append(hh.keys)
                hvs.append(hh.valid)
        hh = skew_ops.HeavyHitters(jnp.concatenate(hks),
                                   jnp.concatenate(hvs))
        hh = skew_ops.dedup_heavy(hh)
        sync(hh.keys)
        return hh

    @jax.jit
    def _hcount(keys, hk, hv):
        eq = (keys[None, :] == hk[:, None]) & hv[:, None]
        return jnp.sum(eq, axis=1, dtype=jnp.int32)

    @jax.jit
    def _eff(keys, hk, hv, sentinel):
        m = jnp.any((keys[None, :] == hk[:, None]) & hv[:, None], axis=0)
        return jnp.where(m, sentinel, keys)

    hh = _detect_all()

    cr = jnp.zeros((hh.keys.shape[0],), jnp.int32)
    for i in range(r_runs):
        cr = cr + _hcount(r_source(i, r_runs), hh.keys, hh.valid)
    cs = jnp.zeros((hh.keys.shape[0],), jnp.int32)
    for j in range(s_runs):
        cs = cs + _hcount(s_source(j, s_runs), hh.keys, hh.valid)
    cr_h = np.asarray(jax.device_get(cr)).astype(np.int64)
    cs_h = np.asarray(jax.device_get(cs)).astype(np.int64)
    heavy_total = int(np.sum(cr_h * cs_h))

    light_total = 0
    for i in range(r_runs):
        rk_eff = _eff(r_source(i, r_runs), hh.keys, hh.valid,
                      jnp.uint32(0xFFFFFFFF))
        sync(rk_eff)
        for j in range(s_runs):
            sk_eff = _eff(s_source(j, s_runs), hh.keys, hh.valid,
                          jnp.uint32(0xFFFFFFFE))
            # Host-finished 64-bit mergecount: with BOTH sides skewed,
            # second-tier keys the bounded heavy detector missed can give
            # a pair >2^31 matches — the int32 device total would wrap
            # silently while ok=True.  Exactness here makes the heavy
            # pre-pass a pure routing optimisation, never a correctness
            # dependency.
            light_total += probe_count_merged_exact(rk_eff, sk_eff)
    return light_total + heavy_total, True


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _gen_span(n: int, odd_mult: int, lo: int, hi: int) -> jnp.ndarray:
    x = jnp.arange(lo, hi, dtype=jnp.uint32)
    return (x * jnp.uint32(odd_mult)) & jnp.uint32(n - 1)


def gen_unique_keys(n: int, odd_mult: int) -> jnp.ndarray:
    """Dense unique keys on-device: the bijection (i * odd) mod n, n = 2^k.

    The self-validating benchmark workload (reference Relation::
    fillUniqueValues, data/Relation.cpp:63-73) at sizes where
    jax.random.permutation's internal sort would double peak memory.
    Two different odd multipliers give two relations over the SAME dense
    key set [0, n) in different orders, so matches == n exactly.
    """
    assert n & (n - 1) == 0, "power-of-two n"
    assert odd_mult & 1
    return _gen_span(n, odd_mult, 0, n)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _gen_zipf_span(nr: int, domain: int, theta: float, key) -> jnp.ndarray:
    # Analytic inverse-CDF Zipf (cf. data/relation.py fill_zipf), keys only.
    # float32 inverse CDF: tail values past 2^24 are quantised to
    # representable floats, mildly distorting the deep tail vs the exact
    # integer Zipf (bench realism only — join correctness is unaffected,
    # and the head/heavy-hitter mass the skew machinery exercises is
    # exact).  x64 stays off engine-wide, so the fix would be a host-side
    # float64 table; not worth it for a generator.
    u = jax.random.uniform(key, (nr,), dtype=jnp.float32,
                           minval=1e-7, maxval=1.0)
    th = theta if abs(theta - 1.0) >= 1e-6 else 1.0 + 1e-4
    one_m = 1.0 - th
    h_max = (float(domain) ** one_m - 1.0) / one_m
    r = jnp.power(1.0 + u * h_max * one_m, 1.0 / one_m)
    return jnp.clip(r.astype(jnp.uint32), 0, domain - 1)


def gen_zipf_keys_run(n: int, domain: int, theta: float, seed: int):
    """``fn(run, n_runs)`` Zipf(theta) key source over [0, domain).

    Independent samples per run == one n-sized Zipf sample, since draws
    are iid; deterministic in (seed, run)."""
    def source(run: int, n_runs: int) -> jnp.ndarray:
        return _gen_zipf_span(n // n_runs, domain, theta,
                              jax.random.fold_in(jax.random.key(seed), run))

    return source


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _gen_span64(n: int, order_mult: int, hi_mult: int,
                lo: int, hi: int):
    j = jnp.arange(lo, hi, dtype=jnp.uint32)
    i = (j * jnp.uint32(order_mult)) & jnp.uint32(n - 1)
    # uint32 multiply wraps mod 2^32: lo plane injective over i in [0, n)
    # (odd multiplier is invertible mod 2^32), hi plane well-spread.
    return i * jnp.uint32(hi_mult), i * jnp.uint32(_LO64_MULT)


_LO64_MULT = 0x9E3779B9          # odd: the lo-plane bijection


def gen_unique_keys64_run(n: int, order_mult: int,
                          hi_mult: int = 0x85EBCA77):
    """``fn(run, n_runs) -> (hi, lo)`` source of dense unique 64-bit keys.

    The self-validating wide-key workload: key64(i) = (i * hi_mult mod
    2^32, i * LO64_MULT mod 2^32) for i in [0, n) — the lo plane alone is
    a bijection, so the n keys are distinct 64-bit values with a
    well-spread hi plane (the diagonal64 window search uses hi only).
    Each side enumerates the SAME key set in a different order via its
    ``order_mult`` index bijection (i = j * order_mult mod n, n = 2^k), so
    matches == n exactly and run slices are balanced random samples.
    """
    assert n & (n - 1) == 0 and order_mult & 1 and hi_mult & 1

    def source(run: int, n_runs: int):
        nr = n // n_runs
        return _gen_span64(n, order_mult, hi_mult,
                           run * nr, (run + 1) * nr)

    return source


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _gen_span_offset(nr: int, odd_mult: int, base: int) -> jnp.ndarray:
    x = jnp.arange(0, nr, dtype=jnp.uint32)
    return ((x * jnp.uint32(odd_mult)) & jnp.uint32(nr - 1)) + jnp.uint32(base)


def gen_unique_keys_ranged_run(n: int, odd_mult: int):
    """``fn(run, n_runs)`` source of dense unique keys, run k a bijection
    over the SUBRANGE [k*n/n_runs, (k+1)*n/n_runs) — the value-range-
    partitioned form ``join_count_keys_runs(ranged_domain=n)`` wants.

    The union over runs is exactly the dense key set [0, n) (same
    self-validating workload as gen_unique_keys_run: matches == n against
    any other dense-unique source over [0, n)); what changes is the
    ORDER runs enumerate it — partition-contiguous, mirroring data that
    arrived through the reference's network-partitioning phase
    (tasks/NetworkPartitioning.cpp: local processing always sees
    partition-contiguous tuples)."""
    assert n & (n - 1) == 0 and odd_mult & 1

    def source(run: int, n_runs: int) -> jnp.ndarray:
        nr = n // n_runs
        assert nr & (nr - 1) == 0
        return _gen_span_offset(nr, odd_mult, run * nr)

    return source


def gen_unique_keys_run(n: int, odd_mult: int):
    """``fn(run, n_runs)`` source for :func:`join_count_keys_runs`: run
    ``run`` of gen_unique_keys(n, odd_mult), never materialising the full
    n — the memory-lean form the 1B x 1B benchmark needs (a 4 GB parent
    array would otherwise stay live through the device-side split, since
    this backend ignores buffer donation)."""
    assert n & (n - 1) == 0 and odd_mult & 1

    def source(run: int, n_runs: int) -> jnp.ndarray:
        nr = n // n_runs
        return _gen_span(n, odd_mult, run * nr, (run + 1) * nr)

    return source
