"""In-HBM large-N count join — the north-star scale without the spill path.

The reference reaches its largest workloads by streaming tiles through the
GPU (operators/gpu/kernels_tile.cu, data/data.hpp:17-20 MAX_CHUNK_SIZE)
because its device memory is small.  A v5e chip has 16 GB HBM, and a count
join needs only the keys (4 B/tuple/side — rids never matter for counting,
engine/join.py mode="diagonal"), so even 1B x 1B fits ON the chip:

    live peak = sorted_R (4 GB) + S (donated into its sort) + sorted_S
              = 12 GB at the second sort, less with donation honoured.

This module phases the join explicitly — sort R, sort S, probe — with
buffer donation between phases so XLA can reuse buffers, instead of one
fused jit whose liveness analysis would keep everything resident.  The
out-of-core driver (engine/outofcore.py) remains the path for relations
that truly exceed HBM; this one replaces it whenever both key arrays fit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.buildprobe import (bias_keys, diagonal_prepad,
                              probe_count_diagonal)


@functools.partial(jax.jit, donate_argnums=0)
def _sort_biased(keys: jnp.ndarray) -> jnp.ndarray:
    """uint32 keys -> sorted biased-int32 (the diagonal probe's input form).

    Donation lets the backend reuse the input buffer for a sort pass, which
    is what makes the 12 GB peak of 1B x 1B viable.
    """
    return jax.lax.sort(bias_keys(keys))


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
                         n_s_total: int | None = None):
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

    Returns (matches: int, ok: bool) — host-side exact accumulation (a
    device int32 total would cap at 2^31 matches).
    """
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

    nr = total_of(r_keys, n_r_total) // r_runs
    ns = total_of(s_keys, n_s_total) // s_runs

    def run_parts(keys, runs):
        if callable(keys):
            return (keys(i, runs) for i in range(runs))
        assert keys.shape[0] % runs == 0
        return _split_donate(keys, runs)

    # Sort + sentinel-pad each run ONCE (diagonal_prepad) — the probe's
    # internal padding would otherwise copy both sides on EVERY pair
    # probe, and at 4x2GB resident that transient is what exhausts HBM.
    # All runs share one geometry: (nr, ns) are equal across runs.
    rs_runs = []
    for part in run_parts(r_keys, r_runs):
        assert part.shape[0] == nr
        rp = diagonal_prepad(_sort_biased(part), "r", nr, ns,
                             k_drift=k_drift, rows_per_group=rows_per_group)
        sync(rp)
        rs_runs.append(rp)
    ss_runs = []
    for part in run_parts(s_keys, s_runs):
        assert part.shape[0] == ns
        sp = diagonal_prepad(_sort_biased(part), "s", nr, ns,
                             k_drift=k_drift, rows_per_group=rows_per_group)
        sync(sp)
        ss_runs.append(sp)

    total = 0
    ok = True
    for rs in rs_runs:
        for ss in ss_runs:
            m, o = probe_count_diagonal(
                rs, ss, k_drift=k_drift, rows_per_group=rows_per_group,
                prepadded=(nr, ns))
            total += int(m)
            ok = ok and bool(o)
    return total, ok


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
