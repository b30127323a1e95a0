"""64-bit-key join tests vs a NumPy uint64 oracle."""

import numpy as np
import pytest

from radixjoin_tpu.ops.wide import (Relation64, make_relation64,
                                    join64_count, join64_count_checked)


def _np_join_count64(r_keys, s_keys):
    r_u, r_c = np.unique(r_keys, return_counts=True)
    s_u, s_c = np.unique(s_keys, return_counts=True)
    _, ri, si = np.intersect1d(r_u, s_u, return_indices=True)
    return int(np.sum(r_c[ri].astype(np.int64) * s_c[si].astype(np.int64)))


@pytest.mark.parametrize("domain_bits", [20, 40, 63])
def test_join64_vs_oracle(domain_bits):
    rng = np.random.default_rng(domain_bits)
    n = 5000
    r = rng.integers(0, 1 << domain_bits, n, dtype=np.uint64)
    s = rng.integers(0, 1 << domain_bits, n, dtype=np.uint64)
    got = join64_count_checked(
        make_relation64(r, np.arange(n, dtype=np.uint32)),
        make_relation64(s, np.arange(n, dtype=np.uint32)))
    assert got == _np_join_count64(r, s)


def test_join64_crosses_word_boundary():
    # keys equal in lo but different in hi must NOT match (and vice versa)
    r = np.array([0x1_00000001, 0x2_00000001, 0x1_00000002], np.uint64)
    s = np.array([0x1_00000001, 0x3_00000001, 0x2_00000002], np.uint64)
    got = join64_count_checked(
        make_relation64(r, np.arange(3, dtype=np.uint32)),
        make_relation64(s, np.arange(3, dtype=np.uint32)))
    assert got == 1


def test_join64_duplicates_both_sides():
    r = np.array([7, 7, 7, 9], np.uint64)
    s = np.array([7, 7, 9, 9], np.uint64)
    got = join64_count_checked(
        make_relation64(r, np.arange(4, dtype=np.uint32)),
        make_relation64(s, np.arange(4, dtype=np.uint32)))
    assert got == 3 * 2 + 1 * 2


# ------------------------- diagonal64 fast path -------------------------

def test_join64_fast_wide_domain():
    from radixjoin_tpu.ops.wide import join64_count_fast, _join64_diag
    rng = np.random.default_rng(60)
    n = 4096
    r = rng.integers(0, 1 << 63, n, dtype=np.uint64)
    s = rng.integers(0, 1 << 63, n, dtype=np.uint64)
    # force a shared subset so matches exist
    s[: n // 4] = rng.permutation(r)[: n // 4]
    r64 = make_relation64(r, np.arange(n, dtype=np.uint32))
    s64 = make_relation64(s, np.arange(n, dtype=np.uint32))
    m, ok = _join64_diag(r64, s64, 64)
    assert bool(ok)
    assert int(m) == _np_join_count64(r, s)
    assert join64_count_fast(r64, s64, 64) == _np_join_count64(r, s)


def test_join64_fast_degenerate_hi_escalates():
    # all keys share one hi word: the hi-plane window bound degenerates,
    # ok must flip, and the fallback must stay exact
    from radixjoin_tpu.ops.wide import join64_count_fast, _join64_diag
    rng = np.random.default_rng(61)
    n = 4096
    base = np.uint64(7) << np.uint64(32)
    r = base | rng.integers(0, 3000, n, dtype=np.uint64)
    s = base | rng.integers(0, 3000, n, dtype=np.uint64)
    r64 = make_relation64(r, np.arange(n, dtype=np.uint32))
    s64 = make_relation64(s, np.arange(n, dtype=np.uint32))
    want = _np_join_count64(r, s)
    m, ok = _join64_diag(r64, s64, 16)
    if bool(ok):
        assert int(m) == want   # ok may legitimately hold if drift fits
    assert join64_count_fast(r64, s64) == want


def test_join64_fast_duplicates_and_drift():
    from radixjoin_tpu.ops.wide import _join64_diag
    rng = np.random.default_rng(62)
    n = 2048
    # moderate dups across a wide domain: hi-runs short, drift from dups
    r = (rng.integers(0, 1000, n, dtype=np.uint64) << np.uint64(40)) \
        | rng.integers(0, 4, n, dtype=np.uint64)
    s = (rng.integers(0, 1000, n, dtype=np.uint64) << np.uint64(40)) \
        | rng.integers(0, 4, n, dtype=np.uint64)
    want = _np_join_count64(r, s)
    m, ok = _join64_diag(make_relation64(r, np.arange(n, dtype=np.uint32)),
                         make_relation64(s, np.arange(n, dtype=np.uint32)),
                         64)
    if bool(ok):
        assert int(m) == want


# ------------------------- large-N runs path (64-bit) -------------------------

def _np_count_from_planes(r_hi, r_lo, s_hi, s_lo):
    r64 = (np.asarray(r_hi, np.uint64) << np.uint64(32)) | np.asarray(r_lo, np.uint64)
    s64 = (np.asarray(s_hi, np.uint64) << np.uint64(32)) | np.asarray(s_lo, np.uint64)
    return _np_join_count64(r64, s64)


def test_join64_runs_unique_oracle():
    from radixjoin_tpu.engine.large import (gen_unique_keys64_run,
                                            join64_count_keys_runs)
    n = 1 << 14
    rsrc = gen_unique_keys64_run(n, 2654435761 | 1)
    ssrc = gen_unique_keys64_run(n, 0x9E3779B1 ^ 0x40)
    m, ok = join64_count_keys_runs(rsrc, ssrc, r_runs=2, s_runs=2,
                                   n_r_total=n, n_s_total=n)
    assert ok and m == n


def test_join64_runs_vs_numpy_random():
    from radixjoin_tpu.engine.large import join64_count_keys_runs
    rng = np.random.default_rng(63)
    n = 1 << 13
    r_hi = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    r_lo = rng.integers(0, 1 << 10, n, dtype=np.uint64).astype(np.uint32)
    s_hi = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    s_lo = rng.integers(0, 1 << 10, n, dtype=np.uint64).astype(np.uint32)
    # overlap half the keys so matches exist
    s_hi[: n // 2] = r_hi[: n // 2]
    s_lo[: n // 2] = r_lo[: n // 2]
    want = _np_count_from_planes(r_hi, r_lo, s_hi, s_lo)

    import jax.numpy as jnp

    def src(hi, lo):
        def f(run, n_runs):
            nr = len(hi) // n_runs
            sl = slice(run * nr, (run + 1) * nr)
            return jnp.asarray(hi[sl]), jnp.asarray(lo[sl])
        return f

    m, ok = join64_count_keys_runs(src(r_hi, r_lo), src(s_hi, s_lo),
                                   r_runs=2, s_runs=2,
                                   n_r_total=n, n_s_total=n)
    assert ok and m == want


def test_join64_runs_skew_escalates_exact():
    # one mega-duplicate key forces drift violations in some pair probes;
    # the per-pair mergecount escalation must keep the total exact.
    from radixjoin_tpu.engine.large import join64_count_keys_runs
    rng = np.random.default_rng(64)
    n = 1 << 12
    hi = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    hi[: n // 4] = 0x12345678
    lo[: n // 4] = 0x9ABCDEF0
    s_hi, s_lo = hi.copy(), lo.copy()
    rng.shuffle(s_hi)  # decorrelate positions (keys differ after shuffle:
    s_hi, s_lo = hi[rng.permutation(n)], lo[rng.permutation(n)]
    want = _np_count_from_planes(hi, lo, s_hi, s_lo)

    import jax.numpy as jnp

    def src(h, l):
        def f(run, n_runs):
            nr = len(h) // n_runs
            sl = slice(run * nr, (run + 1) * nr)
            return jnp.asarray(h[sl]), jnp.asarray(l[sl])
        return f

    m, ok = join64_count_keys_runs(src(hi, lo), src(s_hi, s_lo),
                                   r_runs=2, s_runs=2,
                                   n_r_total=n, n_s_total=n)
    assert ok and m == want


def test_gen_unique_keys64_avoids_reserved_domain():
    # the top 16 values of the 64-bit domain are padding sentinels; the
    # dense-unique generator must never emit them for the bench multipliers
    from radixjoin_tpu.engine.large import _LO64_MULT
    for hi_mult in (0x85EBCA77,):
        inv = pow(hi_mult, -1, 1 << 32)
        i0 = (inv * 0xFFFFFFFF) % (1 << 32)
        lo0 = (i0 * _LO64_MULT) % (1 << 32)
        assert lo0 < 0xFFFFFFF0, "generator hits reserved sentinel domain"


@pytest.mark.slow
def test_diagonal_prepad64_matches_unpadded():
    import jax
    import jax.numpy as jnp
    from radixjoin_tpu.engine.large import _sort_biased64
    from radixjoin_tpu.ops.wide import (diagonal_prepad64,
                                        probe_count_diagonal64)
    rng = np.random.default_rng(65)
    n = 4096
    r_hi = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    r_lo = rng.integers(0, 4, n, dtype=np.uint64).astype(np.uint32)
    s_hi = r_hi[rng.permutation(n)]
    s_lo = rng.integers(0, 4, n, dtype=np.uint64).astype(np.uint32)
    rh, rl = _sort_biased64(jnp.asarray(r_hi), jnp.asarray(r_lo))
    sh, sl = _sort_biased64(jnp.asarray(s_hi), jnp.asarray(s_lo))
    m0, ok0 = probe_count_diagonal64(rh, rl, sh, sl, k_drift=32)
    ph, plo = diagonal_prepad64(rh, rl, "r", n, n, k_drift=32)
    qh, qlo = diagonal_prepad64(sh, sl, "s", n, n, k_drift=32)
    m1, ok1 = probe_count_diagonal64(ph, plo, qh, qlo, k_drift=32,
                                     prepadded=(n, n))
    assert int(m0) == int(m1) and bool(ok0) == bool(ok1)


# ------------------------- distributed 64-bit path -------------------------

def _rel64_from_planes(hi, lo):
    from radixjoin_tpu.ops.wide import Relation64
    import jax.numpy as jnp
    n = hi.shape[0]
    return Relation64(jnp.asarray(hi), jnp.asarray(lo),
                      jnp.asarray(np.arange(n, dtype=np.uint32)))


def test_distributed64_unique_oracle(mesh8):
    """Dense-unique 64-bit keys through the 4-phase distributed join:
    (hi, lo, rid) planes shuffled over the mesh, diagonal64 local rung
    (VERDICT r3 item 4)."""
    from radixjoin_tpu import JoinConfig
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join64, total_distributed_matches64)
    n_dev, per = 8, 2048
    n = per * n_dev
    # same dense 64-bit key set on both sides, different enumeration order
    def planes(order_mult):
        i = (np.arange(n, dtype=np.uint64) * order_mult) % n
        return ((i * 0x85EBCA77) % (1 << 32)).astype(np.uint32), \
               ((i * 0x9E3779B9) % (1 << 32)).astype(np.uint32)
    cfg = JoinConfig(use_pallas=False, allocation_factor=1.3)
    run = make_distributed_join64(mesh8, per, per, cfg)
    res = run(_rel64_from_planes(*planes(2654435761 | 1)),
              _rel64_from_planes(*planes(0x9E3779B1 ^ 0x40)))
    assert np.asarray(res.ok).all()
    assert total_distributed_matches64(res) == n
    np.testing.assert_array_equal(
        np.asarray(res.global_hist_r),
        np.bincount(planes(2654435761 | 1)[1] & 31, minlength=32))


def test_distributed64_mergecount_duplicates(mesh8):
    """General 64-bit workload with duplicates through the terminal
    mergecount64 rung, vs the NumPy uint64 oracle."""
    from radixjoin_tpu import JoinConfig
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join64, total_distributed_matches64)
    n_dev, per = 8, 2048
    n = per * n_dev
    rng = np.random.default_rng(70)
    r64 = rng.integers(0, 3000, n, dtype=np.uint64) \
        | (rng.integers(0, 4, n, dtype=np.uint64) << np.uint64(40))
    s64 = rng.integers(0, 3000, n, dtype=np.uint64) \
        | (rng.integers(0, 4, n, dtype=np.uint64) << np.uint64(40))
    want = _np_join_count64(r64, s64)
    cfg = JoinConfig(use_pallas=False, allocation_factor=1.3)
    run = make_distributed_join64(mesh8, per, per, cfg,
                                  local_probe="mergecount64")
    res = run(make_relation64(r64, np.arange(n, dtype=np.uint32)),
              make_relation64(s64, np.arange(n, dtype=np.uint32)))
    assert np.asarray(res.ok).all()
    assert total_distributed_matches64(res) == want


def test_distributed64_checked_escalates_degenerate_hi(mesh8):
    """Degenerate-hi duplicates trip the diagonal64 coverage check; the
    checked wrapper must escalate to mergecount64 and stay exact."""
    from radixjoin_tpu import JoinConfig
    from radixjoin_tpu.engine.distributed import make_distributed_join64_checked
    n_dev, per = 8, 1024
    n = per * n_dev
    rng = np.random.default_rng(71)
    lo = rng.integers(0, 50, n, dtype=np.uint64)   # heavy duplication
    r64 = lo.copy()
    s64 = lo[rng.permutation(n)]
    want = _np_join_count64(r64, s64)
    cfg = JoinConfig(use_pallas=False, allocation_factor=1.3)
    run = make_distributed_join64_checked(mesh8, per, per, cfg)
    got, escalated = run(make_relation64(r64, np.arange(n, dtype=np.uint32)),
                         make_relation64(s64, np.arange(n, dtype=np.uint32)))
    assert got == want
    assert escalated


def test_join64_ranged_fused():
    # fused 64-bit ranged join (one executable over run pairs): exact on
    # the duplicate-hi self-validating workload, and hi_shift=0 reduces
    # to unique-hi
    from radixjoin_tpu.engine.large import join64_count_keys_ranged_fused
    n = 1 << 13
    for hs in (0, 3):
        m, ok = join64_count_keys_ranged_fused(
            n, 4, 2654435761 | 1, 0x9E3779B1 ^ 0x40,
            hi_shift=hs, k_drift=16, rows_per_group=8)
        assert ok and m == n, (hs, m, ok)


def test_ranged_fused_steady():
    # prepared-build fused steady state agrees with the one-shot fused
    # join and the oracle
    from radixjoin_tpu.engine.large import (
        prepare_ranged_fused, join_count_keys_ranged_fused_steady)
    n = 1 << 13
    build, ok_b = prepare_ranged_fused(n, 4, 2654435761 | 1, k_drift=8,
                                       rows_per_group=8)
    assert bool(ok_b)
    for mult in (0x9E3779B1 ^ 0x40, 0xC2B2AE35 | 1):
        m, ok = join_count_keys_ranged_fused_steady(
            build, n, 4, mult, k_drift=8, rows_per_group=8, blocked=False)
        assert ok and m == n, (mult, m, ok)


def test_ranged_fused_arrays_oracle_and_escalation():
    # fused array-input form: exact on range-partitioned random data,
    # ok=False when the range claim is violated (shuffled input)
    import jax.numpy as jnp
    from radixjoin_tpu.engine.large import join_count_keys_ranged_fused_arrays
    rng = np.random.default_rng(80)
    n, runs = 1 << 13, 4
    domain = 1 << 13
    span = domain // runs

    # range-partitioned sides, dense-unique within each range (the
    # balanced regime the diagonal probe wants; duplicate-heavy data
    # trips coverage and escalates by design — tested separately below)
    def side(seed):
        g = np.random.default_rng(seed)
        parts = [g.permutation(np.arange(k * span, (k + 1) * span,
                                         dtype=np.uint32))
                 for k in range(runs)]
        return np.concatenate(parts)
    rk, sk = side(1), side(2)
    want = n
    m, ok = join_count_keys_ranged_fused_arrays(
        jnp.asarray(rk), jnp.asarray(sk), runs, domain,
        k_drift=16, rows_per_group=8, blocked=False)
    assert ok and m == want
    # violated range claim: a shuffled S must flip ok (counts untrusted)
    m2, ok2 = join_count_keys_ranged_fused_arrays(
        jnp.asarray(rk), jnp.asarray(rng.permutation(sk)), runs, domain,
        k_drift=16, rows_per_group=8, blocked=False)
    assert not ok2


def test_ranged_fused_arrays_checked_escalates():
    import jax.numpy as jnp
    import pytest as _pytest
    from radixjoin_tpu.engine.large import (
        join_count_keys_ranged_fused_arrays_checked)
    rng = np.random.default_rng(81)
    n, runs = 1 << 12, 4
    domain = 1 << 12
    span = domain // runs
    # duplicate-heavy ranged data: coverage trips, mergecount escalation
    # must stay exact
    def side(seed):
        g = np.random.default_rng(seed)
        parts = [g.integers(k * span, k * span + 8, n // runs,
                            dtype=np.uint32) for k in range(runs)]
        return np.concatenate(parts)
    rk, sk = side(1), side(2)
    r_u, r_c = np.unique(rk, return_counts=True)
    s_u, s_c = np.unique(sk, return_counts=True)
    _, ri, si = np.intersect1d(r_u, s_u, return_indices=True)
    want = int(np.sum(r_c[ri].astype(np.int64) * s_c[si].astype(np.int64)))
    got, escalated = join_count_keys_ranged_fused_arrays_checked(
        jnp.asarray(rk), jnp.asarray(sk), runs, domain,
        k_drift=8, rows_per_group=8, blocked=False)
    assert escalated and got == want
    # violated range declaration raises (contract bug, not escalation)
    with _pytest.raises(ValueError):
        join_count_keys_ranged_fused_arrays_checked(
            jnp.asarray(rk), jnp.asarray(rng.permutation(sk)), runs,
            domain, k_drift=8, rows_per_group=8, blocked=False)


def test_skew_hashed_vs_oracle():
    """Relabel-hashed linear skew join (round 4): exact on heavy-skewed
    data vs the numpy oracle, with heavy keys + sentinel preimages routed
    through the closed-form product."""
    import jax.numpy as jnp
    from radixjoin_tpu.engine.large import (join_count_keys_skew_hashed,
                                            _SENT_PREIMAGES)
    rng = np.random.default_rng(90)
    n = 1 << 13
    # heavy key 7 on both sides + mid-tail dups + a sentinel preimage
    rk = rng.integers(0, 3000, n, dtype=np.uint32)
    sk = rng.integers(0, 3000, n, dtype=np.uint32)
    rk[: n // 8] = 7
    sk[: n // 4] = 7
    rk[n // 8: n // 8 + 50] = np.uint32(_SENT_PREIMAGES[0])
    sk[n // 4: n // 4 + 30] = np.uint32(_SENT_PREIMAGES[0])
    rng.shuffle(rk)
    rng.shuffle(sk)
    r_u, r_c = np.unique(rk, return_counts=True)
    s_u, s_c = np.unique(sk, return_counts=True)
    _, ri, si = np.intersect1d(r_u, s_u, return_indices=True)
    want = int(np.sum(r_c[ri].astype(np.int64) * s_c[si].astype(np.int64)))

    def src(a):
        def f(run, n_runs):
            per = a.shape[0] // n_runs
            return jnp.asarray(a[run * per:(run + 1) * per])
        return f

    got, ok = join_count_keys_skew_hashed(src(rk), src(sk), 2, 2, n, n,
                                          n_ranges=4)
    assert ok and got == want, (got, want, ok)

    # a too-small capacity must flip ok (fallback contract), not miscount
    got2, ok2 = join_count_keys_skew_hashed(src(rk), src(sk), 2, 2, n, n,
                                            n_ranges=4, cap_slack=0.02)
    assert not ok2


def test_skew_hashed_asymmetric_runs():
    # r_runs != s_runs, different side sizes, more ranges than runs
    import jax.numpy as jnp
    from radixjoin_tpu.engine.large import join_count_keys_skew_hashed
    rng = np.random.default_rng(91)
    n_r, n_s = 1 << 12, 1 << 13
    rk = rng.integers(0, 1500, n_r, dtype=np.uint32)
    sk = rng.integers(0, 1500, n_s, dtype=np.uint32)
    sk[: n_s // 3] = 42
    rng.shuffle(sk)
    r_u, r_c = np.unique(rk, return_counts=True)
    s_u, s_c = np.unique(sk, return_counts=True)
    _, ri, si = np.intersect1d(r_u, s_u, return_indices=True)
    want = int(np.sum(r_c[ri].astype(np.int64) * s_c[si].astype(np.int64)))

    def src(a):
        def f(run, n_runs):
            per = a.shape[0] // n_runs
            return jnp.asarray(a[run * per:(run + 1) * per])
        return f

    got, ok = join_count_keys_skew_hashed(src(rk), src(sk), 2, 4,
                                          n_r, n_s, n_ranges=8)
    assert ok and got == want, (got, want, ok)


def test_distributed64_skew_aware(mesh8):
    """Round-5 64-bit parity: skew_aware phase 0 drops a hot 64-bit key
    before the shuffle (closed-form heavy products), keeping capacity."""
    from radixjoin_tpu import JoinConfig
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join64, total_distributed_matches64)
    n_dev, per = 8, 2048
    n = per * n_dev
    hot = n // 4
    rng = np.random.default_rng(72)
    hot_key = np.uint64(777) | (np.uint64(3) << np.uint64(40))
    r64 = (rng.permutation(n).astype(np.uint64)
           | (rng.integers(0, 4, n, dtype=np.uint64) << np.uint64(40)))
    s64 = np.concatenate([r64[rng.permutation(n)][:n - hot],
                          np.full(hot, hot_key, np.uint64)])
    rng.shuffle(s64)
    want = _np_join_count64(r64, s64)
    cfg = JoinConfig(use_pallas=False, allocation_factor=1.3)
    # mergecount64 local rung: the post-drop S side is ~25% smaller than
    # R, which exceeds any rank-diagonal drift budget — the robust rung
    # is the right pairing for the skew pre-pass (as in the 32-bit skew
    # config, which goes straight to mergecount)
    run = make_distributed_join64(mesh8, per, per, cfg, skew_aware=True,
                                  local_probe="mergecount64")
    res = run(make_relation64(r64, np.arange(n, dtype=np.uint32)),
              make_relation64(s64, np.arange(n, dtype=np.uint32)))
    assert np.asarray(res.ok).all(), \
        "64-bit heavy pre-pass should keep shuffle within capacity"
    assert total_distributed_matches64(res) == want
    # without the pre-pass the hot key overflows the mean-sized shuffle
    run2 = make_distributed_join64(mesh8, per, per, cfg,
                                   local_probe="mergecount64")
    res2 = run2(make_relation64(r64, np.arange(n, dtype=np.uint32)),
                make_relation64(s64, np.arange(n, dtype=np.uint32)))
    assert not np.asarray(res2.ok).all()


def test_distributed64_rows_dense(mesh8):
    """Round-5 64-bit dense materialising rung (joint dense-rank
    surrogates + windowed emit): unique-keys oracle verifies every
    (r_rid, s_rid) pair joins equal 64-bit keys."""
    from radixjoin_tpu import JoinConfig
    from radixjoin_tpu.engine.distributed import make_distributed_join64
    n_dev, per = 8, 2048
    n = per * n_dev

    def planes(order_mult):
        i = (np.arange(n, dtype=np.uint64) * order_mult) % n
        return ((i * 0x85EBCA77) % (1 << 32)).astype(np.uint32), \
               ((i * 0x9E3779B9) % (1 << 32)).astype(np.uint32)

    cfg = JoinConfig(use_pallas=False, allocation_factor=1.3)
    run = make_distributed_join64(mesh8, per, per, cfg,
                                  materialize_dense=True)
    rh, rl = planes(2654435761 | 1)
    sh, sl = planes(0x9E3779B1 ^ 0x40)
    rows = run(_rel64_from_planes(rh, rl), _rel64_from_planes(sh, sl))
    assert np.asarray(rows.ok).all()
    cnt = np.asarray(rows.counts)
    assert int(cnt.sum()) == n
    m = cnt == 1
    assert m.sum() == n
    rr = np.asarray(rows.r_rids)[m]
    sr = np.asarray(rows.s_rids)[m]
    assert len(set(rr.tolist())) == n
    rk64 = (rh.astype(np.uint64) << np.uint64(32)) | rl
    sk64 = (sh.astype(np.uint64) << np.uint64(32)) | sl
    np.testing.assert_array_equal(rk64[rr], sk64[sr])


def test_skew_hashed64_vs_oracle():
    """Round-5 64-bit linear skew decomposition: hash-routed ranges +
    mergecount64, heavy (hi, lo) keys closed-form, vs the uint64 oracle."""
    from radixjoin_tpu.engine.large import join64_count_keys_skew_hashed
    import jax.numpy as jnp
    n = 1 << 13
    rng = np.random.default_rng(80)
    hot = n // 4
    # skewed S: hot 64-bit key + mid-tail dups; R random with dups
    r64 = (rng.integers(0, 1500, n, dtype=np.uint64)
           | (rng.integers(0, 4, n, dtype=np.uint64) << np.uint64(40)))
    s64 = (rng.integers(0, 1500, n, dtype=np.uint64)
           | (rng.integers(0, 4, n, dtype=np.uint64) << np.uint64(40)))
    hot_key = np.uint64(42) | (np.uint64(2) << np.uint64(40))
    s64[:hot] = hot_key
    rng.shuffle(s64)
    want = _np_join_count64(r64, s64)

    def src_of(k64):
        hi = (k64 >> np.uint64(32)).astype(np.uint32)
        lo = (k64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)

        def src(run, n_runs):
            per = n // n_runs
            sl = slice(run * per, (run + 1) * per)
            return jnp.asarray(hi[sl]), jnp.asarray(lo[sl])
        return src

    got, ok = join64_count_keys_skew_hashed(
        src_of(r64), src_of(s64), 2, 2, n, n, n_ranges=4,
        cap_slack=2.0)
    assert ok and got == want, (got, want, ok)


def test_join64_rows_ranged_runs_full_rowset():
    import jax.numpy as jnp
    """Large-N 64-bit materialising wrapper: hi-range-partitioned runs
    through dense-rank surrogates + the diagonal emit kernel reconstruct
    the exact (r_rid, s_rid) row set; a partial-overlap pair (surrogate
    rank drift beyond +-K) transparently retries through the windowed
    kernel in auto mode."""
    from radixjoin_tpu.engine.large import join64_rows_keys_ranged_runs
    runs = 2
    nr = 1 << 11
    n = nr * runs
    span = (1 << 32) // runs
    rng = np.random.default_rng(70)

    def keys64(k, perm):
        hi = (np.uint32(k * span)
              + np.arange(nr, dtype=np.uint32)[perm])     # in-run span
        lo = (np.arange(nr, dtype=np.uint32) * 7 + 3)[perm]
        return hi, lo

    perms_r = [rng.permutation(nr) for _ in range(runs)]
    perms_s = [rng.permutation(nr) for _ in range(runs)]

    def rsrc(k, n_runs):
        hi, lo = keys64(k, perms_r[k])
        rid = np.arange(k * nr, (k + 1) * nr, dtype=np.uint32)[perms_r[k]]
        return jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(rid)

    def ssrc(k, n_runs):
        hi, lo = keys64(k, perms_s[k])
        rid = np.arange(k * nr, (k + 1) * nr, dtype=np.uint32)[perms_s[k]]
        return jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(rid)

    # oracle: key64 -> (r_rid, s_rid); rids were permuted with the keys,
    # and keys64(k, perm) assigns key i of run k to rid k*nr + i
    pairs = set()

    def consume(k, rrs, srid, cnt):
        c = np.asarray(cnt)
        assert (c <= 1).all()
        m = c == 1
        pairs.update(zip(np.asarray(rrs)[m].tolist(),
                         np.asarray(srid)[m].tolist()))

    total, ok = join64_rows_keys_ranged_runs(
        rsrc, ssrc, runs, n, n, consume, rows_per_group=8, k_drift=8)
    assert ok and total == n
    # both sides label key i of run k with rid k*nr+i => identity pairs
    assert pairs == {(i, i) for i in range(n)}

    # rank drift: S's matched keys sit 32 surrogate ranks below their R
    # positions (S carries 32 extra low keys per run) -> beyond +-K, the
    # diagonal trips and auto mode retries windowed, staying exact
    def ssrc_shift(k, n_runs):
        idx = np.arange(nr, dtype=np.uint32)
        hi = np.where(idx < nr - 32,
                      np.uint32(k * span) + idx + np.uint32(32),
                      np.uint32(k * span) + np.uint32(nr) + idx)
        lo = np.where(idx < nr - 32, (idx + 32) * np.uint32(7) + 3,
                      np.uint32(1))
        rid = np.arange(k * nr, (k + 1) * nr, dtype=np.uint32)
        p = perms_s[k]
        return (jnp.asarray(hi[p]), jnp.asarray(lo[p]),
                jnp.asarray(rid[p]))

    got = []

    def consume2(k, rrs, srid, cnt):
        got.append(int(np.asarray(cnt).sum()))

    total2, ok2 = join64_rows_keys_ranged_runs(
        rsrc, ssrc_shift, runs, n, n, consume2, rows_per_group=8,
        k_drift=8)
    assert ok2 and total2 == sum(got) == n - 32 * runs
    # explicit diagonal (no retry) must report the drift trip
    total3, ok3 = join64_rows_keys_ranged_runs(
        rsrc, ssrc_shift, runs, n, n, lambda *a: None, rows_per_group=8,
        k_drift=8, emit="diagonal")
    assert not ok3
