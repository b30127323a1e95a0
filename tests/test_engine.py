"""End-to-end single-chip engine tests with the self-validating oracle
(SURVEY.md §4: unique-keys workload => matches == inner size,
reference main.cpp:95-98)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radixjoin_tpu import (JoinConfig, join_count, join_count_checked,
                           total_matches, make_relation)
from radixjoin_tpu.data import relation as gen
from radixjoin_tpu.engine.join import join_rows
from radixjoin_tpu.engine.pipeline import filter_join_aggregate
from radixjoin_tpu.engine.outofcore import join_count_outofcore

CFG = JoinConfig(use_pallas=True)


def _np_join_count(r_keys, s_keys):
    r_u, r_c = np.unique(r_keys, return_counts=True)
    s_u, s_c = np.unique(s_keys, return_counts=True)
    _, ri, si = np.intersect1d(r_u, s_u, return_indices=True)
    return int(np.sum(r_c[ri].astype(np.int64) * s_c[si].astype(np.int64)))


def test_unique_keys_oracle():
    n = 1 << 14
    r = gen.fill_unique(n, jax.random.key(0))
    s = gen.fill_unique(n, jax.random.key(1))
    res = join_count(r, s, CFG)
    assert bool(res.ok)
    assert total_matches(res) == n


def test_modulo_match_rate():
    n_inner, n_outer = 1 << 12, 1 << 14
    r = gen.fill_unique(n_inner, jax.random.key(2))
    s = gen.fill_modulo(n_outer, jax.random.key(3), n_inner)
    res = join_count(r, s, CFG)
    assert bool(res.ok)
    # every outer tuple matches exactly one inner key
    assert total_matches(res) == n_outer


def test_partial_overlap():
    n = 1 << 13
    r = gen.fill_unique(n, jax.random.key(4), start_key=0)
    s = gen.fill_unique(n, jax.random.key(5), start_key=n // 2)
    res = join_count(r, s, CFG)
    assert total_matches(res) == n - n // 2


def test_sortmerge_mode_agrees():
    rng = np.random.default_rng(6)
    r = make_relation(rng.integers(0, 5000, 6000, dtype=np.uint32),
                      np.arange(6000, dtype=np.uint32))
    s = make_relation(rng.integers(0, 5000, 9000, dtype=np.uint32),
                      np.arange(9000, dtype=np.uint32))
    want = _np_join_count(np.asarray(r.keys), np.asarray(s.keys))
    a = total_matches(join_count(r, s, CFG, mode="sortmerge"))
    b = total_matches(join_count(r, s, CFG))
    assert a == want
    assert b == want


def test_mergecount_mode_agrees():
    rng = np.random.default_rng(60)
    r = make_relation(rng.integers(0, 3000, 7000, dtype=np.uint32),
                      np.arange(7000, dtype=np.uint32))
    s = make_relation(rng.integers(0, 3000, 5000, dtype=np.uint32),
                      np.arange(5000, dtype=np.uint32))
    want = _np_join_count(np.asarray(r.keys), np.asarray(s.keys))
    res = join_count(r, s, CFG, mode="mergecount")
    assert bool(res.ok)
    assert total_matches(res) == want


def test_mergecount_skew_aware_and_padding():
    # Heavy keys + padded suffixes: drops must map to side-distinct
    # sentinels so padding never matches, and heavy products aggregate
    # host-side in 64-bit.
    rng = np.random.default_rng(61)
    n = 1 << 13
    rk = rng.integers(0, 500, n, dtype=np.uint32)
    sk = rng.integers(0, 500, n, dtype=np.uint32)
    rk[: n // 4] = 7      # heavy on both sides
    sk[: n // 2] = 7
    r = make_relation(rk, np.arange(n, dtype=np.uint32))
    s = make_relation(sk, np.arange(n, dtype=np.uint32))
    valid_r, valid_s = n - 100, n - 300
    want = _np_join_count(rk[:valid_r], sk[:valid_s])
    res = join_count(r, s, CFG, mode="mergecount", skew_aware=True,
                     r_valid_count=jnp.int32(valid_r),
                     s_valid_count=jnp.int32(valid_s))
    assert total_matches(res) == want


def test_mergecount_empty_sides():
    r = make_relation(np.arange(64, dtype=np.uint32),
                      np.arange(64, dtype=np.uint32))
    empty = make_relation(np.zeros((0,), np.uint32), np.zeros((0,), np.uint32))
    assert total_matches(join_count(r, empty, CFG, mode="mergecount")) == 0
    assert total_matches(join_count(empty, r, CFG, mode="mergecount")) == 0


def test_skew_aware_zipf():
    n = 1 << 14
    r = gen.fill_unique(n, jax.random.key(7))
    s = gen.fill_zipf(n, jax.random.key(8), domain=n, theta=1.2)
    want = _np_join_count(np.asarray(r.keys), np.asarray(s.keys))
    got = join_count_checked(r, s, CFG, skew_aware=True)
    assert got == want


def test_extreme_skew_falls_back():
    # all-equal keys: partitioned path must flag overflow; checked escalates
    n = 1 << 12
    r = make_relation(np.full(n, 42, np.uint32),
                      np.arange(n, dtype=np.uint32))
    s = make_relation(np.full(n, 42, np.uint32),
                      np.arange(n, dtype=np.uint32))
    got = join_count_checked(r, s, CFG)
    assert got == n * n


def test_skew_aware_handles_single_hot_key_without_fallback():
    n = 1 << 14
    hot = n // 4
    rng = np.random.default_rng(9)
    r = gen.fill_unique(n, jax.random.key(10))
    sk = np.concatenate([rng.integers(0, n, n - hot, dtype=np.uint32),
                         np.full(hot, 123, np.uint32)])
    rng.shuffle(sk)
    s = make_relation(sk, np.arange(n, dtype=np.uint32))
    res = join_count(r, s, CFG, skew_aware=True)
    assert bool(res.ok), "heavy-hitter path should prevent tier overflow"
    assert total_matches(res) == _np_join_count(np.asarray(r.keys), sk)


def test_join_rows_unique():
    n = 1 << 10
    r = gen.fill_unique(n, jax.random.key(11))
    s = gen.fill_unique(n, jax.random.key(12))
    out_r, out_s, out_k, valid, total = join_rows(r, s, max_out=2 * n)
    assert int(total) == n
    rk = np.asarray(r.keys)
    sk = np.asarray(s.keys)
    v = np.asarray(valid)
    np.testing.assert_array_equal(rk[np.asarray(out_r)[v]],
                                  sk[np.asarray(out_s)[v]])


@pytest.mark.slow
def test_banded_mode_engine():
    n = 1 << 14
    r = gen.fill_unique(n, jax.random.key(30))
    s = gen.fill_unique(n, jax.random.key(31))
    res = join_count(r, s, CFG, mode="banded")
    assert bool(res.ok)
    assert total_matches(res) == n


@pytest.mark.slow
def test_banded_mode_escalates_on_skew():
    n = 1 << 12
    r = make_relation(np.full(n, 9, np.uint32), np.arange(n, dtype=np.uint32))
    s = make_relation(np.full(n, 9, np.uint32), np.arange(n, dtype=np.uint32))
    got = join_count_checked(r, s, CFG, mode="banded")
    assert got == n * n


def test_diagonal_mode_engine():
    n = 1 << 14
    r = gen.fill_unique(n, jax.random.key(40))
    s = gen.fill_unique(n, jax.random.key(41))
    res = join_count(r, s, CFG, mode="diagonal")
    assert bool(res.ok)
    assert total_matches(res) == n


def test_diagonal_mode_skew_aware_heavy_keys():
    # heavy key removed by the skew pre-pass; the post-drop sides stay
    # near 1:1 (the diagonal path requires locally balanced sides) and the
    # remaining drift fits K
    n = 1 << 12
    hot = n // 8
    rng = np.random.default_rng(42)
    rk = rng.permutation(n).astype(np.uint32)
    sk = np.concatenate([np.full(hot, 7, np.uint32),
                         rng.permutation(n)[:n - hot].astype(np.uint32)])
    r = make_relation(rk, np.arange(n, dtype=np.uint32))
    s = make_relation(sk, np.arange(n, dtype=np.uint32))
    res = join_count(r, s, CFG.replace(diagonal_k=64), mode="diagonal",
                     skew_aware=True)
    assert bool(res.ok)
    assert total_matches(res) == _np_join_count(rk, sk)


@pytest.mark.slow
def test_diagonal_mode_escalates():
    # all-duplicate workload blows the diagonal band AND the banded
    # window; the ladder must land on an exact rung
    n = 1 << 12
    r = make_relation(np.full(n, 9, np.uint32), np.arange(n, dtype=np.uint32))
    s = make_relation(np.full(n, 9, np.uint32), np.arange(n, dtype=np.uint32))
    got = join_count_checked(r, s, CFG, mode="diagonal")
    assert got == n * n
    # moderate-skew workload: escalates diagonal -> banded/tiered only
    rng = np.random.default_rng(43)
    rk = rng.integers(0, 200, n).astype(np.uint32)
    sk = rng.integers(0, 200, n).astype(np.uint32)
    r = make_relation(rk, np.arange(n, dtype=np.uint32))
    s = make_relation(sk, np.arange(n, dtype=np.uint32))
    got = join_count_checked(r, s, CFG, mode="diagonal")
    assert got == _np_join_count(rk, sk)


def test_prepared_diagonal_reuse():
    from radixjoin_tpu.engine.join import (prepare_build_sorted,
                                           join_count_prepared_diagonal)
    n = 1 << 13
    r = gen.fill_unique(n, jax.random.key(70))
    build = prepare_build_sorted(r)
    for seed in (71, 72):
        s = gen.fill_unique(n, jax.random.key(seed))
        matches, ok = join_count_prepared_diagonal(build, s, CFG)
        assert bool(ok)
        assert int(matches) == n


def test_join_rows_auto_overflow_retry():
    from radixjoin_tpu.engine.join import join_rows_auto
    n = 512
    # match rate 8: output 8x inner size, start bound too small
    r = gen.fill_unique(n, jax.random.key(32))
    s = gen.fill_modulo(8 * n, jax.random.key(33), n)
    out_r, out_s, out_k, valid, total = join_rows_auto(
        r, s, start_max_out=1024)
    assert total == 8 * n
    v = np.asarray(valid)
    assert v.sum() == 8 * n
    rk, sk = np.asarray(r.keys), np.asarray(s.keys)
    np.testing.assert_array_equal(rk[np.asarray(out_r)[v]],
                                  sk[np.asarray(out_s)[v]])


@pytest.mark.slow
def test_prepared_build_side_reuse():
    from radixjoin_tpu.engine.join import (prepare_build_side,
                                           join_count_prepared)
    n = 1 << 13
    bits = 6
    r = gen.fill_unique(n, jax.random.key(60))
    build = prepare_build_side(r, bits)
    for seed in (61, 62):
        s = gen.fill_unique(n, jax.random.key(seed))
        matches, ok = join_count_prepared(build, s, CFG, bits=bits)
        assert bool(ok)
        assert int(matches) == n


def test_heavy_product_exceeds_int32():
    # one key with 60K copies on each side: cr*cs = 3.6e9 > 2^31; the
    # skew path must aggregate the product host-side in 64-bit.
    c = 60_000
    n = 1 << 16
    rng = np.random.default_rng(50)
    rk = np.concatenate([np.full(c, 77, np.uint32),
                         rng.integers(1000, 50000, n - c, dtype=np.uint32)])
    sk = np.concatenate([np.full(c, 77, np.uint32),
                         rng.integers(1000, 50000, n - c, dtype=np.uint32)])
    rng.shuffle(rk); rng.shuffle(sk)
    r = make_relation(rk, np.arange(n, dtype=np.uint32))
    s = make_relation(sk, np.arange(n, dtype=np.uint32))
    want = _np_join_count(rk, sk)
    assert want > 2**31
    res = join_count(r, s, CFG, skew_aware=True)
    assert bool(res.ok), "heavy path should absorb the hot key"
    assert total_matches(res) == want


def test_two_level_partitioning_config():
    n = 1 << 13
    r = gen.fill_unique(n, jax.random.key(40))
    s = gen.fill_unique(n, jax.random.key(41))
    cfg2 = CFG.replace(two_level_partitioning=True,
                       network_fanout_bits=3, local_fanout_bits=4)
    res = join_count(r, s, cfg2)
    assert bool(res.ok)
    assert total_matches(res) == n


def test_valid_count_padding():
    n = 1 << 12
    r = gen.fill_unique(n, jax.random.key(13))
    s = gen.fill_unique(n, jax.random.key(14))
    res = join_count(r, s, CFG, r_valid_count=jnp.int32(n // 2),
                     s_valid_count=jnp.int32(n))
    # exactly the first n//2 R rows participate
    want = _np_join_count(np.asarray(r.keys)[: n // 2], np.asarray(s.keys))
    assert total_matches(res) == want


def test_outofcore_matches_inmemory():
    n = 1 << 14
    rng = np.random.default_rng(15)
    rk = rng.integers(0, 10000, n, dtype=np.uint32)
    sk = rng.integers(0, 10000, n, dtype=np.uint32)
    want = _np_join_count(rk, sk)
    for spill in ("host", "device"):
        got = join_count_outofcore(
            rk, np.arange(n, dtype=np.uint32),
            sk, np.arange(n, dtype=np.uint32),
            CFG, coarse_bits=2, chunk=4096, spill=spill)
        assert got == want, spill


def test_outofcore_host_presorted_diagonal():
    # spill="host" + mode="diagonal" drives the zero-device-sort pass 2
    # (_pass2_presorted); duplicate keys exercise the escalation to
    # mergecount for buckets that trip the diagonal coverage check.
    n = 1 << 13
    rng = np.random.default_rng(16)
    rk = rng.permutation(n).astype(np.uint32)          # balanced: diagonal ok
    sk = rng.permutation(n).astype(np.uint32)
    cfg = CFG.replace(diagonal_k=8, diagonal_rows_per_group=8)
    got = join_count_outofcore(
        rk, np.arange(n, dtype=np.uint32), sk, np.arange(n, dtype=np.uint32),
        cfg, coarse_bits=2, spill="host", mode="diagonal")
    assert got == n
    # skewed: heavy dup key forces at least one bucket to escalate
    sk2 = sk.copy()
    sk2[: n // 4] = 7
    want = _np_join_count(rk, sk2)
    got = join_count_outofcore(
        rk, np.arange(n, dtype=np.uint32), sk2, np.arange(n, dtype=np.uint32),
        cfg, coarse_bits=2, spill="host", mode="diagonal")
    assert got == want


def test_ooc_combined_cuts_bound_both_sides():
    # ADVICE r3 (medium): R uniform over the full uint32 domain, S dense
    # over [0, n).  R-only quantile cuts would put ALL of S in bucket 0
    # (pad_s = |S| — the OOC HBM blowup); merged-distribution cuts must
    # bound BOTH sides' largest bucket by ~(|R|+|S|)/n_coarse.
    from radixjoin_tpu.engine.outofcore import _combined_cuts
    n = 1 << 15
    n_coarse = 8
    rng = np.random.default_rng(17)
    rk = np.sort(rng.integers(0, 1 << 32, n, dtype=np.int64)
                 .astype(np.uint32))
    sk = rng.permutation(n).astype(np.uint32)          # dense [0, n)
    cuts = _combined_cuts(rk, sk, n_coarse)
    bound = int(2.5 * (2 * n) / n_coarse)
    for keys in (rk, np.sort(sk)):
        bounds = [0, *np.searchsorted(keys, cuts, side="left").tolist(), n]
        largest = max(bounds[p + 1] - bounds[p] for p in range(n_coarse))
        assert largest <= bound, (largest, bound)
    # and the e2e join over this shape stays exact
    want = _np_join_count(rk, sk)
    got = join_count_outofcore(
        rk, np.arange(n, dtype=np.uint32), sk, np.arange(n, dtype=np.uint32),
        CFG, coarse_bits=3, spill="host")
    assert got == want


def test_ooc_delta_codec_roundtrip():
    # Gap-width-adaptive codec: consecutive keys -> uint8 stream, mid
    # gaps -> uint16, sparse (gap >= 2^16) -> raw fallback.  Every
    # variant decodes to the exact biased sentinel-padded array, with a
    # stream shape that depends only on pad_to (so at most three
    # compiled decodes per size class — the round-3 fix; data-dependent
    # shapes cost a 30-40 s remote compile per bucket).
    from radixjoin_tpu.engine.outofcore import (
        _delta_encode, _decode_staged, _stage)
    from radixjoin_tpu.ops.buildprobe import bias_keys

    pad = 2048
    u8 = (np.arange(1500, dtype=np.uint32) + 77)       # gaps of 1
    u16 = np.sort(np.random.default_rng(3).choice(
        5_000_000, 1500, replace=False)).astype(np.uint32)
    sparse = np.sort(np.random.default_rng(4).choice(
        2**32 - 32, 1500, replace=False).astype(np.uint32))
    want_kind = {0: ("delta", np.uint8), 1: ("delta", np.uint16),
                 2: ("raw", None), 3: ("delta", np.uint8)}
    for i, keys in enumerate((u8, u16, sparse, u16[:1])):
        enc = _delta_encode(keys, pad, 0xFFFFFFFF)
        tag, dt = want_kind[i]
        assert enc[0] == tag, (i, enc[0])
        if dt is not None:
            assert enc[1].dtype == dt, (i, enc[1].dtype)
        assert enc[1].shape == (pad,)
        got = np.asarray(_decode_staged(_stage(enc)))
        want = np.full(pad, 0xFFFFFFFF, np.uint32)
        want[: keys.shape[0]] = keys
        np.testing.assert_array_equal(
            got, np.asarray(bias_keys(jnp.asarray(want))))


def test_pipeline_filter_join_aggregate():
    n = 1 << 12
    r = gen.fill_unique(n, jax.random.key(16))
    s = gen.fill_modulo(n * 2, jax.random.key(17), n)
    res = filter_join_aggregate(
        r, s,
        r_pred=lambda k, rid: k < jnp.uint32(100),
        s_pred=None,
        max_out=4 * n, max_groups=256)
    # keys 0..99 each match exactly 2 outer rows (modulo fill, 2x outer)
    assert int(res.join_count) == 200
    assert int(res.n_groups) == 100
    gk = np.asarray(res.group_keys)[np.asarray(res.group_valid)]
    gs = np.asarray(res.group_sums)[np.asarray(res.group_valid)]
    assert sorted(gk.tolist()) == list(range(100))
    assert np.all(gs == 2)


@pytest.mark.slow
def test_pipeline_fast_and_fallback_agree():
    from radixjoin_tpu.engine.pipeline import _fja_fast, _fja_reference
    n = 1 << 12
    r = gen.fill_unique(n, jax.random.key(16))
    s = gen.fill_modulo(n * 2, jax.random.key(17), n)
    pred = lambda k, rid: k < jnp.uint32(100)
    value_of = lambda rr, sr: (rr % 7 + sr % 5).astype(jnp.int32)
    fast, ok = _fja_fast(r, s, pred, None, 256, value_of)
    assert bool(ok)
    ref = _fja_reference(r, s, pred, None, 4 * n, 256, value_of)
    for a, b in ((fast, ref),):
        ga = {int(k): int(v) for k, v, m in zip(
            np.asarray(a.group_keys), np.asarray(a.group_sums),
            np.asarray(a.group_valid)) if m}
        gb = {int(k): int(v) for k, v, m in zip(
            np.asarray(b.group_keys), np.asarray(b.group_sums),
            np.asarray(b.group_valid)) if m}
        assert ga == gb
    assert int(fast.join_count) == int(ref.join_count)


@pytest.mark.slow
def test_pipeline_multimatch_counting_stays_fast():
    # dim side (r) carries duplicate join keys -> fact rows match 2 dims.
    # Counting aggregations stay on the Pallas fast path (per-row counts
    # are exact under any match rate) and must equal the reference result.
    n = 1 << 10
    rk = np.concatenate([np.arange(n // 2, dtype=np.uint32),
                         np.arange(n // 2, dtype=np.uint32)])
    r = make_relation(rk, np.arange(n, dtype=np.uint32))
    s = gen.fill_modulo(n, jax.random.key(18), n // 2)
    from radixjoin_tpu.engine.pipeline import _fja_fast
    fast, ok = _fja_fast(r, s, None, None, 1024, None)
    assert bool(ok)          # multi-match no longer forces the fallback
    res = filter_join_aggregate(r, s, None, None, max_out=8 * n,
                                max_groups=1024)
    # every s key < n/2 matches exactly 2 r rows
    assert int(res.join_count) == 2 * n
    gs = np.asarray(res.group_sums)[np.asarray(res.group_valid)]
    assert int(res.n_groups) == n // 2
    assert np.all(np.sort(gs) == np.sort(
        np.asarray(jnp.bincount(s.keys % (n // 2), length=n // 2)) * 2))


@pytest.mark.slow
def test_pipeline_multimatch_payload_falls_back():
    # With a payload value_of, emitted rids are rid-sums where cnt > 1 —
    # the fast path must flag ok=False and the wrapper must produce the
    # reference result via the gather materialisation.
    n = 1 << 10
    rk = np.concatenate([np.arange(n // 2, dtype=np.uint32),
                         np.arange(n // 2, dtype=np.uint32)])
    r = make_relation(rk, np.arange(n, dtype=np.uint32))
    s = gen.fill_modulo(n, jax.random.key(19), n // 2)
    value_of = lambda rr, sr: (rr % 7 + sr % 5).astype(jnp.int32)
    from radixjoin_tpu.engine.pipeline import _fja_fast, _fja_reference
    _, ok = _fja_fast(r, s, None, None, 1024, value_of)
    assert not bool(ok)
    res = filter_join_aggregate(r, s, None, None, max_out=8 * n,
                                max_groups=1024, value_of=value_of)
    ref = _fja_reference(r, s, None, None, 8 * n, 1024, value_of)
    ga = {int(k): int(v) for k, v, m in zip(
        np.asarray(res.group_keys), np.asarray(res.group_sums),
        np.asarray(res.group_valid)) if m}
    gb = {int(k): int(v) for k, v, m in zip(
        np.asarray(ref.group_keys), np.asarray(ref.group_sums),
        np.asarray(ref.group_valid)) if m}
    assert ga == gb and int(res.join_count) == int(ref.join_count)


@pytest.mark.slow
def test_pipeline_ranged_runs():
    # The windowed-emit interpret-mode compile is large; on top of ~50
    # tests' accumulated XLA:CPU code mappings it segfaults LLVM (the
    # vm.max_map_count class, cf. conftest) — start from a clean cache.
    jax.clear_caches()
    # filter->join->aggregate at beyond-sort-cap scale via ranged runs:
    # per-run groups are disjoint (GROUP BY key lives in one run); the
    # dup-dim variant forces the M-plane rung inside a run.
    from radixjoin_tpu.engine.pipeline import filter_join_aggregate_ranged_runs
    n = 1 << 12
    runs = 2
    nr = n // runs
    rng = np.random.default_rng(61)

    def make_sources(dim_dup):
        def r_source(k, n_runs):
            keys = (rng.permutation(nr).astype(np.uint32) + k * nr)
            keys = np.tile(keys, dim_dup)
            rids = np.arange(keys.size, dtype=np.uint32) + k * keys.size
            return jnp.asarray(keys), jnp.asarray(rids)

        def s_source(k, n_runs):
            keys = (rng.integers(0, nr, 2 * nr).astype(np.uint32) + k * nr)
            rids = np.arange(keys.size, dtype=np.uint32) + k * keys.size
            return jnp.asarray(keys), jnp.asarray(rids)
        return r_source, s_source

    # counting aggregation, unique dims: fast path per run
    rng = np.random.default_rng(61)
    r_source, s_source = make_sources(1)
    seen = {}

    def consume(k, res):
        gk = np.asarray(res.group_keys)[np.asarray(res.group_valid)]
        gs = np.asarray(res.group_sums)[np.asarray(res.group_valid)]
        lo, hi = k * nr, (k + 1) * nr
        assert ((gk >= lo) & (gk < hi)).all()     # disjointness
        for a, b in zip(gk.tolist(), gs.tolist()):
            assert a not in seen
            seen[a] = b

    total, ngroups, ok = filter_join_aggregate_ranged_runs(
        r_source, s_source, runs, n, None, None,
        max_out=8 * n, max_groups=2 * n, consume=consume)
    assert ok and total == 2 * n       # 2*nr fact rows per run, all match
    assert ngroups == len(seen)

    # payload aggregation with dup=2 dims: every fact row matches 2 dim
    # rows -> the fast path flips, the M-plane rung must carry each run
    rng = np.random.default_rng(61)
    r_source, s_source = make_sources(2)
    value_of = lambda rr, sr: (rr % 7 + sr % 5).astype(jnp.int32)
    # numpy oracle over the SAME drawn workload
    rng2 = np.random.default_rng(61)
    want = {}
    want_total = 0
    for k in range(runs):
        rk = np.tile(rng2.permutation(nr).astype(np.uint32) + k * nr, 2)
        rr_ = np.arange(rk.size, dtype=np.uint32) + k * rk.size
        sk = rng2.integers(0, nr, 2 * nr).astype(np.uint32) + k * nr
        sr_ = np.arange(sk.size, dtype=np.uint32) + k * sk.size
        by_key = {}
        for kk, rid in zip(rk.tolist(), rr_.tolist()):
            by_key.setdefault(kk, []).append(rid)
        for kk, srid in zip(sk.tolist(), sr_.tolist()):
            for rrid in by_key[kk]:
                want[kk] = want.get(kk, 0) + (rrid % 7 + srid % 5)
                want_total += 1
    consume2 = []
    total, ngroups, ok = filter_join_aggregate_ranged_runs(
        r_source, s_source, runs, n, None, None,
        max_out=16 * n, max_groups=2 * n, value_of=value_of,
        consume=lambda k, res: consume2.append((k, res)))
    assert ok and total == want_total
    got = {}
    for k, res in consume2:
        gk = np.asarray(res.group_keys)[np.asarray(res.group_valid)]
        gs = np.asarray(res.group_sums)[np.asarray(res.group_valid)]
        for a, b in zip(gk.tolist(), gs.tolist()):
            got[a] = got.get(a, 0) + b
    assert got == want


def test_inhbm_keys_join():
    # Phased keys-only large-N path (engine/large.py): oracle + agreement
    # with the general engine on random multiplicity data.
    from radixjoin_tpu.engine.large import (join_count_keys_inhbm,
                                            gen_unique_keys)
    n = 1 << 13
    rk = gen_unique_keys(n, 2654435761 | 1)
    sk = gen_unique_keys(n, 0x9E3779B1 ^ 0x40)
    assert len(np.unique(np.asarray(rk))) == n  # bijection really is one
    m, ok = join_count_keys_inhbm(rk, sk)
    assert bool(ok) and int(m) == n

    # Multiplicity data: must agree with the general engine's diagonal mode
    # — same ok verdict, and when ok holds, the exact count (ok False means
    # the rank band overflowed and the caller must escalate, so the count
    # is not contractual there).
    rng = np.random.default_rng(11)
    rk = rng.integers(0, 4 * n, n, dtype=np.uint32)
    sk = rng.integers(0, 4 * n, n, dtype=np.uint32)
    want = _np_join_count(rk, sk)
    m, ok = join_count_keys_inhbm(jnp.asarray(rk), jnp.asarray(sk))
    res = join_count(make_relation(rk, np.arange(n, dtype=np.uint32)),
                     make_relation(sk, np.arange(n, dtype=np.uint32)),
                     CFG, mode="diagonal")
    assert bool(ok) == bool(res.ok)
    assert int(m) == total_matches(res)
    if bool(ok):
        assert int(m) == want


def test_inhbm_runs_decomposition():
    # Sorted-run decomposition (engine/large.py join_count_keys_runs):
    # every (r, s) match lands in exactly one run pair, so the pair-sum
    # equals the flat join on both oracle and multiplicity data.
    from radixjoin_tpu.engine.large import (join_count_keys_runs,
                                            gen_unique_keys)
    n = 1 << 13
    rk = gen_unique_keys(n, 2654435761 | 1)
    sk = gen_unique_keys(n, 0x9E3779B1 ^ 0x40)
    m, ok = join_count_keys_runs(rk, sk, r_runs=2, s_runs=2)
    assert bool(ok) and int(m) == n

    rng = np.random.default_rng(5)
    rk = rng.integers(0, 4 * n, n, dtype=np.uint32)
    sk = rng.integers(0, 4 * n, n, dtype=np.uint32)
    want = _np_join_count(rk, sk)
    m, ok = join_count_keys_runs(jnp.asarray(rk), jnp.asarray(sk),
                                 r_runs=2, s_runs=2)
    if bool(ok):
        assert int(m) == want


def test_inhbm_ranged_runs():
    # Value-range-partitioned runs (engine/large.py ranged_domain): only
    # diagonal pairs are probed; the union over runs is still the dense
    # key set so matches == n, and the on-device range check guards the
    # declaration.
    from radixjoin_tpu.engine.large import (join_count_keys_runs,
                                            gen_unique_keys_ranged_run,
                                            gen_unique_keys_run)
    n = 1 << 13
    rsrc = gen_unique_keys_ranged_run(n, 2654435761 | 1)
    ssrc = gen_unique_keys_ranged_run(n, 0x9E3779B1 ^ 0x40)
    # each run really is a bijection over its subrange
    got = np.sort(np.asarray(rsrc(1, 4)))
    np.testing.assert_array_equal(got, np.arange(n // 4, dtype=np.uint32)
                                  + np.uint32(n // 4))
    m, ok = join_count_keys_runs(rsrc, ssrc, r_runs=2, s_runs=2,
                                 n_r_total=n, n_s_total=n,
                                 ranged_domain=n)
    assert bool(ok) and int(m) == n

    # sources that VIOLATE the range declaration (position-sliced, not
    # range-partitioned) must be caught by the on-device check and fall
    # back to the exact all-pairs decomposition
    rsrc_bad = gen_unique_keys_run(n, 2654435761 | 1)
    ssrc_bad = gen_unique_keys_run(n, 0x9E3779B1 ^ 0x40)
    m, ok = join_count_keys_runs(rsrc_bad, ssrc_bad, r_runs=2, s_runs=2,
                                 n_r_total=n, n_s_total=n,
                                 ranged_domain=n)
    assert bool(ok) and int(m) == n

    # mixed sources (one side honours the declaration, the other does
    # not): the fallback's diagonal pairs see locally unbalanced sides
    # and must trip ok rather than return a wrong count silently
    m, ok = join_count_keys_runs(rsrc, ssrc_bad, r_runs=2, s_runs=2,
                                 n_r_total=n, n_s_total=n,
                                 ranged_domain=n)
    assert (not bool(ok)) or int(m) == n


@pytest.mark.slow
def test_large_rows_materialize():
    # The windowed-emit interpret-mode compile is large; on top of ~50
    # tests' accumulated XLA:CPU code mappings it segfaults LLVM (the
    # vm.max_map_count class, cf. conftest) — start from a clean cache.
    jax.clear_caches()
    # Large-N materialising join (engine/large.py join_rows_keys_inhbm +
    # ranged runs): dense per-sorted-R output, bit-exact row pairing.
    from radixjoin_tpu.engine.large import (join_rows_keys_inhbm,
                                            join_rows_keys_ranged_runs,
                                            gen_unique_tuples_ranged_run)
    n = 1 << 13
    rng = np.random.default_rng(60)
    rk = rng.permutation(n).astype(np.uint32)
    sk = rng.permutation(n).astype(np.uint32)
    rr = np.arange(n, dtype=np.uint32)
    out = join_rows_keys_inhbm(jnp.asarray(rk), jnp.asarray(rr),
                               jnp.asarray(sk), jnp.asarray(rr),
                               rows_per_group=8)
    r_rid, s_rid, cnt, win_ok, multi = map(np.asarray, out)
    assert bool(win_ok) and not bool(multi)
    assert (cnt == 1).all()
    # bit-exact pairing: the matched rows really carry equal keys,
    # and every row of each side appears exactly once
    np.testing.assert_array_equal(rk[r_rid], sk[s_rid])
    assert len(set(r_rid.tolist())) == n and len(set(s_rid.tolist())) == n

    # multi-match keys: counts stay exact, multi flag raised
    sk2 = sk.copy()
    sk2[sk2 == 7] = 3  # key 3 now appears twice, key 7 vanishes
    out = join_rows_keys_inhbm(jnp.asarray(rk), jnp.asarray(rr),
                               jnp.asarray(sk2), jnp.asarray(rr),
                               rows_per_group=8)
    _, _, cnt, win_ok, multi = map(np.asarray, out)
    assert bool(win_ok) and bool(multi)
    assert cnt.sum() == n  # n-2 unique + 2 for key 3 + 0 for key 7

    # ranged runs wrapper: every pair's rows verified against the
    # generator's rid -> key bijection
    runs = 2
    nr = n // runs
    odd_r, odd_s = 2654435761 | 1, 0x9E3779B1 ^ 0x40
    rsrc = gen_unique_tuples_ranged_run(n, odd_r)
    ssrc = gen_unique_tuples_ranged_run(n, odd_s)

    def key_of(rid, odd):
        return ((rid % nr) * odd) % nr + (rid // nr) * nr

    seen_r = []

    def consume(k, rrs, srid, cnt):
        rrs, srid, cnt = map(np.asarray, (rrs, srid, cnt))
        assert (cnt == 1).all()
        np.testing.assert_array_equal(
            key_of(rrs.astype(np.int64), odd_r),
            key_of(srid.astype(np.int64), odd_s))
        seen_r.extend(rrs.tolist())

    total, ok = join_rows_keys_ranged_runs(rsrc, ssrc, runs, n, n, n,
                                           consume, rows_per_group=8)
    assert ok and total == n
    assert len(set(seen_r)) == n


def test_skew_runs_decomposition():
    # Pair-decomposed skew-aware mergecount (engine/large.py): exact on
    # Zipf-skewed data including a dominant heavy key, vs the numpy oracle.
    from radixjoin_tpu.engine.large import (join_count_keys_skew_runs,
                                            gen_unique_keys_run,
                                            gen_zipf_keys_run)
    n = 1 << 13
    rsrc = gen_unique_keys_run(n, 2654435761 | 1)
    ssrc = gen_zipf_keys_run(n, domain=n, theta=1.05, seed=9)
    got, ok = join_count_keys_skew_runs(rsrc, ssrc, 2, 2, n, n)
    # dense-unique R over [0, n) x S keys in [0, n): every S row matches
    assert ok and got == n

    # multiplicity both sides incl. a heavy key on each
    rng = np.random.default_rng(3)
    rk = rng.integers(0, 900, n, dtype=np.uint32)
    sk = rng.integers(0, 900, n, dtype=np.uint32)
    rk[: n // 6] = 13
    sk[: n // 3] = 13
    want = _np_join_count(rk, sk)
    rj, sj = jnp.asarray(rk), jnp.asarray(sk)
    rsrc = lambda i, nr: rj[i * (n // nr):(i + 1) * (n // nr)]
    ssrc = lambda j, ns: sj[j * (n // ns):(j + 1) * (n // ns)]
    got, ok = join_count_keys_skew_runs(rsrc, ssrc, 2, 2, n, n)
    assert ok and got == want


def test_pipeline_multimatch_payload_multi_rung():
    # The M-plane interpret-mode compile is large; on top of ~50 tests'
    # accumulated XLA:CPU code mappings it segfaults LLVM (the
    # vm.max_map_count class, cf. conftest) — start from a clean cache.
    jax.clear_caches()
    # Match rate 2 <= max_matches: the M-plane middle rung must hold
    # (ok=True) and agree with the reference materialisation.
    n = 1 << 10
    rk = np.concatenate([np.arange(n // 2, dtype=np.uint32),
                         np.arange(n // 2, dtype=np.uint32)])
    r = make_relation(rk, np.arange(n, dtype=np.uint32))
    s = gen.fill_modulo(n, jax.random.key(21), n // 2)
    value_of = lambda rr, sr: (rr % 7 + sr % 5).astype(jnp.int32)
    from radixjoin_tpu.engine.pipeline import _fja_multi, _fja_reference
    res, ok = _fja_multi(r, s, None, None, 1024, value_of)
    assert bool(ok)
    ref = _fja_reference(r, s, None, None, 8 * n, 1024, value_of)
    ga = {int(k): int(v) for k, v, m in zip(
        np.asarray(res.group_keys), np.asarray(res.group_sums),
        np.asarray(res.group_valid)) if m}
    gb = {int(k): int(v) for k, v, m in zip(
        np.asarray(ref.group_keys), np.asarray(ref.group_sums),
        np.asarray(ref.group_valid)) if m}
    assert ga == gb and int(res.join_count) == int(ref.join_count)


@pytest.mark.slow
def test_pipeline_multimatch_beyond_m_falls_back():
    # The M-plane interpret-mode compile is large; on top of ~50 tests'
    # accumulated XLA:CPU code mappings it segfaults LLVM (the
    # vm.max_map_count class, cf. conftest) — start from a clean cache.
    jax.clear_caches()
    # Match rate 6 > max_matches=4: the multi rung must flag overflow and
    # filter_join_aggregate must still return the exact reference result.
    n = 1 << 9
    rk = np.tile(np.arange(n // 8, dtype=np.uint32), 6)
    r = make_relation(rk, np.arange(len(rk), dtype=np.uint32))
    s = gen.fill_modulo(n, jax.random.key(22), n // 8)
    value_of = lambda rr, sr: (rr % 7 + sr % 5).astype(jnp.int32)
    from radixjoin_tpu.engine.pipeline import _fja_multi, _fja_reference
    _, ok = _fja_multi(r, s, None, None, 1024, value_of)
    assert not bool(ok)
    res = filter_join_aggregate(r, s, None, None, max_out=16 * n,
                                max_groups=1024, value_of=value_of)
    ref = _fja_reference(r, s, None, None, 16 * n, 1024, value_of)
    ga = {int(k): int(v) for k, v, m in zip(
        np.asarray(res.group_keys), np.asarray(res.group_sums),
        np.asarray(res.group_valid)) if m}
    gb = {int(k): int(v) for k, v, m in zip(
        np.asarray(ref.group_keys), np.asarray(ref.group_sums),
        np.asarray(ref.group_valid)) if m}
    assert ga == gb


def test_join_rows_skew_runs_full_rowset():
    """Round-5 skew-aware materialising ranged-runs join (VERDICT r4
    item 3): heavy blocks + M-plane light rows reconstruct EXACTLY the
    oracle row set under a Zipf-shaped hot/mid-tail/unique workload."""
    from radixjoin_tpu.engine.large import (join_rows_keys_skew_runs,
                                            gen_unique_tuples_ranged_run)
    runs = 2
    n = 1 << 13
    nr = n // runs
    span = n // runs
    rng = np.random.default_rng(50)

    # R: dense unique ranged (rids = global row index)
    rsrc = gen_unique_tuples_ranged_run(n, 2654435761 | 1)
    rk_all = np.concatenate(
        [np.asarray(rsrc(k, runs)[0]) for k in range(runs)])
    rr_all = np.concatenate(
        [np.asarray(rsrc(k, runs)[1]) for k in range(runs)])

    # S per run: hot key (30%) + mid-tail keys with <= 3 copies + uniques
    s_keys, s_rids = [], []
    for k in range(runs):
        lo = k * span
        hot = np.full(nr * 3 // 10, lo + 5, np.uint32)
        n_mid = nr * 3 // 10 // 3
        # DISTINCT mid-tail keys (x3 each) and collision-free uniques:
        # any accidental >max_matches multiplicity would trip overflow
        mid = np.repeat(
            (lo + 10 + np.arange(n_mid, dtype=np.uint32)), 3)
        uni_pool = np.arange(lo + 10 + n_mid, lo + span, dtype=np.uint32)
        uni = rng.choice(uni_pool, nr - len(hot) - len(mid),
                         replace=False).astype(np.uint32)
        sk = np.concatenate([hot, mid, uni])
        rng.shuffle(sk)
        s_keys.append(sk)
        s_rids.append(np.arange(k * nr, (k + 1) * nr, dtype=np.uint32))
    sk_all = np.concatenate(s_keys)
    sr_all = np.concatenate(s_rids)

    def ssrc(k, n_runs):
        return jnp.asarray(s_keys[k]), jnp.asarray(s_rids[k])

    # numpy oracle pair set
    key2rrid = {int(kk): int(rr) for kk, rr in zip(rk_all, rr_all)}
    want = {(key2rrid[int(kk)], int(rr))
            for kk, rr in zip(sk_all, sr_all) if int(kk) in key2rrid}
    assert len(want) == n  # every S row joins exactly one R row

    got = set()

    def consume(k, rrs, rid_planes, cnt):
        c = np.asarray(cnt)
        rr = np.asarray(rrs)
        planes = np.asarray(rid_planes)
        for j in range(planes.shape[0]):
            m = c > j
            got.update(zip(rr[m].tolist(), planes[j][m].tolist()))

    coll = []
    total, ok = join_rows_keys_skew_runs(
        rsrc, ssrc, runs, n, n, n, consume, collector_out=coll,
        max_matches=4, max_heavy_per_run=64)
    assert ok, "windows/match-rate/range must hold for this workload"
    for key, (hr, hs) in coll[0].blocks().items():
        for b in hs.tolist():
            got.add((key2rrid[int(key)], b))
        # heavy R side: dense-unique R => exactly one R row per heavy key
        assert len(hr) == 1 and key2rrid[int(key)] == int(hr[0])
    assert total == len(want) == len(got)
    assert got == want


def test_outofcore_modulo_protocol():
    """The 4B x 4B BASELINE driver's self-validating workload at test
    scale: fill_modulo(n, n // dup) puts exactly dup copies of each of
    n/dup keys on each side, so matches == (n/dup) * dup^2 with no
    oracle pass over the data (the only exact form once n exceeds the
    u32 key domain; benchmarks/tpu_ooc_check.py --workload modulo)."""
    from radixjoin_tpu import native
    n = 1 << 13
    dup = 2
    inner = n // dup
    rk, _ = native.fill_modulo(n, inner, seed=40)
    sk, _ = native.fill_modulo(n, inner, seed=41)
    want = inner * dup * dup
    got = join_count_outofcore(
        rk, np.empty(0, np.uint32), sk, np.empty(0, np.uint32),
        CFG, coarse_bits=5, spill="host", mode="diagonal")
    assert got == want


def test_rows_ranged_runs_drift_retries_windowed():
    """Auto emit selection must not be weaker than the windowed default:
    a rank-drifted pair (S = R keys + 32 -> every match sits 32 ranks
    off the diagonal, beyond k_drift) trips the diagonal emit's coverage
    check; auto mode retries through the windowed kernel and stays
    exact, while an explicit emit="diagonal" reports the trip."""
    from radixjoin_tpu.engine.large import join_rows_keys_ranged_runs
    n = 1 << 12
    rng = np.random.default_rng(60)
    rk = rng.permutation(n).astype(np.uint32)
    sk = (rng.permutation(n).astype(np.uint32) + np.uint32(32))
    rr = np.arange(n, dtype=np.uint32)

    def rsrc(k, runs):
        return jnp.asarray(rk), jnp.asarray(rr)

    def ssrc(k, runs):
        return jnp.asarray(sk), jnp.asarray(rr)

    rows = []

    def consume(k, rrs, srid, cnt):
        c = np.asarray(cnt)
        assert (c <= 1).all()
        rows.append(int(c.sum()))

    total, ok = join_rows_keys_ranged_runs(
        rsrc, ssrc, 1, n, n, n + 32, consume, rows_per_group=8,
        k_drift=8)
    assert ok and total == n - 32 and sum(rows) == n - 32
    total_d, ok_d = join_rows_keys_ranged_runs(
        rsrc, ssrc, 1, n, n, n + 32, lambda *a: None, rows_per_group=8,
        k_drift=8, emit="diagonal")
    assert not ok_d
