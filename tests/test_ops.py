"""Single-device kernel tests vs NumPy oracles
(SURVEY.md §4 test-pyramid layer (b))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radixjoin_tpu.data.tuples import Relation, make_relation
from radixjoin_tpu.data import relation as gen
from radixjoin_tpu.ops import histogram as hist
from radixjoin_tpu.ops import partition as part
from radixjoin_tpu.ops import buildprobe as bp
from radixjoin_tpu.ops import sort as sort_ops
from radixjoin_tpu.ops import filter as filter_ops
from radixjoin_tpu.ops import aggregate as agg
from radixjoin_tpu.ops import skew as skew_ops


def _rand_rel(n, key_max, seed):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, key_max, n, dtype=np.uint32)
    return make_relation(keys, np.arange(n, dtype=np.uint32)), keys


# -------------------------- histogram --------------------------

@pytest.mark.parametrize("n,bins", [(1000, 32), (4096, 32), (100, 8),
                                    (8192, 256)])
def test_histogram_onehot(n, bins):
    rng = np.random.default_rng(0)
    pids = rng.integers(0, bins, n).astype(np.int32)
    want = np.bincount(pids, minlength=bins)
    got = np.asarray(hist.histogram_onehot(jnp.asarray(pids), bins))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n,bins", [(1000, 32), (70000, 32), (512, 128)])
def test_histogram_pallas(n, bins):
    rng = np.random.default_rng(1)
    pids = rng.integers(0, bins, n).astype(np.int32)
    want = np.bincount(pids, minlength=bins)
    got = np.asarray(hist.histogram_pallas(jnp.asarray(pids), bins,
                                           chunk=4096))
    np.testing.assert_array_equal(got, want)


def test_histogram_sorted():
    rng = np.random.default_rng(2)
    pids = np.sort(rng.integers(0, 64, 5000)).astype(np.int32)
    counts, starts = hist.histogram_sorted(jnp.asarray(pids), 64)
    want = np.bincount(pids, minlength=64)
    np.testing.assert_array_equal(np.asarray(counts), want)
    np.testing.assert_array_equal(np.asarray(starts),
                                  np.cumsum(want) - want)


# -------------------------- partition --------------------------

def test_partition_relation_layout():
    rel, keys = _rand_rel(10000, 2**32 - 1, 3)
    bits = 5
    p = part.partition_relation(rel, bits)
    pk = np.asarray(p.keys)
    starts, counts = np.asarray(p.starts), np.asarray(p.counts)
    # every partition slice contains exactly the keys with that radix
    for pid in range(1 << bits):
        sl = pk[starts[pid]:starts[pid] + counts[pid]]
        assert np.all(sl % (1 << bits) == pid)
    # multiset of (key, rid) preserved
    got = np.sort(np.asarray(p.keys).astype(np.uint64) << np.uint64(32)
                  | np.asarray(p.rids))
    want = np.sort(keys.astype(np.uint64) << np.uint64(32)
                   | np.arange(10000, dtype=np.uint64))
    np.testing.assert_array_equal(got, want)


def test_partition_drop_mask():
    rel, keys = _rand_rel(5000, 1000, 4)
    drop = jnp.asarray((keys % 7 == 0))
    p = part.partition_relation(rel, 4, drop_mask=drop)
    assert int(np.sum(np.asarray(p.counts))) == int((keys % 7 != 0).sum())
    kept = np.asarray(p.keys)[: int(np.sum(np.asarray(p.counts)))]
    assert np.all(kept % 7 != 0)


def test_partition_two_level_equals_single():
    rel, _ = _rand_rel(8192, 2**20, 5)
    a = part.partition_two_level(rel, 3, 4)
    b = part.partition_relation(rel, 7)
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    np.testing.assert_array_equal(np.asarray(a.keys), np.asarray(b.keys))


def test_partition_chunked_matches_monolithic():
    rel, _ = _rand_rel(10000, 2**16, 6)
    a = part.partition_chunked(rel, 6, chunk_tuples=2048)
    b = part.partition_relation(rel, 6)
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    # same multiset per partition
    for pid in range(64):
        s, c = int(b.starts[pid]), int(b.counts[pid])
        np.testing.assert_array_equal(
            np.sort(np.asarray(a.keys[s:s + c])),
            np.sort(np.asarray(b.keys[s:s + c])))


def test_partition_by_key_order():
    rel, keys = _rand_rel(4096, 2**20, 17)
    p = part.partition_by_key_order(rel, 4)
    pk = np.asarray(p.keys)
    starts, counts = np.asarray(p.starts), np.asarray(p.counts)
    for pid in range(16):
        seg = pk[starts[pid]:starts[pid] + counts[pid]]
        assert np.all(seg % 16 == pid)
        assert np.all(np.diff(seg.astype(np.int64)) >= 0), "key-sorted within"
    np.testing.assert_array_equal(np.sort(pk), np.sort(keys))


def test_partition_keys_rotated_matches_general():
    rel, keys = _rand_rel(4096, 2**31, 18)
    bits = 5
    a = part.partition_keys_rotated(rel.keys, bits)
    b = part.partition_relation(rel, bits)
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    np.testing.assert_array_equal(np.asarray(a.starts), np.asarray(b.starts))
    # rotated keys un-rotate to the same per-partition key multisets
    rot = 32 - bits
    unrot = ((np.asarray(a.keys) >> rot)
             | (np.asarray(a.keys) << bits)).astype(np.uint32)
    for pid in range(1 << bits):
        s, c = int(b.starts[pid]), int(b.counts[pid])
        np.testing.assert_array_equal(np.sort(unrot[s:s + c]),
                                      np.sort(np.asarray(b.keys[s:s + c])))


def test_gather_padded():
    rel, _ = _rand_rel(1000, 256, 7)
    p = part.partition_relation(rel, 4)
    cap = int(np.max(np.asarray(p.counts))) + 8
    keys2d, rids2d, valid = part.gather_padded_partitions(p, cap)
    for pid in range(16):
        c = int(p.counts[pid])
        s = int(p.starts[pid])
        np.testing.assert_array_equal(np.asarray(keys2d[pid, :c]),
                                      np.asarray(p.keys[s:s + c]))
        assert not np.any(np.asarray(valid[pid, c:]))


# -------------------------- build/probe --------------------------

def _np_join_count(r_keys, s_keys):
    r_u, r_c = np.unique(r_keys, return_counts=True)
    s_u, s_c = np.unique(s_keys, return_counts=True)
    common, ri, si = np.intersect1d(r_u, s_u, return_indices=True)
    return int(np.sum(r_c[ri].astype(np.int64) * s_c[si].astype(np.int64)))


def test_probe_count_sorted_oracle():
    rng = np.random.default_rng(8)
    r = rng.integers(0, 500, 3000).astype(np.uint32)
    s = rng.integers(0, 500, 4000).astype(np.uint32)
    got = int(bp.probe_count_reference(jnp.asarray(r), jnp.asarray(s)))
    assert got == _np_join_count(r, s)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_probe_count_partitioned(use_pallas):
    rng = np.random.default_rng(9)
    r = rng.integers(0, 2000, 4096).astype(np.uint32)
    s = rng.integers(0, 2000, 8192).astype(np.uint32)
    bits = 4
    rp = part.partition_relation(make_relation(r, np.arange(4096)), bits)
    sp = part.partition_relation(make_relation(s, np.arange(8192)), bits)
    cap_r = int(np.max(np.asarray(rp.counts)))
    cap_s = int(np.max(np.asarray(sp.counts)))
    cap_r = ((cap_r + 127) // 128) * 128
    cap_s = ((cap_s + 127) // 128) * 128
    counts = bp.probe_count_partitioned(rp, sp, cap_r, cap_s, tile=256,
                                        use_pallas=use_pallas)
    assert int(np.sum(np.asarray(counts), dtype=np.int64)) == \
        _np_join_count(r, s)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_probe_count_tiered_with_skewed_partitions(use_pallas):
    rng = np.random.default_rng(10)
    # partition 0 is ~10x the mean: exercise tier escalation
    r = np.concatenate([rng.integers(0, 2**16, 2048),
                        np.zeros(1024)]).astype(np.uint32)
    s = np.concatenate([rng.integers(0, 2**16, 2048),
                        np.zeros(1024)]).astype(np.uint32)
    bits = 4
    rp = part.partition_relation(make_relation(r, np.arange(r.size)), bits)
    sp = part.partition_relation(make_relation(s, np.arange(s.size)), bits)
    total, ok = bp.probe_count_tiered(rp, sp, cap_r=256, cap_s=256,
                                      n_tiers=3, tile=128,
                                      use_pallas=use_pallas)
    assert bool(ok)
    assert int(total) == _np_join_count(r, s)


def test_probe_tiered_overflow_flag():
    # all keys identical -> one partition of everything, overflows tiers
    r = np.zeros(4096, dtype=np.uint32)
    s = np.zeros(4096, dtype=np.uint32)
    rp = part.partition_relation(make_relation(r, np.arange(4096)), 4)
    sp = part.partition_relation(make_relation(s, np.arange(4096)), 4)
    _, ok = bp.probe_count_tiered(rp, sp, cap_r=128, cap_s=128, n_tiers=2,
                                  use_pallas=False)
    assert not bool(ok)


def test_join_materialize():
    rng = np.random.default_rng(11)
    r = rng.integers(0, 100, 300).astype(np.uint32)
    s = rng.integers(0, 100, 400).astype(np.uint32)
    want = _np_join_count(r, s)
    out_r, out_s, out_k, valid, total = bp.join_materialize(
        jnp.asarray(r), jnp.asarray(np.arange(300, dtype=np.uint32)),
        jnp.asarray(s), jnp.asarray(np.arange(400, dtype=np.uint32)),
        max_out=8192)
    assert int(total) == want
    assert int(np.sum(np.asarray(valid))) == want
    # spot-check: every emitted pair actually joins
    orr = np.asarray(out_r)[np.asarray(valid)]
    oss = np.asarray(out_s)[np.asarray(valid)]
    np.testing.assert_array_equal(r[orr], s[oss])
    # pair multiset is exactly the cross product per key
    pairs = set(zip(orr.tolist(), oss.tolist()))
    assert len(pairs) == want


def test_probe_count_banded():
    rng = np.random.default_rng(20)
    r = rng.integers(0, 3000, 4096).astype(np.uint32)
    s = rng.integers(0, 3000, 8192).astype(np.uint32)
    bits = 5   # mean partition = 128/256
    rp = part.partition_relation(make_relation(r, np.arange(4096)), bits)
    sp = part.partition_relation(make_relation(s, np.arange(8192)), bits)
    total, ok = bp.probe_count_banded(rp, sp, window_rows=10, band_blocks=14,
                                      rows_per_group=32)
    assert bool(ok)
    assert int(total) == _np_join_count(r, s)


def test_probe_count_banded_with_drop_mask():
    rng = np.random.default_rng(21)
    r = rng.integers(0, 3000, 4096).astype(np.uint32)
    s = rng.integers(0, 3000, 4096).astype(np.uint32)
    drop_r = jnp.asarray(r % 5 == 0)
    drop_s = jnp.asarray(s % 7 == 0)
    bits = 5
    rp = part.partition_relation(make_relation(r, np.arange(4096)), bits,
                                 drop_mask=drop_r)
    sp = part.partition_relation(make_relation(s, np.arange(4096)), bits,
                                 drop_mask=drop_s)
    total, ok = bp.probe_count_banded(rp, sp, window_rows=6, band_blocks=4,
                                      rows_per_group=8)
    assert bool(ok)
    want = _np_join_count(r[r % 5 != 0], s[s % 7 != 0])
    assert int(total) == want
    # reference-path agreement
    assert int(bp.probe_count_banded_reference(rp, sp)) == want


def test_probe_count_banded_overflow_flag():
    # single giant partition: window bound must trip
    r = np.zeros(4096, dtype=np.uint32)
    s = np.zeros(4096, dtype=np.uint32)
    rp = part.partition_relation(make_relation(r, np.arange(4096)), 5)
    sp = part.partition_relation(make_relation(s, np.arange(4096)), 5)
    _, ok = bp.probe_count_banded(rp, sp, window_rows=4, band_blocks=2,
                                     rows_per_group=8)
    assert not bool(ok)


def _diag_sorted(keys, drop=None, sentinel=0xFFFFFFFF):
    return jnp.sort(bp.bias_keys(jnp.asarray(keys), drop, sentinel))


def test_probe_count_diagonal_unique_dense():
    # the self-validating workload: both sides permutations of one range
    rng = np.random.default_rng(30)
    r = rng.permutation(8192).astype(np.uint32)
    s = rng.permutation(8192).astype(np.uint32)
    total, ok = bp.probe_count_diagonal(
        _diag_sorted(r), _diag_sorted(s, sentinel=0xFFFFFFFE), k_drift=4)
    assert bool(ok)
    assert int(total) == 8192


def test_probe_count_diagonal_duplicates_drift():
    # small key domain -> duplicates -> nonzero within-row rank drift in
    # both directions; count must be exact whenever ok holds, and ok must
    # hold for a K comfortably above the max drift of this size.
    rng = np.random.default_rng(31)
    r = rng.integers(0, 1500, 2048).astype(np.uint32)
    s = rng.integers(0, 1500, 2048).astype(np.uint32)
    want = _np_join_count(r, s)
    total, ok = bp.probe_count_diagonal(
        _diag_sorted(r), _diag_sorted(s, sentinel=0xFFFFFFFE),
        k_drift=64, rows_per_group=8)
    assert bool(ok)
    assert int(total) == want
    # high-bit keys: biased-int32 compares must preserve uint32 order
    r2 = (r + np.uint32(0x80000000)).astype(np.uint32)
    s2 = (s + np.uint32(0x80000000)).astype(np.uint32)
    total2, ok2 = bp.probe_count_diagonal(
        _diag_sorted(r2), _diag_sorted(s2, sentinel=0xFFFFFFFE),
        k_drift=64, rows_per_group=8)
    assert bool(ok2) and int(total2) == want


def test_probe_count_diagonal_drop_mask():
    rng = np.random.default_rng(32)
    r = rng.integers(0, 4000, 4096).astype(np.uint32)
    s = rng.integers(0, 4000, 4096).astype(np.uint32)
    drop_r = jnp.asarray(r % 5 == 0)
    drop_s = jnp.asarray(s % 7 == 0)
    total, ok = bp.probe_count_diagonal(
        _diag_sorted(r, drop_r), _diag_sorted(s, drop_s, 0xFFFFFFFE),
        k_drift=64, rows_per_group=8)
    assert bool(ok)
    assert int(total) == _np_join_count(r[r % 5 != 0], s[s % 7 != 0])


def test_probe_count_diagonal_trips_on_skew_and_ratio():
    # heavy duplicates: matches far off the diagonal must flip ok
    r = np.zeros(2048, dtype=np.uint32)
    s = np.zeros(2048, dtype=np.uint32)
    _, ok = bp.probe_count_diagonal(
        _diag_sorted(r), _diag_sorted(s, sentinel=0xFFFFFFFE), k_drift=8)
    assert not bool(ok)
    # size ratio >> 1: within-row diagonal slope != 1 -> must flip ok
    rng = np.random.default_rng(33)
    r = rng.permutation(2048).astype(np.uint32)
    s = np.repeat(np.arange(2048, dtype=np.uint32), 4)
    _, ok = bp.probe_count_diagonal(
        _diag_sorted(r), _diag_sorted(s, sentinel=0xFFFFFFFE), k_drift=8)
    assert not bool(ok)


def test_probe_count_diagonal_fuzz_ok_implies_exact():
    # whenever the kernel reports ok, the count must be exact — across
    # domains that produce a spectrum of drift
    rng = np.random.default_rng(34)
    n_ok = 0
    for domain in (300, 1000, 5000, 50000):
        for trial in range(3):
            r = rng.integers(0, domain, 1536).astype(np.uint32)
            s = rng.integers(0, domain, 1536).astype(np.uint32)
            total, ok = bp.probe_count_diagonal(
                _diag_sorted(r), _diag_sorted(s, sentinel=0xFFFFFFFE),
                k_drift=48, rows_per_group=8)
            if bool(ok):
                n_ok += 1
                assert int(total) == _np_join_count(r, s)
    assert n_ok >= 6   # the check must not be so conservative it never ok's


@pytest.mark.slow
def test_probe_count_diagonal_blocked_parity():
    # the sublane-blocked kernel must agree bit-for-bit with v2 (count
    # AND ok flag) across ok=True and ok=False regimes
    rng = np.random.default_rng(35)
    cases = []
    cases.append((rng.permutation(8192).astype(np.uint32),
                  rng.permutation(8192).astype(np.uint32), 8))
    cases.append((rng.integers(0, 1500, 2048).astype(np.uint32),
                  rng.integers(0, 1500, 2048).astype(np.uint32), 64))
    cases.append((rng.integers(0, 900, 2048).astype(np.uint32),
                  rng.integers(0, 900, 2048).astype(np.uint32), 8))  # trips
    for r, s, K in cases:
        rs = _diag_sorted(r)
        ss = _diag_sorted(s, sentinel=0xFFFFFFFE)
        gr = 8 if K > 16 else 32
        m1, ok1 = bp.probe_count_diagonal(rs, ss, k_drift=K,
                                          rows_per_group=gr)
        m2, ok2 = bp.probe_count_diagonal(rs, ss, k_drift=K,
                                          rows_per_group=gr, blocked=True)
        assert int(m1) == int(m2) and bool(ok1) == bool(ok2)
        if bool(ok1):
            assert int(m1) == _np_join_count(r, s)


@pytest.mark.slow
def test_join_materialize_windowed():
    # fact (R side of the kernel) has duplicate keys; dim (S side) unique:
    # every fact element matches <= 1 dim row
    rng = np.random.default_rng(35)
    n_f, n_d = 4096, 1024
    fk = rng.integers(0, 4000, n_f).astype(np.uint32)
    dk = rng.permutation(4000)[:n_d].astype(np.uint32)
    frid = np.arange(n_f, dtype=np.uint32)
    drid = rng.permutation(n_d).astype(np.uint32)
    fs, fr = jax.lax.sort((bp.bias_keys(jnp.asarray(fk)),
                           jnp.asarray(frid)), num_keys=1)
    ds, dr = jax.lax.sort((bp.bias_keys(jnp.asarray(dk), None, 0xFFFFFFFE),
                           jnp.asarray(drid)), num_keys=1)
    out_rid, cnt, win_ok, multi = bp.join_materialize_windowed(
        fs, ds, dr, rows_per_group=8)
    assert bool(win_ok) and not bool(multi)
    # oracle: key -> dim rid
    lut = {int(k): int(v) for k, v in zip(dk, drid)}
    fs_keys = np.asarray(jax.lax.bitcast_convert_type(fs, jnp.uint32)
                         ^ jnp.uint32(0x80000000))
    cnt = np.asarray(cnt)
    out_rid = np.asarray(out_rid)
    for i in range(n_f):
        k = int(fs_keys[i])
        if k in lut:
            assert cnt[i] == 1 and out_rid[i] == lut[k], i
        else:
            assert cnt[i] == 0, i


def test_windowed_prep_coarse_matches_exact():
    # The coarse row-head search (n_s >= 2^22, the probe-v2 fix applied
    # to _windowed_prep) must produce window geometry that still COVERS
    # every match — checked against the element-exact formulation on a
    # workload with duplicate keys straddling row boundaries.
    # R is the driving (fact) side, S the dim side: S must not dwarf R or
    # no window can cover (the kernel's contract) — S just crosses the
    # coarse-search threshold, R is 2x larger.
    n_s = (1 << 22) + 4096
    n_r = 1 << 23
    rng = np.random.default_rng(77)
    sk = np.sort(rng.integers(0, n_s // 2, n_s).astype(np.uint32))
    # force runs of duplicates that straddle 128-lane row boundaries
    sk[1000:1000 + 640] = sk[1000]
    sk = np.sort(sk)
    rk = np.sort(rng.choice(sk, n_r).astype(np.uint32))
    rs = bp.bias_keys(jnp.asarray(rk))
    ss = bp.bias_keys(jnp.asarray(sk), None, 0xFFFFFFFE)
    srid = jnp.arange(n_s, dtype=jnp.uint32)
    w, gr = 8, 8
    wg_c, wmeta_c, *_, ok_c = bp._windowed_prep(rs, ss, srid, w, gr, None)
    assert bool(ok_c), "coarse geometry must cover this balanced workload"
    # coverage invariant, checked directly in numpy: every S index that
    # holds a key of R-row i must lie inside [start, start + w) rows,
    # where start = wg[group] + base[group, row-in-group]
    wg_np = np.asarray(wg_c)
    base_np = np.asarray(wmeta_c)[:, 1:1 + gr]
    heads = rk.reshape(-1, 128)[:, 0]
    tails = rk.reshape(-1, 128)[:, -1]
    j0 = np.searchsorted(sk, heads, side="left")
    j1 = np.searchsorted(sk, tails, side="right")
    for row in range(heads.shape[0]):
        g, k = divmod(row, gr)
        start = (wg_np[g] + base_np[g, k]) * 128
        assert start <= j0[row] and j1[row] <= start + w * 128, (
            row, start, j0[row], j1[row])


@pytest.mark.slow
def test_join_materialize_windowed_multimatch_flags():
    # dim side with duplicate keys -> some fact elements match 2 rows
    fk = np.arange(256, dtype=np.uint32)
    dk = np.concatenate([np.arange(256, dtype=np.uint32),
                         np.arange(256, dtype=np.uint32)])
    fs = jnp.sort(bp.bias_keys(jnp.asarray(fk)))
    ds, dr = jax.lax.sort(
        (bp.bias_keys(jnp.asarray(dk), None, 0xFFFFFFFE),
         jnp.arange(512, dtype=jnp.uint32)), num_keys=1)
    out_rid, cnt, win_ok, multi = bp.join_materialize_windowed(
        fs, ds, dr, rows_per_group=8)
    assert bool(win_ok) and bool(multi)
    assert int(jnp.sum(cnt)) == 512   # counts stay exact
    np.testing.assert_array_equal(np.asarray(cnt), np.full(256, 2))


# -------------------------- sort / filter / aggregate --------------------------

def test_sort_relation():
    rel, keys = _rand_rel(5000, 2**31, 12)
    out = sort_ops.sort_relation(rel)
    np.testing.assert_array_equal(np.asarray(out.keys), np.sort(keys))
    # rids follow their keys
    np.testing.assert_array_equal(keys[np.asarray(out.rids)],
                                  np.asarray(out.keys))


def test_radix_sort_staged():
    rel, keys = _rand_rel(4096, 2**32 - 1, 13)
    out = sort_ops.radix_sort_staged(rel, key_bits=32, digit_bits=8)
    np.testing.assert_array_equal(np.asarray(out.keys), np.sort(keys))


@pytest.mark.parametrize("chunk", [1024, 2048])
def test_bitonic_sort_chunks(chunk):
    rng = np.random.default_rng(30)
    n = 4 * chunk
    v = rng.integers(0, 2**32, n, dtype=np.uint32)
    p = np.arange(n, dtype=np.uint32)
    sv, sp = sort_ops.bitonic_sort_chunks(jnp.asarray(v), jnp.asarray(p),
                                          chunk=chunk)
    sv, sp = np.asarray(sv), np.asarray(sp)
    for c in range(n // chunk):
        sl = slice(c * chunk, (c + 1) * chunk)
        np.testing.assert_array_equal(sv[sl], np.sort(v[sl]))
        np.testing.assert_array_equal(v[sp[sl]], sv[sl])


def test_bitonic_sort_duplicates():
    rng = np.random.default_rng(31)
    v = rng.integers(0, 16, 2048, dtype=np.uint32)   # heavy duplicates
    p = np.arange(2048, dtype=np.uint32)
    sv, sp = sort_ops.bitonic_sort_chunks(jnp.asarray(v), jnp.asarray(p),
                                          chunk=2048)
    np.testing.assert_array_equal(np.asarray(sv), np.sort(v))
    np.testing.assert_array_equal(v[np.asarray(sp)], np.asarray(sv))


def test_filter_relation():
    rel, keys = _rand_rel(3000, 1000, 14)
    filt, count = filter_ops.filter_relation(
        rel, lambda k, r: k < jnp.uint32(500))
    want = keys[keys < 500]
    c = int(count)
    assert c == want.size
    np.testing.assert_array_equal(np.sort(np.asarray(filt.keys[:c])),
                                  np.sort(want))


def test_aggregate_sum():
    rng = np.random.default_rng(15)
    keys = rng.integers(0, 50, 4000).astype(np.uint32)
    vals = rng.integers(0, 100, 4000).astype(np.int32)
    gk, gs, valid, ng = agg.aggregate_sum(jnp.asarray(keys),
                                          jnp.asarray(vals), 128)
    got = {int(k): int(v) for k, v, ok in
           zip(np.asarray(gk), np.asarray(gs), np.asarray(valid)) if ok}
    want = {}
    for k, v in zip(keys, vals):
        want[int(k)] = want.get(int(k), 0) + int(v)
    assert got == want
    assert int(ng) == len(want)


def test_aggregate_sum_exact_past_int32():
    # A single group whose true sum exceeds 2^31 (VERDICT r3 weak #6):
    # 70000 rows of value 40000 in one group = 2.8e9 > 2^31 — plain
    # aggregate_sum's int32 cumsum difference would wrap silently; the
    # plane-decomposed variant must return the exact 64-bit sum with
    # ok=True (groups are far below the 2^23-row plane-exactness bound).
    rng = np.random.default_rng(17)
    n = 80000
    keys = np.concatenate([np.full(70000, 3, np.uint32),
                           rng.integers(10, 40, n - 70000,
                                        dtype=np.uint32)])
    vals = np.concatenate([np.full(70000, 40000, np.uint32),
                           rng.integers(0, 1 << 20, n - 70000,
                                        dtype=np.uint32)])
    perm = rng.permutation(n)
    keys, vals = keys[perm], vals[perm]
    gk, planes, counts, valid, ng, ok = agg.aggregate_sum_exact(
        jnp.asarray(keys), jnp.asarray(vals), 64)
    assert bool(ok)
    sums64 = agg.combine_sum_planes(planes)
    got = {int(k): int(v) for k, v, va in
           zip(np.asarray(gk), sums64, np.asarray(valid)) if va}
    want = {}
    for k, v in zip(keys, vals):
        want[int(k)] = want.get(int(k), 0) + int(v)
    assert got == want
    assert got[3] == 70000 * 40000 > 2**31
    assert int(ng) == len(want)
    # counts reported per group
    cm = {int(k): int(c) for k, c, va in
          zip(np.asarray(gk), np.asarray(counts), np.asarray(valid)) if va}
    assert cm[3] == 70000


def test_aggregate_sum_exact_overflow_flag():
    # ok must drop when a group crosses the 2^23-row plane-exactness
    # bound (the guard is the point: no silent wrap).
    keys = jnp.zeros((1 << 23) + 8, jnp.uint32)
    vals = jnp.ones((1 << 23) + 8, jnp.uint32)
    *_, ok = agg.aggregate_sum_exact(keys, vals, 4)
    assert not bool(ok)


def test_aggregate_sum_sorted_masked():
    rng = np.random.default_rng(16)
    keys = np.sort(rng.integers(0, 60, 4000).astype(np.uint32))
    vals = rng.integers(0, 100, 4000).astype(np.int32)
    # mask constant per key run (the function's precondition — join-match
    # masks have this form: all rows of a key match, or none do)
    keep_key = rng.random(60) < 0.6
    mask = keep_key[keys]
    gk, gs, valid, ng = agg.aggregate_sum_sorted(
        jnp.asarray(keys), jnp.asarray(vals), jnp.asarray(mask), 128)
    got = {int(k): int(v) for k, v, ok in
           zip(np.asarray(gk), np.asarray(gs), np.asarray(valid)) if ok}
    want = {}
    for k, v, m in zip(keys, vals, mask):
        if m:
            want[int(k)] = want.get(int(k), 0) + int(v)
    assert got == want
    assert int(ng) == len(want)
    # fully-masked groups must not occupy slots even with tight max_groups
    gk2, gs2, valid2, ng2 = agg.aggregate_sum_sorted(
        jnp.asarray(keys), jnp.asarray(vals), jnp.asarray(mask),
        max(1, len(want)))
    got2 = {int(k): int(v) for k, v, ok in
            zip(np.asarray(gk2), np.asarray(gs2), np.asarray(valid2)) if ok}
    assert got2 == want


# -------------------------- skew --------------------------

def test_heavy_hitters_detection_and_count():
    rng = np.random.default_rng(16)
    base = rng.integers(0, 2**20, 20000).astype(np.uint32)
    heavy = np.full(30000, 777, dtype=np.uint32)
    keys = np.concatenate([base, heavy])
    rng.shuffle(keys)
    hh = skew_ops.detect_heavy_keys(jnp.asarray(keys), jax.random.key(0),
                                    max_heavy=8, sample_size=4096,
                                    min_est_frequency=0.05)
    valid_keys = np.asarray(hh.keys)[np.asarray(hh.valid)]
    assert 777 in valid_keys.tolist()
    counts = skew_ops.count_exact(jnp.asarray(keys), hh)
    idx = valid_keys.tolist().index(777)
    got = np.asarray(counts)[np.asarray(hh.valid)][idx]
    assert int(got) == 30000


def test_partition_tiers():
    counts = jnp.asarray([10, 100, 500, 5000], jnp.int32)
    tiers = skew_ops.partition_tiers(counts, base_capacity=128, n_tiers=3,
                                     growth=4)
    np.testing.assert_array_equal(np.asarray(tiers), [0, 0, 1, 3])


def test_crossbar_row_digit_sort():
    # Per-row stable LSD digit sort (ops/crossbar.py) vs numpy argsort,
    # keys + payload, several digit windows.
    from radixjoin_tpu.ops.crossbar import row_digit_sort
    rng = np.random.default_rng(0)
    n = 256 * 128
    keys = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    pay = np.arange(n, dtype=np.uint32)
    for shift, bits in ((0, 5), (26, 6)):
        ok, op = row_digit_sort(jnp.asarray(keys), jnp.asarray(pay),
                                bits, shift, interpret=True)
        ok = np.asarray(ok).reshape(-1, 128)
        op = np.asarray(op).reshape(-1, 128)
        k2, p2 = keys.reshape(-1, 128), pay.reshape(-1, 128)
        for r in range(k2.shape[0]):
            order = np.argsort((k2[r] >> shift) & ((1 << bits) - 1),
                               kind="stable")
            np.testing.assert_array_equal(ok[r], k2[r][order])
            np.testing.assert_array_equal(op[r], p2[r][order])


def test_join_materialize_windowed_multi_planes():
    # The M-plane interpret-mode compile is large; on top of ~50 tests'
    # accumulated XLA:CPU code mappings it segfaults LLVM (the
    # vm.max_map_count class, cf. conftest) — start from a clean cache.
    jax.clear_caches()
    # dim side with up to 3 duplicates per key: the M-plane kernel must
    # emit the exact rid SET per fact element (plane order is free)
    rng = np.random.default_rng(36)
    n_f = 2048
    fk = rng.integers(0, 700, n_f).astype(np.uint32)
    dk = np.concatenate([np.arange(700, dtype=np.uint32),
                         np.arange(350, dtype=np.uint32),
                         np.arange(200, dtype=np.uint32)])
    n_d = len(dk)
    drid = rng.permutation(n_d).astype(np.uint32)
    frid = np.arange(n_f, dtype=np.uint32)
    fs, fr = jax.lax.sort((bp.bias_keys(jnp.asarray(fk)),
                           jnp.asarray(frid)), num_keys=1)
    ds, dr = jax.lax.sort((bp.bias_keys(jnp.asarray(dk), None, 0xFFFFFFFE),
                           jnp.asarray(drid)), num_keys=1)
    planes, cnt, win_ok, overflow = bp.join_materialize_windowed_multi(
        fs, ds, dr, max_matches=4, rows_per_group=8)
    assert bool(win_ok) and not bool(overflow)
    from collections import defaultdict
    lut = defaultdict(set)
    for k, v in zip(dk, drid):
        lut[int(k)].add(int(v))
    fs_keys = np.asarray(jax.lax.bitcast_convert_type(fs, jnp.uint32)
                         ^ jnp.uint32(0x80000000))
    planes = np.asarray(planes)
    cnt = np.asarray(cnt)
    for i in range(n_f):
        want = lut.get(int(fs_keys[i]), set())
        assert cnt[i] == len(want), i
        assert set(planes[:cnt[i], i].tolist()) == want, i


def test_join_materialize_windowed_multi_overflow_flag():
    # The M-plane interpret-mode compile is large; on top of ~50 tests'
    # accumulated XLA:CPU code mappings it segfaults LLVM (the
    # vm.max_map_count class, cf. conftest) — start from a clean cache.
    jax.clear_caches()
    # 6 duplicates per dim key > max_matches=4 -> overflow must flip,
    # counts must stay exact
    fk = np.arange(128, dtype=np.uint32)
    dk = np.tile(np.arange(128, dtype=np.uint32), 6)
    fs = jnp.sort(bp.bias_keys(jnp.asarray(fk)))
    ds, dr = jax.lax.sort(
        (bp.bias_keys(jnp.asarray(dk), None, 0xFFFFFFFE),
         jnp.arange(len(dk), dtype=jnp.uint32)), num_keys=1)
    planes, cnt, win_ok, overflow = bp.join_materialize_windowed_multi(
        fs, ds, dr, max_matches=4, rows_per_group=8, window_rows=8)
    assert bool(overflow)
    np.testing.assert_array_equal(np.asarray(cnt), np.full(128, 6))


def test_aggregate_sum_exact_max_groups_equals_n():
    """Round-5 advisor fix: max_groups >= n must take the padding branch
    (aggregate_count-style usage), not assert."""
    from radixjoin_tpu.ops import aggregate as agg
    keys = jnp.asarray(np.array([5, 5, 9, 2], np.uint32))
    vals = jnp.asarray(np.array([1, 2, 3, 4], np.uint32))
    for mg in (4, 6):
        gk, planes, counts, valid, ng, ok = agg.aggregate_sum_exact(
            keys, vals, max_groups=mg)
        assert bool(ok) and int(ng) == 3
        sums = agg.combine_sum_planes(planes)
        got = {int(k): int(s) for k, s, v in
               zip(np.asarray(gk), sums, np.asarray(valid)) if v}
        assert got == {2: 4, 5: 3, 9: 3}


def test_join_materialize_diagonal_matches_windowed():
    """Prep-free diagonal emit kernel: bit-identical (count, rid) planes
    to the windowed emit kernel on balanced sorted sides, including the
    multi-match rid-sum convention, and escalation parity on skew."""
    rng = np.random.default_rng(36)
    n = 4096
    for dup in (1, 2):
        if dup == 1:
            rk = rng.permutation(n).astype(np.uint32)
            sk = rng.permutation(n).astype(np.uint32)
        else:
            rk = rng.permutation(n).astype(np.uint32)
            sk = np.repeat(rng.permutation(n // dup).astype(np.uint32) * 2,
                           dup)
            rng.shuffle(sk)
        sr = np.arange(n, dtype=np.uint32)
        rbk, = jax.lax.sort((bp.bias_keys(jnp.asarray(rk)),), num_keys=1)
        sbk, srs = jax.lax.sort(
            (bp.bias_keys(jnp.asarray(sk), None, 0xFFFFFFFE),
             jnp.asarray(sr).astype(jnp.int32)), num_keys=1)
        srid_d, cnt_d, ok_d, multi_d = bp.join_materialize_diagonal(
            rbk, sbk, srs, k_drift=8, rows_per_group=16)
        srid_w, cnt_w, ok_w, multi_w = bp.join_materialize_windowed(
            rbk, sbk, srs, rows_per_group=8)
        assert bool(ok_d) and bool(ok_w)
        assert bool(multi_d) == bool(multi_w) == (dup == 2)
        np.testing.assert_array_equal(np.asarray(cnt_d), np.asarray(cnt_w))
        np.testing.assert_array_equal(np.asarray(srid_d),
                                      np.asarray(srid_w))
    # a heavy dup run must trip the coverage check (drift > K), not
    # return silently wrong planes
    sk_hot = rng.permutation(n).astype(np.uint32)
    sk_hot[: n // 2] = 7
    rk_hot = rng.permutation(n).astype(np.uint32)
    rk_hot[: n // 4] = 7
    rb, = jax.lax.sort((bp.bias_keys(jnp.asarray(rk_hot)),), num_keys=1)
    sb, ss = jax.lax.sort(
        (bp.bias_keys(jnp.asarray(sk_hot), None, 0xFFFFFFFE),
         jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    _, _, ok_hot, _ = bp.join_materialize_diagonal(
        rb, sb, ss, k_drift=8, rows_per_group=16)
    assert not bool(ok_hot)


def test_join_materialize_diagonal_prepadded_budget():
    """Prepad interop for the emit kernel: diagonal_prepad must be called
    with the emit kernel's geometry budget (512) — the count kernel's
    default budget pads differently once rows_per_group * k_drift
    exceeds 512, which the shape assert rejects."""
    rng = np.random.default_rng(37)
    n = 2048
    rk = rng.permutation(n).astype(np.uint32)
    sk = rng.permutation(n).astype(np.uint32)
    sr = np.arange(n, dtype=np.uint32)
    rbk, = jax.lax.sort((bp.bias_keys(jnp.asarray(rk)),), num_keys=1)
    sbk, srs = jax.lax.sort(
        (bp.bias_keys(jnp.asarray(sk), None, 0xFFFFFFFE),
         jnp.asarray(sr).astype(jnp.int32)), num_keys=1)
    kw = dict(k_drift=8, rows_per_group=16)
    rp = bp.diagonal_prepad(rbk, "r", n, n, budget=512, **kw)
    sp = bp.diagonal_prepad(sbk, "s", n, n, budget=512, **kw)
    n_s_pad = sp.shape[0]
    srp = jnp.concatenate(
        [srs, jnp.zeros((n_s_pad - n,), jnp.int32)])
    srid_p, cnt_p, ok_p, multi_p = bp.join_materialize_diagonal(
        rp, sp, srp, prepadded=(n, n), **kw)
    srid_u, cnt_u, ok_u, _ = bp.join_materialize_diagonal(
        rbk, sbk, srs, **kw)
    assert bool(ok_p) and bool(ok_u) and not bool(multi_p)
    n_r_true = rbk.shape[0]
    np.testing.assert_array_equal(np.asarray(cnt_p)[:n_r_true],
                                  np.asarray(cnt_u))
    np.testing.assert_array_equal(np.asarray(srid_p)[:n_r_true],
                                  np.asarray(srid_u))
    assert int(np.asarray(cnt_p)[n_r_true:].sum()) == 0
