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
