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
