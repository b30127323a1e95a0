"""Cross-mode fuzz: every join strategy must agree with the NumPy oracle on
randomised workloads (uniform/dense/sparse/duplicated/empty-overlap).
The engine's strategies share no code path beyond the partitioner, so
agreement across all of them is strong evidence of correctness
(SURVEY.md §4 — replaces the reference's single construction-time oracle)."""

import numpy as np
import jax
import pytest

from radixjoin_tpu import JoinConfig, join_count, total_matches, make_relation
from radixjoin_tpu.engine.join import join_count_checked

CFG = JoinConfig(use_pallas=True)


def _np_join_count(r_keys, s_keys):
    r_u, r_c = np.unique(r_keys, return_counts=True)
    s_u, s_c = np.unique(s_keys, return_counts=True)
    _, ri, si = np.intersect1d(r_u, s_u, return_indices=True)
    return int(np.sum(r_c[ri].astype(np.int64) * s_c[si].astype(np.int64)))


def _workload(rng, kind, n):
    if kind == "uniform":
        return (rng.integers(0, 4 * n, n, dtype=np.uint32),
                rng.integers(0, 4 * n, n, dtype=np.uint32))
    if kind == "dense_dup":
        return (rng.integers(0, n // 8, n, dtype=np.uint32),
                rng.integers(0, n // 8, n, dtype=np.uint32))
    if kind == "disjoint":
        return (rng.integers(0, n, n, dtype=np.uint32),
                rng.integers(2 * n, 3 * n, n, dtype=np.uint32))
    if kind == "asymmetric":
        return (rng.integers(0, n, n // 4, dtype=np.uint32),
                rng.integers(0, n, n, dtype=np.uint32))
    if kind == "clustered":
        base = rng.integers(0, 1 << 30, n // 64, dtype=np.uint32)
        return (rng.choice(base, n).astype(np.uint32),
                rng.choice(base, n).astype(np.uint32))
    raise ValueError(kind)


@pytest.mark.parametrize("kind", ["uniform", "dense_dup", "disjoint",
                                  "asymmetric", "clustered"])
@pytest.mark.parametrize("seed", [0, 1])
def test_all_modes_agree_with_oracle(kind, seed):
    """EVERY public entry mode on every workload shape — including the
    two modes that carry the headline numbers (diagonal, mergecount) and
    skew_aware stacked on each mode family (VERDICT r1 weak #7)."""
    rng = np.random.default_rng(hash((kind, seed)) % 2**31)
    n = 1 << 12
    rk, sk = _workload(rng, kind, n)
    r = make_relation(rk, np.arange(rk.size, dtype=np.uint32))
    s = make_relation(sk, np.arange(sk.size, dtype=np.uint32))
    want = _np_join_count(rk, sk)

    assert total_matches(join_count(r, s, CFG, mode="sortmerge")) == want
    assert join_count_checked(r, s, CFG, mode="partitioned") == want
    assert join_count_checked(r, s, CFG, mode="banded") == want
    assert join_count_checked(r, s, CFG, mode="diagonal") == want
    assert join_count_checked(r, s, CFG, mode="mergecount") == want
    assert join_count_checked(r, s, CFG, mode="partitioned",
                              skew_aware=True) == want
    assert join_count_checked(r, s, CFG, mode="diagonal",
                              skew_aware=True) == want
    assert join_count_checked(r, s, CFG, mode="mergecount",
                              skew_aware=True) == want


@pytest.mark.parametrize("kind", ["uniform", "dense_dup", "clustered"])
def test_join64_fuzz(kind):
    """Randomised wide-key (64-bit) joins vs the oracle: the (hi, lo)
    plane pairing with real entropy in BOTH words, plus a shared-hi
    variant that stresses lexicographic tie handling."""
    from radixjoin_tpu.ops.wide import make_relation64, join64_count_checked
    rng = np.random.default_rng(hash(("w64", kind)) % 2**31)
    n = 1 << 12
    rk, sk = _workload(rng, kind, n)
    nr, ns = rk.size, sk.size
    # widen: key64 = (key32-derived hi) << 32 | fuzzed lo; collide lo
    # across sides so only full-64-bit equality counts
    r_lo = rng.integers(0, 8, nr, dtype=np.uint64)
    s_lo = rng.integers(0, 8, ns, dtype=np.uint64)
    r64 = (rk.astype(np.uint64) << 32) | r_lo
    s64 = (sk.astype(np.uint64) << 32) | s_lo
    ru, rc = np.unique(r64, return_counts=True)
    su, sc = np.unique(s64, return_counts=True)
    _, ri, si = np.intersect1d(ru, su, return_indices=True)
    want = int(np.sum(rc[ri].astype(np.int64) * sc[si].astype(np.int64)))
    got = join64_count_checked(
        make_relation64(r64, np.arange(nr, dtype=np.uint32)),
        make_relation64(s64, np.arange(ns, dtype=np.uint32)))
    assert got == want

    # degenerate-hi twin: all entropy in the lo word
    r64d = rk.astype(np.uint64)
    s64d = sk.astype(np.uint64)
    got = join64_count_checked(
        make_relation64(r64d, np.arange(nr, dtype=np.uint32)),
        make_relation64(s64d, np.arange(ns, dtype=np.uint32)))
    assert got == _np_join_count(rk, sk)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.slow
def test_large_n_modes_agree(seed):
    """n = 2^16 sweep of the cheap always-exact modes plus the diagonal
    fast path (VERDICT r1 weak #7: the fuzz ran at n=4096 only)."""
    rng = np.random.default_rng(1000 + seed)
    n = 1 << 16
    rk = rng.integers(0, n * 2, n, dtype=np.uint32)
    sk = rng.integers(0, n * 2, n, dtype=np.uint32)
    r = make_relation(rk, np.arange(n, dtype=np.uint32))
    s = make_relation(sk, np.arange(n, dtype=np.uint32))
    want = _np_join_count(rk, sk)
    assert total_matches(join_count(r, s, CFG, mode="sortmerge")) == want
    assert join_count_checked(r, s, CFG, mode="mergecount") == want
    assert join_count_checked(r, s, CFG, mode="diagonal") == want
