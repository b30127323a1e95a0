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
    rng = np.random.default_rng(hash((kind, seed)) % 2**31)
    n = 1 << 12
    rk, sk = _workload(rng, kind, n)
    r = make_relation(rk, np.arange(rk.size, dtype=np.uint32))
    s = make_relation(sk, np.arange(sk.size, dtype=np.uint32))
    want = _np_join_count(rk, sk)

    assert total_matches(join_count(r, s, CFG, mode="sortmerge")) == want
    assert join_count_checked(r, s, CFG, mode="partitioned") == want
    assert join_count_checked(r, s, CFG, mode="banded") == want
    assert join_count_checked(r, s, CFG, mode="partitioned",
                              skew_aware=True) == want
