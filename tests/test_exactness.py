"""64-bit exactness machinery: the >2^31-match rungs.

The reference's RESULT_COUNTER is a host uint64 (operators/HashJoin.cpp:28)
so no workload can wrap it; our device-side int32 count probes CAN wrap at
2^31 matches, which is why the mergecount rungs carry 15/15-bit block
partials recombined host-side in int64 (ops/buildprobe._merged_partials,
ops/wide._merged_partials64, engine/distributed merged_lo/merged_hi).
These tests force totals past 2^31 on CPU — 46341 duplicates of one key
per side is a ~92K-element sort yielding 46341^2 = 2,147,488,281 matches,
4,633 past int32 max — and assert the exact rungs do not wrap.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radixjoin_tpu import JoinConfig, make_relation
from radixjoin_tpu.engine.distributed import (make_distributed_join,
                                              make_distributed_join_checked,
                                              total_distributed_matches)
from radixjoin_tpu.ops.buildprobe import (probe_count_merged,
                                          probe_count_merged_exact)
from radixjoin_tpu.ops.wide import join64_count_keys_exact

# smallest n with n^2 > 2^31 (int32 max = 2,147,483,647)
N_WRAP = 46341

CFG = JoinConfig(use_pallas=False, allocation_factor=1.3)


def test_merged_exact_past_int31():
    keys = jnp.full((N_WRAP,), jnp.uint32(777))
    want = N_WRAP * N_WRAP
    assert want > 2**31 - 1
    got = probe_count_merged_exact(keys, keys)
    assert got == want
    # the plain device int32 rung provably wraps on this input — the
    # reason the exact rung exists (ADVICE r2: silent ok=True wrap)
    wrapped = int(np.asarray(probe_count_merged(keys, keys)))
    assert wrapped != want


def test_join64_exact_past_int31():
    hi = jnp.zeros((N_WRAP,), jnp.uint32)      # degenerate hi plane
    lo = jnp.full((N_WRAP,), jnp.uint32(777))
    want = N_WRAP * N_WRAP
    assert join64_count_keys_exact(hi, lo, hi, lo) == want


@pytest.fixture(scope="module")
def mesh2():
    devs = jax.devices()
    assert len(devs) >= 2
    from jax.sharding import Mesh
    return Mesh(np.array(devs[:2]), ("nodes",))


def _dup_relations(per, n_dev):
    n = per * n_dev
    keys = np.full(n, 777, np.uint32)
    r = make_relation(keys, np.arange(n, dtype=np.uint32))
    s = make_relation(keys.copy(), np.arange(n, dtype=np.uint32))
    return r, s


def test_distributed_mergecount_rung_past_int31(mesh2):
    """The terminal rung itself: every tuple routes to ONE device, whose
    local matches (2*46341)^2 ~ 8.59e9 exceed 2^31 4x over — the partials
    path must return the exact total with ok=True (the int32-summed
    version wrapped silently, ADVICE r2 high)."""
    per = N_WRAP
    r, s = _dup_relations(per, 2)
    run = make_distributed_join(mesh2, per, per, CFG,
                                local_probe="mergecount",
                                full_capacity=True)
    res = run(r, s)
    assert np.asarray(res.ok).all()
    want = (2 * per) ** 2
    assert total_distributed_matches(res) == want


def test_distributed_checked_escalates_to_exact(mesh2):
    """End-to-end escalation: the fast join overflows its shuffle capacity
    (all keys target one device), ok=False, and the checked wrapper must
    recover the exact >2^31 answer through the terminal rung."""
    per = N_WRAP
    r, s = _dup_relations(per, 2)
    run = make_distributed_join_checked(mesh2, per, per, CFG,
                                        local_probe="diagonal")
    total, escalated = run(r, s)
    assert escalated, "duplicate-key flood must overflow the fast shuffle"
    assert total == (2 * per) ** 2


def test_distributed_checked_tier_overflow_recovers(mesh2):
    """Tier overflow (not shuffle overflow): a key at ~25% frequency fits
    the shuffle capacity spread over partitions but overflows the tiered
    probe's partition capacity; the checked wrapper must still deliver
    the exact count."""
    per = 4096
    n = per * 2
    rng = np.random.default_rng(50)
    rk = rng.integers(0, n, n, dtype=np.uint32)
    sk = rng.integers(0, n, n, dtype=np.uint32)
    sk[: n // 4] = 12345
    rng.shuffle(sk)
    r = make_relation(rk, np.arange(n, dtype=np.uint32))
    s = make_relation(sk, np.arange(n, dtype=np.uint32))
    ru, rc = np.unique(rk, return_counts=True)
    su, sc = np.unique(sk, return_counts=True)
    _, ri, si = np.intersect1d(ru, su, return_indices=True)
    want = int(np.sum(rc[ri].astype(np.int64) * sc[si].astype(np.int64)))
    cfg = JoinConfig(use_pallas=False, allocation_factor=4.0)
    run = make_distributed_join_checked(mesh2, per, per, cfg)
    total, escalated = run(r, s)
    assert total == want


def test_distributed_checked_no_escalation_when_ok(mesh2):
    """Clean workloads stay on the fast path (escalated=False)."""
    from radixjoin_tpu.data import relation as gen
    per = 2048
    n = per * 2
    r = gen.fill_unique(n, jax.random.key(40))
    s = gen.fill_unique(n, jax.random.key(41))
    run = make_distributed_join_checked(mesh2, per, per, CFG)
    total, escalated = run(r, s)
    assert total == n
    assert not escalated


def test_distributed_checked_rejects_materialize(mesh2):
    with pytest.raises(AssertionError):
        make_distributed_join_checked(mesh2, 1024, 1024, CFG,
                                      materialize_max_out=1024)
