"""Multi-device tests on the 8-device virtual CPU mesh
(SURVEY.md §4 test-pyramid layer (c)): the full 4-phase distributed join,
metadata collectives, and the shuffle, with the unique-keys oracle."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import pytest

from radixjoin_tpu import JoinConfig, make_relation
from radixjoin_tpu.data import relation as gen
from radixjoin_tpu.data.tuples import Relation, radix_bits
from radixjoin_tpu.engine.distributed import (make_distributed_join,
                                              total_distributed_matches)
from radixjoin_tpu.parallel.metadata import compute_metadata
from radixjoin_tpu.parallel.shuffle import shuffle_by_destination

CFG = JoinConfig(use_pallas=False, allocation_factor=1.3)


def _np_join_count(r_keys, s_keys):
    r_u, r_c = np.unique(r_keys, return_counts=True)
    s_u, s_c = np.unique(s_keys, return_counts=True)
    _, ri, si = np.intersect1d(r_u, s_u, return_indices=True)
    return int(np.sum(r_c[ri].astype(np.int64) * s_c[si].astype(np.int64)))


def test_metadata_collectives(mesh8):
    n_dev = 8
    n = 1024 * n_dev
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**31, n, dtype=np.uint32)
    p_net = 32

    def shard_fn(k):
        pid = radix_bits(k, 5)
        meta = compute_metadata(pid, p_net, "nodes")
        return (meta.local_hist[None], meta.global_hist,
                meta.rel_offsets[None], meta.base_offsets,
                meta.window_sizes)

    out = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh8, in_specs=(P("nodes"),),
        out_specs=(P("nodes"), P(), P("nodes"), P(), P())))(jnp.asarray(keys))
    local, global_h, rel_off, base_off, win = map(np.asarray, out)

    pid_np = keys & 31
    np.testing.assert_array_equal(global_h, np.bincount(pid_np, minlength=32))
    # local histograms sum to global
    np.testing.assert_array_equal(local.sum(0), global_h)
    # exscan property: rel_offsets[d] = sum of locals of earlier devices
    np.testing.assert_array_equal(rel_off,
                                  np.cumsum(local, axis=0) - local)
    # base offsets: within an owner, partitions pack in order
    assign = np.arange(32) % 8
    for d in range(8):
        owned = np.where(assign == d)[0]
        sizes = global_h[owned]
        np.testing.assert_array_equal(base_off[owned],
                                      np.cumsum(sizes) - sizes)
        assert win[d] == sizes.sum()


def test_shuffle_all_tuples_arrive(mesh8):
    n_dev = 8
    per = 2048
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**31, per * n_dev, dtype=np.uint32)
    rids = np.arange(per * n_dev, dtype=np.uint32)
    cap = int(per / n_dev * 2)

    def shard_fn(k, r):
        dest = (k % jnp.uint32(n_dev)).astype(jnp.int32)
        shuf = shuffle_by_destination(k, r, dest, cap, "nodes")
        return (shuf.keys[None], shuf.valid[None], shuf.overflow[None])

    rk, valid, ovf = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh8, in_specs=(P("nodes"), P("nodes")),
        out_specs=(P("nodes"), P("nodes"), P("nodes"))))(
            jnp.asarray(keys), jnp.asarray(rids))
    rk, valid, ovf = map(np.asarray, (rk, valid, ovf))
    assert not ovf.any()
    # device d received exactly the keys with key % 8 == d
    for d in range(n_dev):
        got = np.sort(rk[d][valid[d]])
        want = np.sort(keys[keys % n_dev == d])
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("workload", ["unique", "general"])
def test_distributed_join_oracle(mesh8, workload):
    n_dev = 8
    per = 2048
    n = per * n_dev
    if workload == "unique":
        r = gen.fill_unique(n, jax.random.key(2))
        s = gen.fill_unique(n, jax.random.key(3))
        want = n
    else:
        rng = np.random.default_rng(4)
        r = make_relation(rng.integers(0, 5000, n, dtype=np.uint32),
                          np.arange(n, dtype=np.uint32))
        s = make_relation(rng.integers(0, 5000, n, dtype=np.uint32),
                          np.arange(n, dtype=np.uint32))
        want = _np_join_count(np.asarray(r.keys), np.asarray(s.keys))

    run = make_distributed_join(mesh8, per, per, CFG)
    res = run(r, s)
    assert np.asarray(res.ok).all()
    assert total_distributed_matches(res) == want
    # phase-1 observability: global histograms match numpy
    np.testing.assert_array_equal(
        np.asarray(res.global_hist_r),
        np.bincount(np.asarray(r.keys) & 31, minlength=32))


def test_distributed_join_chunked_shuffle(mesh8):
    n_dev = 8
    per = 2048
    n = per * n_dev
    r = gen.fill_unique(n, jax.random.key(5))
    s = gen.fill_unique(n, jax.random.key(6))
    run = make_distributed_join(mesh8, per, per, CFG, shuffle_rounds=4)
    res = run(r, s)
    assert np.asarray(res.ok).all()
    assert total_distributed_matches(res) == n


def test_distributed_join_skew_aware(mesh8):
    n_dev = 8
    per = 2048
    n = per * n_dev
    hot = n // 4
    rng = np.random.default_rng(8)
    r = gen.fill_unique(n, jax.random.key(9))
    sk = np.concatenate([rng.integers(0, n, n - hot, dtype=np.uint32),
                         np.full(hot, 321, np.uint32)])
    rng.shuffle(sk)
    s = make_relation(sk, np.arange(n, dtype=np.uint32))
    want = _np_join_count(np.asarray(r.keys), sk)

    run = make_distributed_join(mesh8, per, per, CFG, skew_aware=True)
    res = run(r, s)
    assert np.asarray(res.ok).all(), \
        "heavy-hitter pre-pass should keep the shuffle within capacity"
    assert total_distributed_matches(res) == want


@pytest.mark.slow
def test_distributed_join_banded_local_probe(mesh8):
    n_dev = 8
    per = 2048
    n = per * n_dev
    r = gen.fill_unique(n, jax.random.key(20))
    s = gen.fill_unique(n, jax.random.key(21))
    run = make_distributed_join(mesh8, per, per, CFG, local_probe="banded")
    res = run(r, s)
    assert np.asarray(res.ok).all()
    assert total_distributed_matches(res) == n


def test_distributed_join_diagonal_local_probe(mesh8):
    n_dev = 8
    per = 2048
    n = per * n_dev
    r = gen.fill_unique(n, jax.random.key(24))
    s = gen.fill_unique(n, jax.random.key(25))
    run = make_distributed_join(mesh8, per, per, CFG,
                                local_probe="diagonal")
    res = run(r, s)
    assert np.asarray(res.ok).all()
    assert total_distributed_matches(res) == n


def test_distributed_join_rows(mesh8):
    n_dev = 8
    per = 1024
    n = per * n_dev
    r = gen.fill_unique(n, jax.random.key(22))
    s = gen.fill_unique(n, jax.random.key(23))
    run = make_distributed_join(mesh8, per, per, CFG,
                                materialize_max_out=4 * per)
    rows = run(r, s)
    assert np.asarray(rows.ok).all()
    total = int(np.sum(np.asarray(rows.counts, dtype=np.int64)))
    assert total == n
    v = np.asarray(rows.valid)
    assert v.sum() == n
    rk = np.asarray(r.keys)
    sk = np.asarray(s.keys)
    rr = np.asarray(rows.r_rids)[v]
    sr = np.asarray(rows.s_rids)[v]
    np.testing.assert_array_equal(rk[rr], sk[sr])
    # every R row appears exactly once (unique-keys workload)
    assert len(set(rr.tolist())) == n


@pytest.mark.slow
def test_distributed_join_scale_1m_per_shard(mesh8):
    """Distributed join at 2^20 tuples/shard (8.4M/side over the mesh) —
    VERDICT r3 item 3: the CPU-mesh tests previously capped at 4K/shard,
    three orders below the reference's 20M/node workload (main.cpp:70-71).
    Mergecount local rung: pure XLA (no interpret-mode Pallas), so the
    scale costs seconds, not hours."""
    n_dev = 8
    per = 1 << 20
    n = per * n_dev
    r = gen.fill_unique(n, jax.random.key(40))
    s = gen.fill_unique(n, jax.random.key(41))
    run = make_distributed_join(mesh8, per, per, CFG,
                                local_probe="mergecount")
    res = run(r, s)
    assert np.asarray(res.ok).all()
    assert total_distributed_matches(res) == n


@pytest.mark.slow
def test_distributed_checked_capacity_boundary_at_scale(mesh8):
    """Capacity-boundary recovery at size: 40% of all keys route to one
    network partition, overflowing the mean-sized shuffle capacity on its
    owner; the checked wrapper must detect it (ok False) and escalate to
    the full-capacity mergecount rung with an exact count."""
    from radixjoin_tpu.engine.distributed import make_distributed_join_checked
    n_dev = 8
    per = 1 << 18
    n = per * n_dev
    rng = np.random.default_rng(42)
    def skewed():
        k = rng.integers(0, 2**31, n, dtype=np.uint32)
        hot = rng.random(n) < 0.4
        k[hot] &= ~np.uint32(31)          # pid 0 -> device 0
        return k
    rk, sk = skewed(), skewed()
    r = make_relation(rk, np.arange(n, dtype=np.uint32))
    s = make_relation(sk, np.arange(n, dtype=np.uint32))
    want = _np_join_count(rk, sk)
    run = make_distributed_join_checked(mesh8, per, per, CFG,
                                        local_probe="mergecount")
    got, escalated = run(r, s)
    assert escalated, "0.4n into one partition must overflow 1.3x/8 capacity"
    assert got == want


def test_all_written_invariant_trips_on_lost_put(mesh8, monkeypatch):
    """Loss injection (VERDICT r3 item 6): simulate lost S-side puts by
    invalidating one received slot in the S shuffle ONLY.  The old R-only
    reconciliation could not see this; the per-relation invariant
    (reference Window.cpp:180-191, called for both relations from
    NetworkPartitioning.cpp:220) must trip ok on every shard."""
    import radixjoin_tpu.engine.distributed as dist

    n_dev = 8
    per = 2048
    n = per * n_dev
    r = gen.fill_unique(n, jax.random.key(30))
    s = gen.fill_unique(n, jax.random.key(31))

    calls = {"n": 0}

    def lossy(keys, rids, dest, capacity, axis, drop_mask=None):
        shuf = shuffle_by_destination(keys, rids, dest, capacity, axis,
                                      drop_mask)
        calls["n"] += 1          # trace-time: call 1 = R, call 2 = S
        if calls["n"] == 2:
            # Drop the first received slot (sender 0's first put): with
            # per=2048 over 8 devices every sender fills slot 0 of every
            # segment, so this is a genuine lost tuple, not a no-op.
            shuf = shuf._replace(valid=shuf.valid.at[0].set(False))
        return shuf

    monkeypatch.setattr(dist, "shuffle_by_destination", lossy)
    run = dist.make_distributed_join(mesh8, per, per, CFG)
    res = run(r, s)
    assert calls["n"] == 2
    assert not np.asarray(res.ok).any(), (
        "S-side all-written invariant failed to trip on a lost put")


def test_distribute_sections(mesh8):
    n_dev = 8
    per = 1024
    n = per * n_dev
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**31, n, dtype=np.uint32)
    rids = np.arange(n, dtype=np.uint32)

    def shard_fn(k, r):
        rel = gen.distribute_sections(Relation(k, r), "nodes")
        return rel.keys[None], rel.rids[None]

    rk, rr = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh8, in_specs=(P("nodes"), P("nodes")),
        out_specs=(P("nodes"), P("nodes"))))(jnp.asarray(keys),
                                             jnp.asarray(rids))
    rk = np.asarray(rk).reshape(-1)
    rr = np.asarray(rr).reshape(-1)
    # global multiset of tuples preserved
    np.testing.assert_array_equal(np.sort(rr), rids)
    np.testing.assert_array_equal(keys[rr], rk)


def test_distributed_join_rows_dense(mesh8):
    """Dense windowed materialising local rung (round 4): per-shard
    outputs aligned to sorted received R rows; unique-keys oracle checks
    every emitted (r_rid, s_rid) pair joins equal keys and every R row
    appears exactly once."""
    n_dev = 8
    per = 2048
    n = per * n_dev
    r = gen.fill_unique(n, jax.random.key(26))
    s = gen.fill_unique(n, jax.random.key(27))
    run = make_distributed_join(mesh8, per, per, CFG,
                                materialize_dense=True)
    rows = run(r, s)
    assert np.asarray(rows.ok).all()
    cnt = np.asarray(rows.counts)
    assert int(cnt.sum()) == n
    m = cnt == 1
    rr = np.asarray(rows.r_rids)[m]
    sr = np.asarray(rows.s_rids)[m]
    assert m.sum() == n and len(set(rr.tolist())) == n
    rk = np.asarray(r.keys)
    sk = np.asarray(s.keys)
    np.testing.assert_array_equal(rk[rr], sk[sr])


def test_distributed_join_rows_dense_multi_flips_ok(mesh8):
    # duplicate R keys make some R rows multi-match: counts stay exact
    # but s_rids are rid-sums, so ok must flip (escalate to max_out form)
    n_dev = 8
    per = 1024
    n = per * n_dev
    rk = np.concatenate([np.arange(n // 2, dtype=np.uint32)] * 2)
    sk = np.random.default_rng(28).permutation(n // 2).astype(np.uint32)
    sk = np.concatenate([sk, sk])          # each S key twice as well
    r = make_relation(rk, np.arange(n, dtype=np.uint32))
    s = make_relation(sk, np.arange(n, dtype=np.uint32))
    run = make_distributed_join(mesh8, per, per, CFG,
                                materialize_dense=True)
    rows = run(r, s)
    assert not np.asarray(rows.ok).all()
    # counts remain exact: 2 matches per R row
    assert int(np.asarray(rows.counts).sum()) == 2 * n


# ---------------------------------------------------------------------------
# Round-5 fused RANGED distributed join (make_distributed_join_ranged)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("workload", ["unique", "general", "dups"])
@pytest.mark.parametrize("chunks", [1, 2])
def test_distributed_ranged_oracle(mesh8, workload, chunks):
    """Fused range-partitioned join vs the numpy oracle: dense unique
    keys (all land on one device without the relabel bijection), a
    general random workload, and a duplicate-heavy one."""
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join_ranged, total_distributed_matches_ranged,
        ranged_ok)
    n_dev = 8
    per = 2048
    n = per * n_dev
    rng = np.random.default_rng(31)
    if workload == "unique":
        r = gen.fill_unique(n, jax.random.key(2))
        s = gen.fill_unique(n, jax.random.key(3))
        rk, sk = np.asarray(r.keys), np.asarray(s.keys)
        want = n
    elif workload == "general":
        rk = rng.integers(0, 50000, n, dtype=np.uint32)
        sk = rng.integers(0, 50000, n, dtype=np.uint32)
        want = _np_join_count(rk, sk)
    else:
        rk = rng.integers(0, 400, n, dtype=np.uint32)
        sk = rng.integers(0, 400, n, dtype=np.uint32)
        want = _np_join_count(rk, sk)
    run = make_distributed_join_ranged(mesh8, per, per, CFG,
                                       local_ranges=8, send_chunks=chunks)
    res = run(jnp.asarray(rk), jnp.asarray(sk))
    assert ranged_ok(res), "capacity should hold at these sizes"
    assert total_distributed_matches_ranged(res) == want


def test_distributed_ranged_sentinel_preimages(mesh8):
    """Keys whose relabeled image lands in the sentinel zone must be
    counted exactly through the closed-form path, never shuffled."""
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join_ranged, total_distributed_matches_ranged,
        ranged_ok)
    n_dev = 8
    per = 1024
    n = per * n_dev
    inv = pow(0x9E3779B1, -1, 1 << 32)
    rng = np.random.default_rng(33)
    rk = rng.integers(0, 10**6, n, dtype=np.uint32)
    sk = rng.integers(0, 10**6, n, dtype=np.uint32)
    for i in range(16):      # every pad-zone preimage appears on both sides
        p = ((0xFFFFFFF0 + i) * inv) % (1 << 32)
        rk[i * 3:(i + 1) * 3] = p
        sk[i * 5:(i + 1) * 5] = p
    want = _np_join_count(rk, sk)
    run = make_distributed_join_ranged(mesh8, per, per, CFG,
                                       local_ranges=4, send_chunks=1)
    res = run(jnp.asarray(rk), jnp.asarray(sk))
    assert ranged_ok(res)
    assert total_distributed_matches_ranged(res) == want


def test_distributed_ranged_skew_aware(mesh8):
    """A hot key under range partitioning hotspots its owner; the
    skew_aware pre-pass drops it before the shuffle so capacity holds."""
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join_ranged, total_distributed_matches_ranged,
        ranged_ok)
    n_dev = 8
    per = 2048
    n = per * n_dev
    hot = n // 3
    rng = np.random.default_rng(34)
    rk = np.asarray(gen.fill_unique(n, jax.random.key(9)).keys)
    sk = np.concatenate([rng.integers(0, n, n - hot, dtype=np.uint32),
                         np.full(hot, 12345, np.uint32)])
    rng.shuffle(sk)
    want = _np_join_count(rk, sk)
    run = make_distributed_join_ranged(mesh8, per, per, CFG,
                                       local_ranges=8, send_chunks=1,
                                       skew_aware=True)
    res = run(jnp.asarray(rk), jnp.asarray(sk))
    assert ranged_ok(res), "heavy pre-pass should keep capacity"
    assert total_distributed_matches_ranged(res) == want


def test_distributed_ranged_checked_escalates(mesh8):
    """A sub-range capacity overflow (undetectable mid-tail dup run with
    tight slack) must flip range_ok and the checked wrapper must recover
    the exact count through the terminal rung."""
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join_ranged, make_distributed_join_ranged_checked,
        ranged_ok)
    n_dev = 8
    per = 1024
    n = per * n_dev
    rng = np.random.default_rng(35)
    # 4 keys x 2048 copies with skew_aware off: each key's whole mass
    # lands on one (source, sub-range) slot and overflows the tight cap
    base_keys = rng.integers(0, 2**31, n // 2048, dtype=np.uint32)
    rk = np.repeat(base_keys, 2048)
    sk = np.repeat(base_keys, 2048)
    rng.shuffle(rk); rng.shuffle(sk)
    want = _np_join_count(rk, sk)
    kw = dict(local_ranges=8, send_chunks=1, range_slack=1.01)
    run = make_distributed_join_ranged(mesh8, per, per, CFG, **kw)
    res = run(jnp.asarray(rk), jnp.asarray(sk))
    assert not ranged_ok(res), "tight slack should overflow on dup runs"
    checked = make_distributed_join_ranged_checked(mesh8, per, per, CFG,
                                                   **kw)
    got, escalated = checked(jnp.asarray(rk), jnp.asarray(sk))
    assert escalated and got == want


def test_distributed_rows_dense_skew_full_rowset(mesh8):
    """Round-5 skew-aware materialising join (VERDICT r4 item 3): dense
    light rows + heavy-key closed-form blocks reconstruct EXACTLY the
    oracle row set under a hot-key workload."""
    from radixjoin_tpu.engine.distributed import (
        heavy_row_blocks, total_rows_dense_skew)
    n_dev = 8
    per = 2048
    n = per * n_dev
    hot = n // 4
    rng = np.random.default_rng(41)
    r = gen.fill_unique(n, jax.random.key(42))
    rk = np.asarray(r.keys)
    # S: unique permutation sample (light, 1:1) + hot copies of key 321
    perm = rng.permutation(n).astype(np.uint32)
    sk = np.concatenate([perm[:n - hot], np.full(hot, 321, np.uint32)])
    sr = np.arange(n, dtype=np.uint32)
    order = rng.permutation(n)
    sk, sr = sk[order], sr[order]
    s = make_relation(sk, sr)

    # oracle pair set (r_rid, s_rid)
    key2rrid = {int(k): i for i, k in enumerate(rk)}
    want = {(key2rrid[int(k)], int(rid)) for k, rid in zip(sk, sr)}

    run = make_distributed_join(mesh8, per, per, CFG, skew_aware=True,
                                materialize_dense=True)
    res = run(r, s)
    assert np.asarray(res.ok).all(), "light dense part must stay clean"

    got = set()
    cnt = np.asarray(res.counts)
    rr_ = np.asarray(res.r_rids)
    sr_ = np.asarray(res.s_rids)
    m = cnt == 1
    assert (cnt <= 1).all(), "light rows must be unique-match here"
    got.update(zip(rr_[m].tolist(), sr_[m].tolist()))
    for key, (hr, hs) in heavy_row_blocks(res).items():
        for a in hr.tolist():
            for b in hs.tolist():
                got.add((key2rrid[int(key)] if False else a, b))
    # heavy blocks carry ORIGINAL rids; rows are (r_rid, s_rid) products
    assert got == want
    assert total_rows_dense_skew(res) == len(want)


# ---------------------------------------------------------------------------
# Round-5 materialising RANGED distributed join
# (make_distributed_join_ranged_rows)
# ---------------------------------------------------------------------------


def _ranged_rows_pairs(res):
    """Collect the light (r_rid, s_rid) pairs from a DistributedRangedRows
    (requires every light count <= 1) plus the heavy block products."""
    from radixjoin_tpu.engine.distributed import heavy_row_blocks
    cnt = np.asarray(res.counts)
    assert (cnt <= 1).all(), "light rows must be unique-match here"
    rr_ = np.asarray(res.r_rids)
    sr_ = np.asarray(res.s_rids)
    m = cnt == 1
    got = set(zip(rr_[m].tolist(), sr_[m].tolist()))
    for _key, (hr, hs) in heavy_row_blocks(res).items():
        for a in hr.tolist():
            for b in hs.tolist():
                got.add((a, b))
    return got


@pytest.mark.parametrize("chunks", [1, 2])
def test_distributed_ranged_rows_unique(mesh8, chunks):
    """Rows form of the fused ranged path: dense unique keys reconstruct
    the exact oracle row set through the chunk-sorted rid planes and the
    per-range windowed emit."""
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join_ranged_rows, total_distributed_rows_ranged,
        ranged_rows_ok)
    n_dev = 8
    per = 2048
    n = per * n_dev
    r = gen.fill_unique(n, jax.random.key(50))
    s = gen.fill_unique(n, jax.random.key(51))
    rk, rr_np = np.asarray(r.keys), np.asarray(r.rids)
    sk, sr_np = np.asarray(s.keys), np.asarray(s.rids)
    key2rrid = {int(k): int(rid) for k, rid in zip(rk, rr_np)}
    want = {(key2rrid[int(k)], int(rid)) for k, rid in zip(sk, sr_np)}
    run = make_distributed_join_ranged_rows(mesh8, per, per, CFG,
                                            local_ranges=8,
                                            send_chunks=chunks)
    res = run(r, s)
    assert ranged_rows_ok(res), "capacity/emit should hold at these sizes"
    assert _ranged_rows_pairs(res) == want
    assert total_distributed_rows_ranged(res) == len(want)


def test_distributed_ranged_rows_sentinel_preimages(mesh8):
    """Sentinel-zone relabel preimages must come back as heavy block
    products with ORIGINAL rids, never cross the wire."""
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join_ranged_rows, total_distributed_rows_ranged,
        ranged_rows_ok)
    n_dev = 8
    per = 1024
    n = per * n_dev
    inv = pow(0x9E3779B1, -1, 1 << 32)
    rng = np.random.default_rng(52)
    rk = (rng.permutation(n).astype(np.uint32) * np.uint32(2)
          + np.uint32(10 ** 6))          # unique, off the preimage values
    sk = (rng.permutation(n).astype(np.uint32) * np.uint32(2)
          + np.uint32(10 ** 6))
    for i in range(4):                   # 4 preimages, multi-copy both sides
        p = ((0xFFFFFFF0 + i) * inv) % (1 << 32)
        rk[i * 3:(i + 1) * 3] = p
        sk[i * 5:(i + 1) * 5] = p
    rr_np = np.arange(n, dtype=np.uint32)
    sr_np = np.arange(n, dtype=np.uint32)
    want = set()
    for k in np.intersect1d(rk, sk):
        for a in np.where(rk == k)[0]:
            for b in np.where(sk == k)[0]:
                want.add((int(a), int(b)))
    run = make_distributed_join_ranged_rows(mesh8, per, per, CFG,
                                            local_ranges=4, send_chunks=1)
    res = run(make_relation(rk, rr_np), make_relation(sk, sr_np))
    assert ranged_rows_ok(res)
    assert _ranged_rows_pairs(res) == want
    assert total_distributed_rows_ranged(res) == len(want)


def test_distributed_ranged_rows_skew_aware(mesh8):
    """A hot key's rows come back as a closed-form block via the skew
    pre-pass; light rows stay dense — full row set exact."""
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join_ranged_rows, total_distributed_rows_ranged,
        ranged_rows_ok)
    n_dev = 8
    per = 2048
    n = per * n_dev
    hot = n // 4
    rng = np.random.default_rng(53)
    r = gen.fill_unique(n, jax.random.key(54))
    rk, rr_np = np.asarray(r.keys), np.asarray(r.rids)
    perm = rng.permutation(n).astype(np.uint32)
    sk = np.concatenate([perm[:n - hot], np.full(hot, 321, np.uint32)])
    sr_np = np.arange(n, dtype=np.uint32)
    order = rng.permutation(n)
    sk, sr_np = sk[order], sr_np[order]
    key2rrid = {int(k): int(rid) for k, rid in zip(rk, rr_np)}
    want = {(key2rrid[int(k)], int(rid)) for k, rid in zip(sk, sr_np)}
    run = make_distributed_join_ranged_rows(mesh8, per, per, CFG,
                                            local_ranges=8, send_chunks=1,
                                            skew_aware=True)
    res = run(r, make_relation(sk, sr_np))
    assert ranged_rows_ok(res), "heavy pre-pass should keep capacity"
    assert _ranged_rows_pairs(res) == want
    assert total_distributed_rows_ranged(res) == len(want)


def test_distributed_ranged_rows_checked_escalates(mesh8):
    """A hot key with skew_aware OFF trips the per-range emit (multi-match
    R rows); the checked wrapper recovers the full row set through the
    radix dense+skew rung."""
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join_ranged_rows,
        make_distributed_join_ranged_rows_checked,
        heavy_row_blocks, ranged_rows_ok, total_rows_dense_skew)
    n_dev = 8
    per = 1024
    n = per * n_dev
    hot = n // 4
    rng = np.random.default_rng(55)
    r = gen.fill_unique(n, jax.random.key(56))
    rk, rr_np = np.asarray(r.keys), np.asarray(r.rids)
    # hot key 321 on BOTH sides: per-range dup mass -> emit multi trips
    sk = np.asarray(gen.fill_unique(n, jax.random.key(57)).keys).copy()
    sk[:hot] = rk[0]
    sr_np = np.arange(n, dtype=np.uint32)
    order = rng.permutation(n)
    sk, sr_np = sk[order], sr_np[order]
    rk2 = rk.copy()
    rk2[1:17] = rk[0]                   # dup rows on R too
    r2 = make_relation(rk2, rr_np)
    key2cnt_r = {}
    for k in rk2:
        key2cnt_r[int(k)] = key2cnt_r.get(int(k), 0) + 1
    want_total = _np_join_count(rk2, sk)
    kw = dict(local_ranges=8, send_chunks=1)
    run = make_distributed_join_ranged_rows(mesh8, per, per, CFG, **kw)
    res = run(r2, make_relation(sk, sr_np))
    assert not ranged_rows_ok(res), "hot-key dup rows should trip emit"
    checked = make_distributed_join_ranged_rows_checked(mesh8, per, per,
                                                        CFG, **kw)
    res2, escalated = checked(r2, make_relation(sk, sr_np))
    assert escalated
    assert total_rows_dense_skew(res2) == want_total
