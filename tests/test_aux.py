"""Auxiliary-subsystem tests: measurements, native runtime, debug utils
(SURVEY.md §5 — subsystems the reference lacks tests for entirely)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from radixjoin_tpu.perf.measurements import Measurements, PhaseStats
from radixjoin_tpu.utils import debug as dbg
from radixjoin_tpu.utils import thread
from radixjoin_tpu import native


def test_measurements_phases_and_artifacts(tmp_path):
    m = Measurements(node_id=0, n_nodes=1)
    with m.phase("JOIN", tuples=1000, hbm_bytes=10**6):
        x = jnp.arange(1024).sum()
    with m.phase("JOIN", tuples=500):
        pass
    rep = m.report()
    assert rep["phases"]["JOIN"]["calls"] == 2
    assert rep["phases"]["JOIN"]["tuples"] == 1500
    assert "mtuples_per_s" in rep["phases"]["JOIN"]
    d = m.store(str(tmp_path))
    assert os.path.exists(os.path.join(d, "0.perf"))
    assert os.path.exists(os.path.join(d, "0.info"))
    with open(os.path.join(d, "0.perf")) as f:
        content = f.read()
    assert "JOIN\t" in content and "JOIN_TUPLES\t1500" in content
    with open(os.path.join(d, "0.info")) as f:
        info = f.read()
    assert "NUMNODES\t1" in info


def test_sol_fraction():
    m = Measurements(hbm_gbps=100.0)
    st = PhaseStats("X", seconds=1.0, hbm_bytes=50 * 10**9)
    assert abs(m.sol_fraction(st) - 0.5) < 1e-9
    st2 = PhaseStats("Y", seconds=1.0)
    assert m.sol_fraction(st2) is None


def test_native_generators_deterministic():
    k1, r1 = native.fill_unique(4096, 7, seed=99)
    k2, r2 = native.fill_unique(4096, 7, seed=99)
    np.testing.assert_array_equal(k1, k2)
    assert sorted(k1.tolist()) == list(range(7, 7 + 4096))
    k3, _ = native.fill_unique(4096, 7, seed=100)
    assert not (k1 == k3).all()


def test_native_zipf_is_skewed():
    k, _ = native.fill_zipf(100000, 10000, theta=1.2, seed=3)
    assert k.max() < 10000
    counts = np.bincount(k, minlength=10000)
    # rank-1 key dominates and the tail is long
    assert counts[1] > 100 * max(1, counts[5000])


def test_native_oracle_vs_numpy():
    rng = np.random.default_rng(11)
    r = rng.integers(0, 1000, 5000, dtype=np.uint32)
    s = rng.integers(0, 1000, 7000, dtype=np.uint32)
    r_u, r_c = np.unique(r, return_counts=True)
    s_u, s_c = np.unique(s, return_counts=True)
    _, ri, si = np.intersect1d(r_u, s_u, return_indices=True)
    want = int(np.sum(r_c[ri].astype(np.int64) * s_c[si]))
    assert native.join_count_oracle(r, s) == want


def test_native_radix_partition_vs_numpy():
    rng = np.random.default_rng(21)
    for n, bits in ((5000, 2), (1 << 17, 4), ((1 << 20) + 77, 3)):
        keys = rng.integers(0, 2**32 - 16, n, dtype=np.uint32)
        out, counts = native.radix_partition_keys(keys, bits)
        pid = keys >> np.uint32(32 - bits)
        np.testing.assert_array_equal(counts,
                                      np.bincount(pid, minlength=1 << bits))
        starts = np.cumsum(counts) - counts
        for p in range(1 << bits):
            seg = out[int(starts[p]):int(starts[p] + counts[p])]
            # segment holds exactly partition p's keys (order-free check)
            np.testing.assert_array_equal(np.sort(seg),
                                          np.sort(keys[pid == p]))


def test_native_arena():
    if not native.available():
        pytest.skip("native lib unavailable")
    lib = native._load()
    a = lib.arena_create(1 << 16)
    assert a
    p1 = lib.arena_alloc(a, 100)
    p2 = lib.arena_alloc(a, 100)
    assert p1 and p2
    assert p1 % 64 == 0 and p2 % 64 == 0          # Pool.cpp 64B alignment
    assert p2 - p1 == 128                          # rounded to 64B
    assert lib.arena_used(a) == 256
    lib.arena_reset(a)
    assert lib.arena_used(a) == 0
    p3 = lib.arena_alloc(a, 1 << 20)               # exceeds slab
    assert p3 is None
    lib.arena_destroy(a)


def test_debug_utils(capsys, monkeypatch):
    monkeypatch.setattr(dbg, "DEBUG", True)
    dbg.join_debug("AREA", "hello %d", 42)
    dbg.dump_array("buf", jnp.arange(5))
    snap = dbg.memory_snapshot("t")
    err = capsys.readouterr().err
    assert "[AREA] hello 42" in err
    assert "buf: [0, 1, 2, 3, 4]" in err
    assert "VmRSS" in snap
    with pytest.raises(AssertionError):
        dbg.join_assert(False, "AREA", "boom")


def test_thread_pinning_roundtrip():
    cores = thread.pinned_cores()
    assert cores
    core = min(cores)
    assert thread.pin_to_core(core)
    assert thread.pinned_cores() == {core}
    os.sched_setaffinity(0, cores)  # restore


def test_measurements_detail_tier(tmp_path):
    # Per-step counters (reference MEASUREMENT_DETAILS,
    # Measurements.cpp:247-541): runtime-gated, summed per tag, emitted
    # as tagged .perf lines + a "details" block in the JSON report.
    m = Measurements(node_id=0, n_nodes=1, details_enabled=True)
    for k in range(3):
        with m.detail("RUN_GEN_SORT", elements=100):
            pass
    with m.detail("PAIR_PROBE_DISPATCH", elements=7):
        pass
    assert m.details["RUN_GEN_SORT"].calls == 3
    assert m.details["RUN_GEN_SORT"].elements == 300
    rep = m.report()
    assert rep["details"]["PAIR_PROBE_DISPATCH"]["elements"] == 7
    d = m.store(str(tmp_path))
    perf = open(f"{d}/0.perf").read()
    assert "RUN_GEN_SORT_CALLS\t3" in perf
    assert "RUN_GEN_SORT_ELEMS\t300" in perf
    # default-off: zero overhead path records nothing
    m2 = Measurements(details_enabled=False)
    with m2.detail("X", elements=1):
        pass
    assert not m2.details


def test_ooc_detail_counters():
    # the out-of-core presorted path records per-bucket encode/dispatch
    # steps when a details-enabled Measurements rides along
    import numpy as np
    from radixjoin_tpu import JoinConfig
    from radixjoin_tpu.engine.outofcore import join_count_outofcore
    n = 1 << 12
    rng = np.random.default_rng(77)
    rk = rng.permutation(n).astype(np.uint32)
    sk = rng.permutation(n).astype(np.uint32)
    cfg = JoinConfig(use_pallas=True, diagonal_k=8,
                     diagonal_rows_per_group=8)
    m = Measurements(details_enabled=True)
    got = join_count_outofcore(rk, np.arange(n, dtype=np.uint32),
                               sk, np.arange(n, dtype=np.uint32),
                               cfg, coarse_bits=2, spill="host",
                               mode="diagonal", meas=m)
    assert got == n
    assert m.details["OOC_BUCKET_DISPATCH"].calls == 4
    assert m.details["OOC_BUCKET_DISPATCH"].elements == 2 * n
