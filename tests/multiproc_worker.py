"""Worker for the multi-process ``jax.distributed`` smoke test — one OS
process per "node", the reference's one-MPI-rank-per-node execution model
(main.cpp:36-48, launched as ``mpirun -np N``; SURVEY.md §4 "plain MPI, so
mpirun -np N on one machine exercises the distributed path").

Launched by tests/test_multiprocess.py with RADIXJOIN_COORDINATOR /
RADIXJOIN_NUM_PROCESSES / RADIXJOIN_PROCESS_ID in the environment; each
process contributes its local CPU devices to the global mesh, runs the
SAME SPMD join on its shard of deterministic global data, and verifies
the aggregated count — then prints ``RANK <i> OK``.
"""

import os
import sys

# Local virtual CPU devices must be configured before the backend exists.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count="
                           + os.environ.get("WORKER_LOCAL_DEVICES", "2")
                           ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from radixjoin_tpu.parallel import multihost  # noqa: E402

assert multihost.initialize(), "coordinator env missing"

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from radixjoin_tpu import JoinConfig, make_relation  # noqa: E402
from radixjoin_tpu.data.tuples import Relation  # noqa: E402
from radixjoin_tpu.engine.distributed import (  # noqa: E402
    make_distributed_join, total_distributed_matches)


def _np_join_count(rk, sk):
    r_u, r_c = np.unique(rk, return_counts=True)
    s_u, s_c = np.unique(sk, return_counts=True)
    _, ri, si = np.intersect1d(r_u, s_u, return_indices=True)
    return int(np.sum(r_c[ri].astype(np.int64) * s_c[si].astype(np.int64)))


def main():
    variant = os.environ.get("RADIXJOIN_VARIANT", "plain")
    pid, nproc = multihost.process_info()
    devs = jax.devices()               # global, grouped by process
    n_local = len(jax.local_devices())
    assert len(devs) == nproc * n_local
    mesh = Mesh(np.array(devs), ("nodes",))

    per = 512
    n = per * len(devs)
    rng = np.random.default_rng(0)     # same global data in every process
    rk = rng.integers(0, 3000, n, dtype=np.uint32)
    sk = rng.integers(0, 3000, n, dtype=np.uint32)
    if variant == "skew":
        # heavy-hitter S side: the skew pre-pass (phase 0) must detect
        # key 321 across the process boundary (all_gather of per-shard
        # candidates + psum of exact counts) and keep it out of the
        # shuffle entirely.
        sk[: n // 4] = 321
        rng.shuffle(sk)
    rr = np.arange(n, dtype=np.uint32)
    want = _np_join_count(rk, sk)

    sharding = NamedSharding(mesh, P("nodes"))
    rows_local = n // nproc

    def garr(x):
        local = x[pid * rows_local:(pid + 1) * rows_local]
        return jax.make_array_from_process_local_data(sharding, local, (n,))

    r = Relation(garr(rk), garr(rr))
    s = Relation(garr(sk), garr(rr))

    cfg = JoinConfig(use_pallas=False, allocation_factor=2.0)
    from radixjoin_tpu.engine.distributed import _fetch
    if variant == "ranged":
        # round-5 fused ranged path across the process boundary: the
        # relabel-spread range partition + fori_loop local mergecount,
        # with psum'd send-count invariants crossing processes
        from radixjoin_tpu.engine.distributed import (
            make_distributed_join_ranged, total_distributed_matches_ranged,
            ranged_ok)
        run = make_distributed_join_ranged(mesh, per, per, cfg,
                                           local_ranges=4, send_chunks=2)
        res = run(garr(rk), garr(sk))
        assert ranged_ok(res), "ranged capacity/invariant tripped"
        got = total_distributed_matches_ranged(res)
        assert got == want, f"rank {pid}: {got} != {want}"
    elif variant == "ranged-rows":
        # round-5 materialising ranged path across the process boundary:
        # rid planes through the chunk sorts + per-range emit; unique
        # 1:1 keys so every light count is 1 and each rid appears once
        from radixjoin_tpu.engine.distributed import (
            make_distributed_join_ranged_rows,
            total_distributed_rows_ranged, ranged_rows_ok,
            heavy_row_blocks)
        rku = rng.permutation(n).astype(np.uint32)
        sku = rng.permutation(n).astype(np.uint32)
        want = n
        run = make_distributed_join_ranged_rows(mesh, per, per, cfg,
                                                local_ranges=4,
                                                send_chunks=2)
        res = run(Relation(garr(rku), garr(rr)),
                  Relation(garr(sku), garr(rr)))
        assert ranged_rows_ok(res), "ranged-rows capacity/emit tripped"
        got = total_distributed_rows_ranged(res)
        assert got == want, f"rank {pid}: {got} != {want}"
        cnt = _fetch(res.counts)
        m = cnt == 1
        sum_s = int(_fetch(res.s_rids)[m].astype(np.int64).sum())
        for _k, (hr, hs) in heavy_row_blocks(res).items():
            sum_s += int(hs.astype(np.int64).sum()) * len(hr)
        assert sum_s == n * (n - 1) // 2, "s-rid checksum mismatch"
    elif variant == "materialize":
        run = make_distributed_join(mesh, per, per, cfg,
                                    materialize_max_out=4 * per)
        rows = run(r, s)
        assert _fetch(rows.ok).all(), "materialising ok flag tripped"
        got = int(np.sum(_fetch(rows.counts).astype(np.int64)))
        assert got == want, f"rank {pid}: {got} != {want}"
        # row triples reference original global rids — check key equality
        v = _fetch(rows.valid)
        rrids = _fetch(rows.r_rids)[v]
        srids = _fetch(rows.s_rids)[v]
        assert rrids.shape[0] == want
        np.testing.assert_array_equal(rk[rrids], sk[srids])
    else:
        run = make_distributed_join(mesh, per, per, cfg,
                                    skew_aware=(variant == "skew"))
        res = run(r, s)
        assert _fetch(res.ok).all(), "distributed ok flag tripped"
        if variant == "skew":
            assert int(np.max(np.abs(_fetch(res.heavy_cs)))) > 0, \
                "skew pre-pass detected no heavy key"
        got = total_distributed_matches(res)
        assert got == want, f"rank {pid}: {got} != {want}"
    print(f"RANK {pid} OK ({got} matches over {nproc} processes, "
          f"{len(devs)} devices, variant={variant})", flush=True)


if __name__ == "__main__":
    main()
