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


def main():
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
    rr = np.arange(n, dtype=np.uint32)

    r_u, r_c = np.unique(rk, return_counts=True)
    s_u, s_c = np.unique(sk, return_counts=True)
    _, ri, si = np.intersect1d(r_u, s_u, return_indices=True)
    want = int(np.sum(r_c[ri].astype(np.int64) * s_c[si].astype(np.int64)))

    sharding = NamedSharding(mesh, P("nodes"))
    rows_local = n // nproc

    def garr(x):
        local = x[pid * rows_local:(pid + 1) * rows_local]
        return jax.make_array_from_process_local_data(sharding, local, (n,))

    r = Relation(garr(rk), garr(rr))
    s = Relation(garr(sk), garr(rr))

    cfg = JoinConfig(use_pallas=False, allocation_factor=2.0)
    run = make_distributed_join(mesh, per, per, cfg)
    res = run(r, s)
    from radixjoin_tpu.engine.distributed import _fetch
    assert _fetch(res.ok).all(), "distributed ok flag tripped"
    got = total_distributed_matches(res)
    assert got == want, f"rank {pid}: {got} != {want}"
    print(f"RANK {pid} OK ({got} matches over {nproc} processes, "
          f"{len(devs)} devices)", flush=True)


if __name__ == "__main__":
    main()
