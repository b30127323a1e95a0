"""Measured statement on chunked-shuffle overlap (VERDICT r1 item 6).

Times the full distributed join at shuffle_rounds in {1, 2, 4} on the
8-virtual-device CPU mesh and prints the deltas.  What this CAN measure:
the cost of splitting the exchange (extra collective dispatches, padding
divisibility).  What it CANNOT measure: real ICI transfer/compute
overlap — XLA:CPU executes collectives as synchronous thunks, and this
host exposes one TPU chip, so a >=2-chip ICI measurement is impossible
here.  The result is recorded in BENCH_NOTES.md as the honest bound on
what the chunked path is known to do.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python -m benchmarks.shuffle_overlap_check
"""

import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from jax.sharding import Mesh
    from radixjoin_tpu import JoinConfig
    from radixjoin_tpu.data import relation as gen
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join, total_distributed_matches)

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), ("nodes",))
    per = 1 << 15
    n = per * 8
    cfg = JoinConfig(use_pallas=False, allocation_factor=1.4)
    r = gen.fill_unique(n, jax.random.key(0))
    s = gen.fill_unique(n, jax.random.key(1))

    results = {}
    for rounds in (1, 2, 4):
        run = make_distributed_join(mesh, per, per, cfg,
                                    shuffle_rounds=rounds,
                                    local_probe="diagonal")
        res = run(r, s)                       # compile + warm
        assert total_distributed_matches(res) == n
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            res = run(r, s)
            jax.block_until_ready(res.partial_matches)
            ts.append(time.perf_counter() - t0)
        results[rounds] = float(np.median(ts))
        log(f"shuffle_rounds={rounds}: median {results[rounds]*1e3:.1f} ms "
            f"over 5 reps (8-dev CPU mesh, {per} tuples/shard/side)")

    base = results[1]
    for rounds in (2, 4):
        log(f"rounds={rounds} vs 1: {100*(results[rounds]/base-1):+.1f}%")
    log("NOTE: XLA:CPU runs collectives synchronously — this measures the "
        "chunking overhead only; ICI overlap needs >=2 real chips.")


if __name__ == "__main__":
    main()
