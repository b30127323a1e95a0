"""Weak-scaling curve + ICI-byte model on the virtual CPU mesh.

Substitute evidence for the BASELINE >80% scaling-efficiency target
(VERDICT r4 weak #7 / item 10): real multi-chip is environment-blocked,
so this produces (a) a 1->8-shard weak-scaling curve (fixed tuples per
shard) on the virtual CPU mesh — mechanical validation that the SPMD
program's work per shard stays flat — and (b) the per-phase ICI-byte
MODEL the day real hardware appears: exact padded all_to_all bytes per
shard as a function of (capacity, n_dev), vs the ideal
(n_dev-1)/n_dev * shard_bytes, quantifying the padded-capacity waste.

CPU-mesh timings say nothing about ICI bandwidth (collectives are
memcpys) — the model is the falsifiable artifact; the curve checks that
per-shard device work does not grow with the mesh.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python -m benchmarks.weak_scaling [--per 65536] [--reps 3]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per", type=int, default=1 << 16)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from radixjoin_tpu import JoinConfig
    from radixjoin_tpu.data import relation as gen
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join, total_distributed_matches,
        make_distributed_join_ranged, total_distributed_matches_ranged,
        ranged_ok)

    devs = jax.devices()
    per = args.per
    cfg = JoinConfig(use_pallas=False, allocation_factor=1.3)

    print(f"{'ndev':>4} {'path':>8} {'ms/rep':>8} {'eff%':>6} "
          f"{'cap':>8} {'sent MB/shard':>14} {'ideal MB':>9} {'waste%':>7}")
    base = {}
    for n_dev in (1, 2, 4, 8):
        if n_dev > len(devs):
            break
        mesh = Mesh(np.asarray(devs[:n_dev]), ("nodes",))
        n = per * n_dev
        r = gen.fill_unique(n, jax.random.key(0))
        s = gen.fill_unique(n, jax.random.key(1))

        # ---- 4-phase radix path ----
        run = make_distributed_join(mesh, per, per, cfg)
        res = run(r, s)
        assert total_distributed_matches(res) == n
        t0 = time.perf_counter()
        for _ in range(args.reps):
            res = run(r, s)
            np.asarray(res.partial_matches)
        dt = (time.perf_counter() - t0) / args.reps
        # ICI-byte model: each relation's shuffle is one padded
        # all_to_all of (key, rid, valid) per shard
        cap = cfg.shuffle_capacity(per, n_dev)
        sent = 2 * n_dev * cap * (4 + 4 + 1)          # R and S
        cross = sent * (n_dev - 1) / max(1, n_dev)    # leaves the chip
        ideal = 2 * per * 8 * (n_dev - 1) / max(1, n_dev)
        waste = 100.0 * (cross - ideal) / ideal if ideal else 0.0
        base.setdefault("radix", dt)
        eff = 100.0 * base["radix"] / dt
        print(f"{n_dev:>4} {'radix':>8} {dt*1e3:>8.1f} {eff:>6.1f} "
              f"{cap:>8} {cross/1e6:>14.2f} {ideal/1e6:>9.2f} "
              f"{waste:>7.1f}")

        # ---- ranged fused path (count, keys only on the wire) ----
        runr = make_distributed_join_ranged(mesh, per, per, cfg,
                                            local_ranges=8, send_chunks=2)
        resr = runr(r.keys, s.keys)
        assert ranged_ok(resr)
        assert total_distributed_matches_ranged(resr) == n
        t0 = time.perf_counter()
        for _ in range(args.reps):
            resr = runr(r.keys, s.keys)
            np.asarray(resr.ok)
        dtr = (time.perf_counter() - t0) / args.reps
        import math
        from radixjoin_tpu.config import next_multiple
        chunk = per // 2
        cap_c = per if n_dev == 1 else next_multiple(
            math.ceil(chunk / n_dev * cfg.allocation_factor), 128)
        sent_r = 2 * n_dev * 2 * cap_c * 4            # C=2 chunks, keys only
        cross_r = sent_r * (n_dev - 1) / max(1, n_dev)
        ideal_r = 2 * per * 4 * (n_dev - 1) / max(1, n_dev)
        waste_r = 100.0 * (cross_r - ideal_r) / ideal_r if ideal_r else 0.0
        base.setdefault("ranged", dtr)
        effr = 100.0 * base["ranged"] / dtr
        print(f"{n_dev:>4} {'ranged':>8} {dtr*1e3:>8.1f} {effr:>6.1f} "
              f"{cap_c:>8} {cross_r/1e6:>14.2f} {ideal_r/1e6:>9.2f} "
              f"{waste_r:>7.1f}")


if __name__ == "__main__":
    main()
