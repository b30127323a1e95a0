"""In-HBM large-N count join: the north-star scale WITHOUT the spill path.

The v5e chip has 16 GB HBM; a keys-only count join needs 4 B/tuple/side,
so the BASELINE.json north-star 1B x 1B fits on-chip — with one caveat:
XLA's flat lax.sort exhausts HBM beyond 2^29 u32 elements (its scratch is
~2x the operand), so above that the engine splits each side into sorted
RUNS and probes run pairs (engine/large.py join_count_keys_runs).

Measured (this file, single v5e through the relay):
  logn=28 runs=1: warm 3.55 s total (151 Mt/s) — sort 0.95 s/side,
                  probe 1.64 s (superlinear: XLA searchsorted of the row
                  heads; see probe scaling notes in BENCH_NOTES.md)

Usage: python -m benchmarks.tpu_inhbm_check [--logn 28] [--runs 1]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from radixjoin_tpu.engine.large import (gen_unique_keys_run,
                                        join_count_keys_runs)


def sync(x):
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=28)
    ap.add_argument("--runs", type=int, default=1, help="runs per side")
    ap.add_argument("--k", type=int, default=16, help="diagonal k_drift")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"
    n = 1 << args.logn
    rsrc = gen_unique_keys_run(n, 2654435761 | 1)
    ssrc = gen_unique_keys_run(n, 0x9E3779B1 ^ 0x40)

    for rep in range(args.reps):
        t0 = time.perf_counter()
        m, ok = join_count_keys_runs(rsrc, ssrc, r_runs=args.runs,
                                     s_runs=args.runs, k_drift=args.k,
                                     sync=sync, n_r_total=n, n_s_total=n)
        mv, okv = int(m), bool(ok)
        dt = time.perf_counter() - t0
        tag = "cold" if rep == 0 else "warm"
        print(f"{tag}: {mv} matches (want {n}) ok={okv} "
              f"join {dt:.2f} s ({2*n/dt/1e6:.1f} Mt/s)", flush=True)
        assert mv == n and okv


if __name__ == "__main__":
    main()
