"""On-chip check + timing of the fused ranged distributed join with the
skew_aware phase 0 at scale: a hot key that would hotspot its range
owner is detected, dropped before the shuffle, and counted closed-form;
the count is verified against the host oracle.

Usage: python -m benchmarks.tpu_ranged_skew_check [--logn 27] [--reps 3]
Run detached (fresh-process compile is minutes).
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from radixjoin_tpu import JoinConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=27)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hot-frac", type=int, default=16,
                    help="S hot-key rows = n / hot_frac")
    args = ap.parse_args()
    from radixjoin_tpu.engine.distributed import (
        make_distributed_join_ranged, total_distributed_matches_ranged,
        ranged_ok)

    n = 1 << args.logn
    hot = n // args.hot_frac
    rng = np.random.default_rng(80)
    rk = rng.permutation(n).astype(np.uint32)
    sk = rng.permutation(n).astype(np.uint32)
    sk[:hot] = rk[0]                      # hot key, both sides join
    rng.shuffle(sk)
    # oracle: S is a permutation of [0, n) with `hot` slots overwritten
    # by rk[0]; every remaining S value matches its unique R row, and
    # the hot key matches hot + [rk[0] survived in S] rows
    s_u, s_c = np.unique(sk, return_counts=True)
    want = int(np.sum(s_c[s_u < n].astype(np.int64)))
    print(f"n={n} hot={hot} want={want}", file=sys.stderr, flush=True)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("nodes",))
    cfg = JoinConfig(use_pallas=True)
    run = make_distributed_join_ranged(mesh, n, n, cfg, local_ranges=128,
                                       send_chunks=64, range_slack=1.15,
                                       local_probe="mergecount",
                                       skew_aware=True)
    rkj = jnp.asarray(rk)
    skj = jnp.asarray(sk)
    t0 = time.perf_counter()
    res = run(rkj, skj)
    got = total_distributed_matches_ranged(res)
    print(f"compile+first: {time.perf_counter() - t0:.1f} s",
          file=sys.stderr, flush=True)
    assert ranged_ok(res), "skew pre-pass should keep range capacity"
    assert got == want, (got, want)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        res = run(rkj, skj)
        got = total_distributed_matches_ranged(res)
    dt = (time.perf_counter() - t0) / args.reps
    assert got == want
    print(f"ranged+skew {n}x{n} hot={hot}: {got} matches exact, "
          f"{dt*1e3:.0f} ms/rep ({2*n/dt/1e6:.1f} Mt/s)", flush=True)


if __name__ == "__main__":
    main()
