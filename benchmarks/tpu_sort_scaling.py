"""Sort-size scaling probe: ns/element of XLA's flat unstable u32 sort
at 2^22 .. 2^29 on the real chip.

Motivation (round 4): the north-star engine's wall is 8 sorts of
2^28-element ranged runs (BENCH_NOTES round 3).  A comparison sort's
pass count grows with log n, so SMALLER runs should cost fewer
ns/element — the round-3 tuning matrix already measured 2^28 at
1.851 ns/elem vs 2^29 at 2.006 (-8%).  If the curve keeps dropping
toward 2^24, the ranged decomposition gets a free speedup by raising
the run count (probe work stays linear: diagonal pairs only).

Also times the FUSED per-pair step (generate + sort both sides + prepad
+ diagonal probe in one jit) per run size, since at high run counts the
engine must batch whole pairs per relay round-trip to amortise RPC.

Usage: python -m benchmarks.tpu_sort_scaling [--sizes 22,24,26,28,29]
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="22,23,24,25,26,27,28,29")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pair", action="store_true",
                    help="also time the fused per-pair join step")
    args = ap.parse_args(argv)

    from radixjoin_tpu.engine.large import gen_unique_keys_run

    log(f"backend={jax.default_backend()}")
    srt = jax.jit(lambda k: jax.lax.sort(k, is_stable=False))
    for lg in (int(s) for s in args.sizes.split(",")):
        n = 1 << lg
        keys = gen_unique_keys_run(n, 2654435761 | 1)(0, 1)
        sync(srt(keys))                       # compile + warm
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            sync(srt(keys))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        log(f"sort 2^{lg}: {med*1e3:8.1f} ms  {med/n*1e9:.3f} ns/elem "
            f"(min {min(times)/n*1e9:.3f})")
        del keys

    if args.pair:
        time_pairs(args)


def time_pairs(args):
    """Fused pair step at each run size: one jit = gen R + gen S + two
    sorts + two prepads + diagonal probe, scalar outputs only."""
    import functools
    from radixjoin_tpu.ops.buildprobe import (bias_keys, diagonal_prepad,
                                              probe_count_diagonal)

    k_drift = 8

    for lg in (int(s) for s in args.sizes.split(",")):
        n = 1 << lg

        @functools.partial(jax.jit, static_argnums=(1,))
        def pair_step(run, n_runs, _n=n):
            # inline ranged-run generation (run index is a traced scalar)
            x = jnp.arange(0, _n, dtype=jnp.uint32)
            base = run.astype(jnp.uint32) * jnp.uint32(_n)
            rk = ((x * jnp.uint32(2654435761 | 1))
                  & jnp.uint32(_n - 1)) + base
            sk = ((x * jnp.uint32(0x9E3779B1 ^ 0x40))
                  & jnp.uint32(_n - 1)) + base
            rs = jax.lax.sort(bias_keys(rk), is_stable=False)
            ss = jax.lax.sort(bias_keys(sk), is_stable=False)
            rp = diagonal_prepad(rs, "r", _n, _n, k_drift=k_drift,
                                 rows_per_group=32)
            sp = diagonal_prepad(ss, "s", _n, _n, k_drift=k_drift,
                                 rows_per_group=32)
            return probe_count_diagonal(rp, sp, k_drift=k_drift,
                                        rows_per_group=32,
                                        prepadded=(_n, _n), blocked=True)

        m, ok = pair_step(jnp.int32(0), 1)
        sync(m)
        assert int(m) == n and bool(ok), (int(m), n)
        reps = max(1, (1 << 28) // n)         # ~2^28 elems per timing
        t0 = time.perf_counter()
        outs = [pair_step(jnp.int32(0), 1) for _ in range(reps)]
        sync(outs[-1][0])
        dt = (time.perf_counter() - t0) / reps
        log(f"pair 2^{lg}: {dt*1e3:8.1f} ms/pair  "
            f"{2*n/dt/1e6:7.1f} Mt/s  ({reps} reps)")


if __name__ == "__main__":
    main()
