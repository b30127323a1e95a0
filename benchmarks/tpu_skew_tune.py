"""n_ranges sweep for the 1B Zipf skew-hashed join (round 5).

The phase-2 mergecount cost depends on range-operand size (3.8 ns/elem
at 154M-element concats, less at smaller operands — the round-4 sort
size curve applies to the concat-sort too).  Sweeps n_ranges at the
northstar-skew geometry and prints warm-rep seconds per variant.

    python -m benchmarks.tpu_skew_tune --logn 30 --ranges 16 32 64
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=30)
    ap.add_argument("--ranges", type=int, nargs="+", default=[16, 32, 64])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from radixjoin_tpu.engine.large import (join_count_keys_skew_hashed,
                                            gen_unique_keys_run,
                                            gen_zipf_keys_run)
    n = 1 << args.logn
    runs = max(1, n >> 27)
    rsrc = gen_unique_keys_run(n, 2654435761 | 1)
    ssrc = gen_zipf_keys_run(n, domain=n, theta=1.05, seed=1235)

    for nr in args.ranges:
        t0 = time.perf_counter()
        got, ok = join_count_keys_skew_hashed(
            rsrc, ssrc, runs, runs, n, n, n_ranges=nr, sync=sync)
        t_cold = time.perf_counter() - t0
        assert ok and got == n, (nr, got, ok)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            got, ok = join_count_keys_skew_hashed(
                rsrc, ssrc, runs, runs, n, n, n_ranges=nr, sync=sync)
            times.append(time.perf_counter() - t0)
            assert ok and got == n
        print(f"n_ranges={nr}: cold {t_cold:.1f} s  warm "
              f"{min(times):.2f} s  ({2 * n / min(times) / 1e6:.1f} Mt/s)",
              flush=True)


if __name__ == "__main__":
    main()
