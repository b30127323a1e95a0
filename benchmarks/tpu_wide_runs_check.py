"""Real-TPU validation + timing of the 64-bit large-N runs path.

Usage:
  python -m benchmarks.tpu_wide_runs_check                # correctness, 2^22
  python -m benchmarks.tpu_wide_runs_check --logn 29 --reps 2   # scale run
  python -m benchmarks.tpu_wide_runs_check --sortprobe    # 2-op sort cap

The sort probe establishes where XLA's TWO-OPERAND (hi, lo) sort hits the
HBM scratch wall — the 32-bit single-operand wall is 2^29 (BENCH_NOTES.md),
and two operands roughly halve it; this picks runs_shift for northstar64.
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=22)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--k", type=int, default=16,
                    help="k_drift; NOTE gr scales as 512//k and the "
                         "SMEM group-start prefetch is n_run/(gr*128) "
                         "ints <= ~240K — large runs need k <= 16")
    ap.add_argument("--runs-shift", type=int, default=28)
    ap.add_argument("--sortprobe", action="store_true")
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"

    from radixjoin_tpu.engine.large import (_sort_biased64,
                                            gen_unique_keys64_run,
                                            join64_count_keys_runs)

    if args.sortprobe:
        for logn in (27, 28):
            src = gen_unique_keys64_run(1 << (logn + 1), 2654435761 | 1)
            hi, lo = src(0, 2)
            sync(hi)
            try:
                bh, bl = _sort_biased64(hi, lo)
                sync(bh)
                t0 = time.perf_counter()
                bh, bl = _sort_biased64(*src(1, 2))
                sync(bh)
                print(f"2-op sort 2^{logn}: {time.perf_counter()-t0:.3f} s",
                      flush=True)
                del bh, bl
            except Exception as e:
                print(f"2-op sort 2^{logn}: FAILED {type(e).__name__}",
                      flush=True)
                break
            del hi, lo
        return

    n = 1 << args.logn
    runs = max(1, n >> args.runs_shift)
    rsrc = gen_unique_keys64_run(n, 2654435761 | 1)
    ssrc = gen_unique_keys64_run(n, 0x9E3779B1 ^ 0x40)
    print(f"n=2^{args.logn} runs={runs}/side k={args.k}", flush=True)
    m, ok = join64_count_keys_runs(rsrc, ssrc, runs, runs, n, n,
                                   k_drift=args.k, sync=sync)
    print(f"warm: matches={m} ok={ok}", flush=True)
    assert ok and m == n, f"oracle mismatch: {m} != {n}"
    total = 0.0
    for _ in range(args.reps):
        t0 = time.perf_counter()
        m, ok = join64_count_keys_runs(rsrc, ssrc, runs, runs, n, n,
                                       k_drift=args.k, sync=sync)
        total += time.perf_counter() - t0
        assert ok and m == n
    dt = total / args.reps
    print(f"64-bit {n}x{n}: {dt:.3f} s  {2*n/dt/1e6:.1f} Mt/s", flush=True)


if __name__ == "__main__":
    main()
