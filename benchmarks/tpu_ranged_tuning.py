"""One-off tuning matrix for the ranged 1B north star (run on the TPU):

  - sort cost per element at 2^28 vs 2^29 (does splitting into 4 runs
    buy anything on the sort side?)
  - ranged join e2e over (runs, rows_per_group, k_drift)

Usage: python -m benchmarks.tpu_ranged_tuning
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def main():
    from radixjoin_tpu.engine.large import (gen_unique_keys_ranged_run,
                                            gen_unique_keys_run,
                                            join_count_keys_runs)

    # --- sort floor at two sizes ---
    srt = jax.jit(lambda k: jax.lax.sort(k, is_stable=False))
    for logn in (28, 29):
        n = 1 << logn
        keys = gen_unique_keys_run(n, 2654435761 | 1)(0, 1)
        sync(srt(keys))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(srt(keys))
            ts.append(time.perf_counter() - t0)
        log(f"sort 2^{logn}: median {np.median(ts)*1e3:.0f} ms "
            f"= {np.median(ts)/n*1e9:.3f} ns/elem")
        del keys

    # --- ranged join matrix ---
    n = 1 << 30
    for runs, gr, k in ((2, 32, 8), (4, 32, 8), (2, 64, 8), (2, 32, 4)):
        rsrc = gen_unique_keys_ranged_run(n, 2654435761 | 1)
        ssrc = gen_unique_keys_ranged_run(n, 0x9E3779B1 ^ 0x40)
        best = None
        for rep in range(3):            # rep 0 = compile
            t0 = time.perf_counter()
            m, ok = join_count_keys_runs(
                rsrc, ssrc, r_runs=runs, s_runs=runs, sync=sync,
                n_r_total=n, n_s_total=n, k_drift=k, rows_per_group=gr,
                ranged_domain=n)
            dt = time.perf_counter() - t0
            assert ok and m == n, f"mismatch {m} ok={ok}"
            if rep:
                best = dt if best is None else min(best, dt)
        log(f"runs={runs} gr={gr} K={k}: {best*1e3:.0f} ms "
            f"= {2*n/best/1e6:.1f} Mt/s")


if __name__ == "__main__":
    main()
