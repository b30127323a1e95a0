"""Real-TPU validation + timing of the diagonal rank-band probe.

Stage 1: small-shape correctness vs the native C++ oracle (Mosaic compile).
Stage 2: 16.7M unique-keys end-to-end timing (mode=diagonal vs banded).
Run detached: nohup setsid python -m benchmarks.tpu_diag_check > log 2>&1 &
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def sync(x):
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def main():
    log(f"backend={jax.default_backend()}")
    assert jax.default_backend() == "tpu"

    from radixjoin_tpu import JoinConfig, make_relation
    from radixjoin_tpu.data import relation as gen
    from radixjoin_tpu.engine.join import (join_count, total_matches,
                                           prepare_build_sorted,
                                           join_count_prepared_diagonal)
    from radixjoin_tpu.ops import buildprobe as bp
    from radixjoin_tpu import native

    cfg = JoinConfig(use_pallas=True)

    # ---- stage 1a: small unique keys, K=4 ----
    n = 1 << 16
    r = gen.fill_unique(n, jax.random.key(0))
    s = gen.fill_unique(n, jax.random.key(1))
    res = join_count(r, s, cfg, mode="diagonal")
    sync(res.matches)
    got, ok = total_matches(res), bool(res.ok)
    log(f"stage1a unique {n}: got={got} ok={ok}")
    assert ok and got == n, (got, ok)

    # ---- stage 1b: duplicates vs native oracle, K=64 ----
    rng = np.random.default_rng(7)
    rk = rng.integers(0, 40000, n, dtype=np.uint32)
    sk = rng.integers(0, 40000, n, dtype=np.uint32)
    want = native.join_count_oracle(rk, sk)
    cfg64 = cfg.replace(diagonal_k=64)
    res = join_count(make_relation(rk, np.arange(n, dtype=np.uint32)),
                     make_relation(sk, np.arange(n, dtype=np.uint32)),
                     cfg64, mode="diagonal")
    sync(res.matches)
    got, ok = total_matches(res), bool(res.ok)
    log(f"stage1b dups {n}: got={got} want={want} ok={ok}")
    assert ok and got == want, (got, want, ok)

    # ---- stage 1c: high-bit keys (biased-compare order) ----
    rk2 = (rk | np.uint32(0x80000000)).astype(np.uint32)
    sk2 = (sk | np.uint32(0x80000000)).astype(np.uint32)
    want2 = native.join_count_oracle(rk2, sk2)
    res = join_count(make_relation(rk2, np.arange(n, dtype=np.uint32)),
                     make_relation(sk2, np.arange(n, dtype=np.uint32)),
                     cfg64, mode="diagonal")
    sync(res.matches)
    got2, ok2 = total_matches(res), bool(res.ok)
    log(f"stage1c highbit: got={got2} want={want2} ok={ok2}")
    assert ok2 and got2 == want2, (got2, want2, ok2)

    # ---- stage 1d: skew trip -> ok False (no fault) ----
    z = np.zeros(1 << 14, dtype=np.uint32)
    res = join_count(make_relation(z, z), make_relation(z, z), cfg,
                     mode="diagonal")
    sync(res.matches)
    log(f"stage1d all-dup: ok={bool(res.ok)} (want False)")
    assert not bool(res.ok)

    # ---- stage 2: 16.7M timing ----
    n = 1 << 24
    r = gen.fill_unique(n, jax.random.key(2))
    s = gen.fill_unique(n, jax.random.key(3))
    sync(r.keys); sync(s.keys)

    for mode, c in (("diagonal", cfg), ("banded", cfg)):
        res = join_count(r, s, c, mode=mode)
        sync(res.matches)
        assert total_matches(res) == n and bool(res.ok), mode
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            res = join_count(r, s, c, mode=mode)
            sync(res.matches)
        dt = (time.perf_counter() - t0) / reps
        log(f"stage2 {mode} {n}: {dt*1e3:.1f} ms  {2*n/dt/1e6:.1f} Mt/s")

    # ---- stage 3: prepared build side (steady-state) ----
    build = prepare_build_sorted(r)
    sync(build)
    m, ok = join_count_prepared_diagonal(build, s, cfg)
    sync(m)
    assert int(m) == n and bool(ok)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        m, ok = join_count_prepared_diagonal(build, s, cfg)
        sync(m)
    dt = (time.perf_counter() - t0) / reps
    log(f"stage3 prepared-diagonal {n}: {dt*1e3:.1f} ms  "
        f"{2*n/dt/1e6:.1f} Mt/s")
    log("ALL OK")


if __name__ == "__main__":
    main()
