"""Real-TPU validation + timing of the 64-bit diagonal join."""

import time
import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def np_join64(r, s):
    ru, rc = np.unique(r, return_counts=True)
    su, sc = np.unique(s, return_counts=True)
    _, ri, si = np.intersect1d(ru, su, return_indices=True)
    return int(np.sum(rc[ri].astype(np.int64) * sc[si].astype(np.int64)))


def main():
    assert jax.default_backend() == "tpu"
    from radixjoin_tpu.ops.wide import (make_relation64, _join64_diag,
                                        join64_count_fast, join64_count)

    rng = np.random.default_rng(5)
    n = 1 << 16
    r = rng.integers(0, 1 << 63, n, dtype=np.uint64)
    s = rng.integers(0, 1 << 63, n, dtype=np.uint64)
    s[: n // 4] = rng.permutation(r)[: n // 4]
    r64 = make_relation64(r, np.arange(n, dtype=np.uint32))
    s64 = make_relation64(s, np.arange(n, dtype=np.uint32))
    m, ok = _join64_diag(r64, s64, 64)
    sync(m)
    want = np_join64(r, s)
    print(f"wide small: got={int(m)} want={want} ok={bool(ok)}", flush=True)
    assert bool(ok) and int(m) == want

    # degenerate hi: must escalate cleanly, fallback exact
    base = np.uint64(7) << np.uint64(32)
    rd = base | rng.integers(0, 40000, n, dtype=np.uint64)
    sd = base | rng.integers(0, 40000, n, dtype=np.uint64)
    got = join64_count_fast(
        make_relation64(rd, np.arange(n, dtype=np.uint32)),
        make_relation64(sd, np.arange(n, dtype=np.uint32)), 64)
    print(f"wide degenerate-hi: got={got} want={np_join64(rd, sd)}",
          flush=True)
    assert got == np_join64(rd, sd)

    # 16.7M timing: diagonal64 vs concat-sort join64_count
    n = 1 << 24
    r = rng.integers(0, 1 << 63, n, dtype=np.uint64)
    s = rng.permutation(r)
    r64 = make_relation64(r, np.zeros(n, np.uint32))
    s64 = make_relation64(s, np.zeros(n, np.uint32))
    m, ok = _join64_diag(r64, s64, 64)
    sync(m)
    assert bool(ok) and int(m) >= n, (int(m), bool(ok))
    t0 = time.perf_counter()
    for _ in range(3):
        m, ok = _join64_diag(r64, s64, 64)
        sync(m)
    dt = (time.perf_counter() - t0) / 3
    print(f"wide diagonal 16.7M: {dt*1e3:.1f} ms  {2*n/dt/1e6:.1f} Mt/s",
          flush=True)
    m2 = join64_count(r64, s64)
    sync(m2)
    t0 = time.perf_counter()
    for _ in range(3):
        m2 = join64_count(r64, s64)
        sync(m2)
    dt2 = (time.perf_counter() - t0) / 3
    print(f"wide concat-sort 16.7M: {dt2*1e3:.1f} ms  "
          f"{2*n/dt2/1e6:.1f} Mt/s", flush=True)
    assert int(m2) == int(m)
    print("WIDE OK", flush=True)


if __name__ == "__main__":
    main()
