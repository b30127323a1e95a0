"""In-HBM large-N count join: the north-star scale WITHOUT the spill path.

The v5e chip has 16 GB HBM; a keys-only count join needs 4 B/tuple/side
plus one sort double-buffer, so even 1B x 1B (BASELINE.json north star,
reference geometry 20M/node scaled up) fits on-chip:

    peak = rs(4G) + sk(4G, donated) + ss(4G) = 12 GB  @ logn=30

versus the out-of-core spill path (engine/outofcore.py) whose 1B x 1B run
costs 373 s mostly in host sorting + tunnel transfers.  Keys are generated
ON DEVICE as dense-unique bijections of [0, n) — (x * odd) mod 2^k — so the
self-validating oracle (matches == n) holds with zero host->device traffic
and no jax.random.permutation blow-up (which would sort 2x the memory).

Usage: python -m benchmarks.tpu_inhbm_check [--logn 28] [--k 16]
"""

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from radixjoin_tpu.ops.buildprobe import bias_keys, probe_count_diagonal


def sync(x):
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


@functools.partial(jax.jit, static_argnums=(0, 1))
def gen_keys(n: int, odd_mult: int):
    """Dense unique keys: bijection (x * odd) mod n for power-of-two n."""
    x = jnp.arange(n, dtype=jnp.uint32)
    return (x * jnp.uint32(odd_mult)) & jnp.uint32(n - 1)


sort_biased = jax.jit(lambda k: jax.lax.sort(bias_keys(k)),
                      donate_argnums=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=28)
    ap.add_argument("--k", type=int, default=16, help="diagonal k_drift")
    ap.add_argument("--rows-per-group", type=int, default=32)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"
    n = 1 << args.logn

    t0 = time.perf_counter()
    rk = gen_keys(n, 2654435761 | 1)
    sk = gen_keys(n, 0x9E3779B1 ^ 0x40)  # a different odd multiplier
    sync(rk), sync(sk)
    print(f"generated 2x{n} on device in {time.perf_counter()-t0:.2f} s",
          flush=True)

    probe = jax.jit(functools.partial(
        probe_count_diagonal, k_drift=args.k,
        rows_per_group=args.rows_per_group))

    # Warm compile on the real shapes (donation consumes rk/sk, so time a
    # second full pass for the steady-state number).
    def run(rkeys, skeys):
        t = {}
        t0 = time.perf_counter()
        rs = sort_biased(rkeys); sync(rs)
        t["sort_r"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        ss = sort_biased(skeys); sync(ss)
        t["sort_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        matches, ok = probe(rs, ss)
        m = int(matches); okv = bool(ok)
        t["probe"] = time.perf_counter() - t0
        del rs, ss
        return m, okv, t

    m, okv, t = run(rk, sk)
    total = sum(t.values())
    print(f"cold: {m} matches (want {n}) ok={okv} "
          f"sort_r={t['sort_r']:.2f} sort_s={t['sort_s']:.2f} "
          f"probe={t['probe']:.2f} total={total:.2f} s", flush=True)
    assert m == n and okv

    rk = gen_keys(n, 2654435761 | 1)
    sk = gen_keys(n, 0x9E3779B1 ^ 0x40)
    sync(rk), sync(sk)
    m, okv, t = run(rk, sk)
    total = sum(t.values())
    print(f"warm: {m} matches ok={okv} "
          f"sort_r={t['sort_r']:.2f} sort_s={t['sort_s']:.2f} "
          f"probe={t['probe']:.2f} total={total:.2f} s "
          f"({2*n/total/1e6:.1f} Mt/s)", flush=True)
    assert m == n and okv


if __name__ == "__main__":
    main()
