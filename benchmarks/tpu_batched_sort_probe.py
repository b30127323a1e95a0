"""Measure XLA TPU sort cost: flat vs batched-rows (axis=-1) at equal N.

If batched (B, C) sorts run near VMEM-resident speed, a radix partitioner
only needs to bucket into C-sized rows and lax.sort finishes per bucket.
"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp


def sync(x):
    if isinstance(x, tuple):
        x = x[0]
    _ = np.asarray(jax.device_get(x.ravel()[0:1]))


def bench(fn, *args, reps=5):
    f = jax.jit(fn)
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(f(*args))
    return (time.perf_counter() - t0) / reps


def main():
    n = 1 << 24
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    rid = jnp.asarray(np.arange(n, dtype=np.uint32))
    cases = []
    t = bench(lambda x: jax.lax.sort(x), flat)
    cases.append(("flat_keys", t))
    t = bench(lambda x, r: jax.lax.sort((x, r), num_keys=1), flat, rid)
    cases.append(("flat_pairs", t))
    for c in (8192, 1024, 2048, 4096, 16384, 32768):
        b = n // c
        x2 = flat.reshape(b, c)
        r2 = rid.reshape(b, c)
        t = bench(lambda x: jax.lax.sort(x, dimension=1), x2)
        cases.append((f"rows_keys_c{c}", t))
        t = bench(lambda x, r: jax.lax.sort((x, r), num_keys=1, dimension=1),
                  x2, r2)
        cases.append((f"rows_pairs_c{c}", t))
        for name, tt in cases[-2:]:
            print(f"{name}: {tt*1e3:.2f} ms  ({tt/n*1e9:.3f} ns/elem)",
                  flush=True)
    for name, tt in cases[:2]:
        print(f"{name}: {tt*1e3:.2f} ms  ({tt/n*1e9:.3f} ns/elem)", flush=True)


if __name__ == "__main__":
    main()
