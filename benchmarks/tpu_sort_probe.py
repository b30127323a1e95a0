"""Measure XLA sort cost vs shape on the TPU: flat full sort vs batched
chunk sorts (axis -1).  Informs the chunk-sorted-R diagonal variant."""

import time
import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def timeit(f, x, reps=5):
    y = f(x)
    sync(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(x)
        sync(y)
    return (time.perf_counter() - t0) / reps


def main():
    assert jax.default_backend() == "tpu"
    n = 1 << 24
    x = jax.random.randint(jax.random.key(0), (n,), -2**31, 2**31 - 1,
                           dtype=jnp.int32)
    sync(x)
    flat = jax.jit(jax.lax.sort)
    print(f"flat sort {n}: {timeit(flat, x)*1e3:.1f} ms", flush=True)
    for chunks in (16, 128, 1024, 8192):
        x2 = x.reshape(chunks, n // chunks)
        f = jax.jit(lambda a: jax.lax.sort(a, dimension=1))
        print(f"batched sort ({chunks}, {n//chunks}): "
              f"{timeit(f, x2)*1e3:.1f} ms", flush=True)
    # 2-operand flat (the materialising path's sort)
    r = jnp.arange(n, dtype=jnp.int32)
    f2 = jax.jit(lambda a: jax.lax.sort((a, r), num_keys=1))
    print(f"flat 2-op sort {n}: {timeit(f2, x)*1e3:.1f} ms", flush=True)
    # searchsorted of row heads (diagonal metadata cost)
    xs = flat(x)
    sync(xs)
    heads = xs[::128]
    f3 = jax.jit(lambda s, h: jnp.searchsorted(s, h))
    y = f3(xs, heads); sync(y)
    t0 = time.perf_counter()
    for _ in range(5):
        y = f3(xs, heads); sync(y)
    print(f"searchsorted {heads.shape[0]} heads into {n}: "
          f"{(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
