"""Real-TPU validation + speed of the crossbar per-row digit sort.

The decisive datum for the round-2 radix partitioner (docs/ROADMAP.md
§1b): cost per element per bit of the row-local stage.  Usage:
  python -m benchmarks.tpu_crossbar_check case            # Mosaic + exact
  python -m benchmarks.tpu_crossbar_check speed [logn] [bits]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from radixjoin_tpu.ops.crossbar import row_digit_sort


def sync(x):
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def case():
    rng = np.random.default_rng(0)
    n = 256 * 128
    keys = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    pay = np.arange(n, dtype=np.uint32)
    ok, op = row_digit_sort(jnp.asarray(keys), jnp.asarray(pay), 6, 3)
    ok, op = np.asarray(ok).reshape(-1, 128), np.asarray(op).reshape(-1, 128)
    k2, p2 = keys.reshape(-1, 128), pay.reshape(-1, 128)
    for r in range(k2.shape[0]):
        dig = (k2[r] >> 3) & 63
        order = np.argsort(dig, kind="stable")
        assert np.array_equal(ok[r], k2[r][order]), r
        assert np.array_equal(op[r], p2[r][order]), r
    print("crossbar row_digit_sort on TPU: exact", flush=True)


def speed(logn=24, bits=6):
    n = 1 << logn
    rng = np.random.default_rng(1)
    keys = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    pay = jnp.asarray(np.arange(n, dtype=np.uint32))
    ok, _ = row_digit_sort(keys, pay, bits)
    sync(ok)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        ok, op = row_digit_sort(keys, pay, bits)
        sync(ok)
    dt = (time.perf_counter() - t0) / reps
    print(f"row_digit_sort n=2^{logn} bits={bits}: {dt*1e3:.1f} ms "
          f"({dt/n*1e9:.3f} ns/elem, {dt/n/bits*1e9:.3f} ns/elem/bit)",
          flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "case"
    if cmd == "case":
        case()
    else:
        speed(*(int(a) for a in sys.argv[2:]))
