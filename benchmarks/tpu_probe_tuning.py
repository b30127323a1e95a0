"""Probe-kernel tuning sweep on the real chip (run manually).

Measures the banded probe at several window/band settings plus the e2e
join, so kernel defaults can be chosen from data.  One process, generous
timeouts, no kills — the relay wedges on interrupted compiles.

  python -m benchmarks.tpu_probe_tuning [log2_n]
"""

import sys
import time

import numpy as np
import jax

from radixjoin_tpu import JoinConfig, join_count, total_matches
from radixjoin_tpu.data import relation as gen
from radixjoin_tpu.ops.partition import partition_keys_rotated
from radixjoin_tpu.ops.buildprobe import probe_count_banded


def sync(x):
    _ = np.asarray(jax.device_get(x.ravel()[0:1]))


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << logn
    bits = max(1, logn - 7)
    r = gen.fill_unique(n, jax.random.key(0))
    s = gen.fill_unique(n, jax.random.key(1))
    sync(r.keys); sync(s.keys)

    fp = jax.jit(lambda k: partition_keys_rotated(k, bits))
    rp = fp(r.keys)
    sp = fp(s.keys)
    sync(rp.keys)

    for w, b, g in [(6, 3, 8), (6, 5, 16), (6, 9, 32)]:
        f = jax.jit(lambda a, c, w=w, b=b, g=g: probe_count_banded(
            a, c, window_rows=w, band_blocks=b, rows_per_group=g))
        total, ok = f(rp, sp)
        sync(total)
        if not bool(ok):
            print(f"W={w} B={b} G={g}: ok=False (window too tight)", flush=True)
            continue
        assert int(total) == n, (w, b, g, int(total))
        t0 = time.time()
        for _ in range(3):
            total, ok = f(rp, sp)
            sync(total)
        print(f"W={w} B={b} G={g}: {(time.time()-t0)/3*1e3:.1f} ms", flush=True)

    cfg = JoinConfig()
    res = join_count(r, s, cfg, mode="banded")
    sync(res.matches)
    assert total_matches(res) == n
    t0 = time.time()
    for _ in range(3):
        res = join_count(r, s, cfg, mode="banded")
        sync(res.matches)
    dt = (time.time() - t0) / 3
    print(f"e2e banded: {dt*1e3:.0f} ms = {2*n/dt/1e6:.0f} Mt/s", flush=True)


if __name__ == "__main__":
    main()
