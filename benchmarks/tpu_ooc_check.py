"""Out-of-core 64M x 64M join through the chip: correctness + wall time.
Run detached; prior measurement (serial, key+rid spill): 113 s."""

import time
import numpy as np
import jax

from radixjoin_tpu import JoinConfig
from radixjoin_tpu.engine.outofcore import join_count_outofcore
from radixjoin_tpu import native


def main():
    assert jax.default_backend() == "tpu"
    n = 1 << 26
    rk, rr = native.fill_unique(n, 0, seed=40)
    sk, sr = native.fill_unique(n, 0, seed=41)
    cfg = JoinConfig(use_pallas=True)
    t0 = time.perf_counter()
    got = join_count_outofcore(rk, rr, sk, sr, cfg, coarse_bits=3,
                               chunk=1 << 23)
    dt = time.perf_counter() - t0
    print(f"outofcore {n}x{n}: {got} matches (want {n}) in {dt:.1f} s",
          flush=True)
    assert got == n


if __name__ == "__main__":
    main()
