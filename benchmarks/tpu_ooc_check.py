"""Out-of-core join through the chip: correctness + wall time.

Usage: python -m benchmarks.tpu_ooc_check [--logn 26] [--coarse-bits 3]
                                          [--chunk-log 23]

Streams two host-resident unique-key relations through the device
(engine/outofcore.py Grace-style spill, keys-only + double-buffered) and
checks the dense-unique oracle (matches == n).  Run detached; prior
measurements: 64M x 64M in 75 s (serial key+rid spill was 113 s);
1B x 1B is the BASELINE.json north-star scale.
"""

import argparse
import time
import numpy as np
import jax

from radixjoin_tpu import JoinConfig
from radixjoin_tpu.engine.outofcore import join_count_outofcore
from radixjoin_tpu import native


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=26,
                    help="log2 tuples per relation")
    ap.add_argument("--coarse-bits", type=int, default=3,
                    help="pass-1 fanout; largest R_p+S_p pair must fit HBM")
    ap.add_argument("--chunk-log", type=int, default=23,
                    help="log2 tuples per pass-1 device chunk (device spill)")
    ap.add_argument("--spill", default="host", choices=["host", "device"],
                    help="pass-1 partitioner: native CPU or chunked device")
    ap.add_argument("--workload", default="unique",
                    choices=["unique", "modulo"],
                    help="unique: dense distinct keys (matches == n); "
                         "modulo: keys = i %% (n/dup), dup copies per key "
                         "per side (matches == n*dup) — the only "
                         "self-validating form past n == 2^32-16, e.g. "
                         "the 4B x 4B BASELINE config")
    ap.add_argument("--dup", type=int, default=2,
                    help="copies per key per side for --workload modulo")
    args = ap.parse_args()

    assert jax.default_backend() == "tpu"
    n = 1 << args.logn
    t0 = time.perf_counter()
    if args.workload == "unique":
        rk, rr = native.fill_unique(n, 0, seed=40)
        sk, sr = native.fill_unique(n, 0, seed=41)
        want = n
    else:
        assert n % args.dup == 0
        inner = n // args.dup
        rk, rr = native.fill_modulo(n, inner, seed=40)
        sk, sr = native.fill_modulo(n, inner, seed=41)
        # each key appears exactly dup times per side
        want = inner * args.dup * args.dup
    del rr, sr          # keys-only count path; at 4B the rid planes are
                        # 32 GB of dead weight against the host-RAM peak
    print(f"generated 2x{n} ({args.workload}) in "
          f"{time.perf_counter() - t0:.1f} s", flush=True)
    cfg = JoinConfig(use_pallas=True)
    t0 = time.perf_counter()
    rr = sr = np.empty(0, np.uint32)
    got = join_count_outofcore(rk, rr, sk, sr, cfg,
                               coarse_bits=args.coarse_bits,
                               chunk=1 << args.chunk_log, spill=args.spill)
    dt = time.perf_counter() - t0
    print(f"outofcore {n}x{n} (spill={args.spill}, {args.workload}): "
          f"{got} matches (want {want}) in {dt:.1f} s "
          f"({2 * n / dt / 1e6:.1f} Mt/s)", flush=True)
    assert got == want


if __name__ == "__main__":
    main()
