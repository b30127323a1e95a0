"""On-chip tuning sweep for the materialising ranged distributed join
(make_distributed_join_ranged_rows) at a given scale: (send_chunks,
local_ranges, slack, rows_per_group) variants through the same oracle +
rid-checksum validation as `--config distributed-ranged-rows`.

Usage: python -m benchmarks.tpu_rangedrows_sweep [--logn 27] [--reps 3]
Run detached; each variant recompiles (~50 s) before its reps.
"""

import argparse

from radixjoin_tpu import JoinConfig
from radixjoin_tpu.perf.measurements import Measurements

from benchmarks.run import run_distributed_ranged_rows_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=27)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    cfg = JoinConfig(use_pallas=True)
    meas = Measurements()
    run_distributed_ranged_rows_config(
        1 << args.logn, args.reps, meas, cfg,
        variants=((64, 128, 1.15, 64),
                  (64, 256, 1.15, 64)))
    meas.print_summary()


if __name__ == "__main__":
    main()
