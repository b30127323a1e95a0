"""tpu-radix-join: a TPU-native distributed query-execution engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
``lushl9301/Distributed-Radxi-Hash-Join-on-GPUs`` (see SURVEY.md).  Layer map
mirrors the reference's (SURVEY.md §1):

  config            <- core/Configuration.h      (runtime, not compile-time)
  data/             <- data/ (Tuple, CompressedTuple, Relation generators)
  ops/              <- operators/gpu kernels + tasks/ CPU kernels
  parallel/         <- histograms/ + data/Window.cpp (mesh collectives)
  engine/           <- operators/HashJoin + main driver
  perf/             <- performance/Measurements
  utils/            <- utils/ (debug, thread pinning)
  native/           <- C++ host runtime (data generation, oracle)
"""

from .config import JoinConfig, DEFAULT_CONFIG
from .data.tuples import Relation, make_relation
from .data import relation as generators
from .engine.join import (join_count, join_count_checked, join_rows,
                          total_matches, JoinResult)

__version__ = "0.1.0"

__all__ = [
    "JoinConfig", "DEFAULT_CONFIG", "Relation", "make_relation",
    "generators", "join_count", "join_count_checked", "join_rows",
    "total_matches", "JoinResult",
]
