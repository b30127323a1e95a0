"""Backend helpers: decide when Pallas kernels run compiled vs interpreted.

Pallas TPU kernels are compiled by Mosaic only on real TPU backends; on CPU
(tests run on an 8-device virtual CPU mesh, see tests/conftest.py) the same
kernels execute in interpreter mode.  This mirrors how the reference gates its
GPU path behind ``-DETH`` (operators/HashJoin.cpp:151-163) — except ours is a
runtime decision, not a compile-time fork.
"""

from __future__ import annotations

import jax


def default_backend() -> str:
    # Deliberately NOT cached: the dry-run harness can switch the platform
    # (axon TPU -> virtual CPU mesh) mid-process.
    return jax.default_backend()


def on_tpu() -> bool:
    return default_backend() == "tpu"


def pallas_interpret() -> bool:
    """True when pallas_call must run in interpreter mode (non-TPU backend)."""
    return not on_tpu()
