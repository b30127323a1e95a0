"""Debug logging and invariant assertions.

TPU-native replacement for the reference's ``utils/Debug.h`` macro family:
  - JOIN_DEBUG(area, fmt, ...)  (utils/Debug.h:16-24) -> join_debug()
  - JOIN_ASSERT(cond, area, msg) (utils/Debug.h:27-37, exit(-1) on failure)
    -> join_assert() host-side / device_assert() in-graph via checkify-style
    flag returns.
  - JOIN_MEM_DEBUG (utils/Debug.h:50-60, VmSize snapshots parsed from
    /proc/self/status, Measurements.cpp:825-851) -> memory_snapshot().

Enabled at runtime by RADIXJOIN_DEBUG=1 (the reference gates on the
-DJOIN_DEBUG_PRINT compile flag, CMakeLists.txt:13-15).
"""

from __future__ import annotations

import os
import sys
import time

DEBUG = os.environ.get("RADIXJOIN_DEBUG", "0") not in ("0", "", "false")


def join_debug(area: str, msg: str, *args) -> None:
    if DEBUG:
        print(f"[DEBUG] [{area}] {msg % args if args else msg}",
              file=sys.stderr, flush=True)


def join_assert(condition: bool, area: str, msg: str) -> None:
    """Host-side invariant check. Raises instead of the reference's
    exit(-1) (utils/Debug.h:27-37) so tests can assert on it."""
    if not condition:
        raise AssertionError(f"[{area}] {msg}")


def dump_array(name: str, arr, limit: int = 32) -> None:
    """Print a device buffer's head (reference displayGPUBuffer,
    utils/gpu/debug.cuh:15-41).  Debug-gated like its macro cousins."""
    if DEBUG:
        import numpy as np
        host = np.asarray(arr).ravel()
        head = ", ".join(str(v) for v in host[:limit])
        more = f" ... ({host.size} total)" if host.size > limit else ""
        print(f"[DEBUG] [BUFFER] {name}: [{head}]{more}",
              file=sys.stderr, flush=True)


def memory_snapshot(tag: str = "") -> dict:
    """VmSize/VmRSS snapshot (reference Measurements.cpp:825-851)."""
    out = {}
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith(("VmSize", "VmRSS", "VmHWM")):
                    k, v = line.split(":", 1)
                    out[k] = v.strip()
    except OSError:
        pass
    if DEBUG and out:
        join_debug("MEM", "%s %s", tag, out)
    return out
