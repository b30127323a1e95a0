"""Host CPU affinity pinning.

TPU-native equivalent of the reference's ``Thread::pin`` (utils/Thread.cpp:
14-23, pthread_setaffinity_np) for the host-side data/feeding threads of the
out-of-core path.  Like the reference (where Thread::pin exists but the main
path never calls it), this is an opt-in utility.
"""

from __future__ import annotations

import os


def pin_to_core(core_id: int) -> bool:
    """Pin the calling thread's process to one CPU core. Returns success."""
    try:
        os.sched_setaffinity(0, {core_id})
        return True
    except (OSError, AttributeError):
        return False


def pinned_cores() -> set:
    try:
        return os.sched_getaffinity(0)
    except (OSError, AttributeError):
        return set()
