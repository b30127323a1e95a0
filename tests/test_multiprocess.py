"""Multi-process execution of the distributed join — the reference's own
multi-node test story run for real: N coordinated OS processes on one
machine (``mpirun -np N`` over shared memory, SURVEY.md §4), here N
``jax.distributed`` processes over a localhost coordinator
(parallel/multihost.py, the MPI_Init analogue, main.cpp:36-48).

Each worker owns 2 virtual CPU devices; the global mesh spans processes,
so the join's psum/all_gather/all_to_all really cross the process
boundary through the distributed runtime — not just the in-process
virtual mesh the rest of the suite uses.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(nproc: int, variant: str = "plain", timeout: float = 420.0):
    port = _free_port()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)          # worker sets its own
        env.update({
            "RADIXJOIN_COORDINATOR": f"127.0.0.1:{port}",
            "RADIXJOIN_NUM_PROCESSES": str(nproc),
            "RADIXJOIN_PROCESS_ID": str(pid),
            "RADIXJOIN_VARIANT": variant,
            "WORKER_LOCAL_DEVICES": "2",
            "PYTHONPATH": os.path.dirname(os.path.dirname(__file__))
            + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


# (2, plain): the baseline SPMD join across the process boundary.
# (3, materialize): NON-power-of-two process count; the materialising
#     variant's row triples cross processes (fetched via allgather).
# (4, skew): the heavy-hitter pre-pass's candidate all_gather + exact
#     psum counts cross 4 processes.
@pytest.mark.parametrize("nproc,variant",
                         [(2, "plain"), (3, "materialize"), (4, "skew"),
                          (2, "ranged"), (2, "ranged-rows")])
def test_multiprocess_distributed_join(nproc, variant):
    procs, outs = _launch(nproc, variant)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"RANK {pid} OK" in out, out
