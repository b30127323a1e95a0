"""Per-phase measurements, .perf/.info artifacts, and speed-of-light accounting.

TPU-native replacement for the reference's ``performance/Measurements.{h,cpp}``
(339+855 LoC of static start/stop timestamp pairs):

  - Phase timers JTOTAL/JHIST/JMPI/JPROC (Measurements.cpp:90-142)
    -> Timer phases around block_until_ready'd jit calls.
  - MEASUREMENT_DETAILS_* per-step counters (Measurements.cpp:247-541)
    -> per-phase tuple counts + bytes in PhaseStats.
  - PAPI total cycles (Measurements.cpp:90-107) -> wall ns (no PAPI on TPU
    hosts; device-side truth comes from jax.profiler traces, see `trace`).
  - Per-rank files <cwd>/experiment-<N>-<id>/<rank>.perf|.info with tagged
    key\\tvalue\\tunit lines (Measurements.cpp:707-749) -> same format, one
    file per process (per-host in multi-host runs).
  - Rank-0 aggregation + "[RESULTS] Summary" table (Measurements.cpp:546-702)
    -> print_summary().

New relative to the reference: **speed-of-light accounting** — each phase can
declare the HBM bytes / ICI bytes it must move; report() emits achieved
fraction of roofline (BASELINE.md targets are stated this way).
"""

from __future__ import annotations

import contextlib
import json
import os
import socket
import time
from dataclasses import dataclass, field
from typing import Optional

import jax


@dataclass
class PhaseStats:
    name: str
    seconds: float = 0.0
    calls: int = 0
    tuples: int = 0
    hbm_bytes: int = 0   # bytes this phase must move through HBM (min)
    ici_bytes: int = 0   # bytes this phase must move over ICI (min)


@dataclass
class DetailStats:
    """Per-STEP counters — the reference's MEASUREMENT_DETAILS tier
    (per-put/per-task µs + call + element sums, Measurements.cpp:247-541,
    enabled by the MEASUREMENT_DETAILS_* compile defines,
    CMakeLists.txt:10).  Here a runtime flag (RADIXJOIN_DETAILS=1 or
    ``Measurements(details_enabled=True)``) gates them, and a "step" is a
    host-observable unit — one run's sort+pad, one pair's probe dispatch,
    one out-of-core bucket's encode/stage — since device-internal put
    granularity belongs to jax.profiler traces."""
    name: str
    seconds: float = 0.0
    calls: int = 0
    elements: int = 0


@dataclass
class Measurements:
    """One experiment's measurements (reference Measurements is all-static;
    ours is an object so concurrent experiments don't collide)."""

    experiment_id: str = field(
        default_factory=lambda: time.strftime("%Y%m%d-%H%M%S"))
    node_id: int = 0
    n_nodes: int = 1
    phases: dict = field(default_factory=dict)
    details: dict = field(default_factory=dict)
    details_enabled: bool = field(
        default_factory=lambda: os.environ.get("RADIXJOIN_DETAILS", "0")
        not in ("0", "", "false"))
    meta: dict = field(default_factory=dict)
    hbm_gbps: float = 800.0   # per-chip roofline; calibrate with bench
    ici_gbps: float = 45.0    # per-link

    # -- timers ----------------------------------------------------------
    @contextlib.contextmanager
    def phase(self, name: str, tuples: int = 0, hbm_bytes: int = 0,
              ici_bytes: int = 0, sync=None):
        """Time a phase; `sync` is an array (or pytree) to block on so device
        work is included (the reference brackets with MPI_Barrier +
        PAPI reads, Measurements.cpp:90-107)."""
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        st = self.phases.setdefault(name, PhaseStats(name))
        st.seconds += dt
        st.calls += 1
        st.tuples += tuples
        st.hbm_bytes += hbm_bytes
        st.ici_bytes += ici_bytes

    def time_fn(self, name: str, fn, *args, tuples: int = 0,
                hbm_bytes: int = 0, ici_bytes: int = 0, **kw):
        with self.phase(name, tuples, hbm_bytes, ici_bytes):
            out = fn(*args, **kw)
            jax.block_until_ready(out)
        return out

    @contextlib.contextmanager
    def detail(self, name: str, elements: int = 0):
        """Per-step counter (reference HI*/MI*/LP*/BP* detail tags).
        No-op unless ``details_enabled`` — the runtime mirror of the
        reference's MEASUREMENT_DETAILS_* compile gates."""
        if not self.details_enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        st = self.details.setdefault(name, DetailStats(name))
        st.seconds += dt
        st.calls += 1
        st.elements += elements

    # -- reporting -------------------------------------------------------
    def sol_fraction(self, st: PhaseStats) -> Optional[float]:
        """Achieved fraction of the roofline for a phase, if it declared
        its minimal data movement."""
        if st.seconds <= 0:
            return None
        bound = 0.0
        if st.hbm_bytes:
            bound = max(bound, st.hbm_bytes / (self.hbm_gbps * 1e9))
        if st.ici_bytes:
            bound = max(bound, st.ici_bytes / (self.ici_gbps * 1e9))
        if bound == 0.0:
            return None
        return bound / st.seconds

    def report(self) -> dict:
        out = {"experiment": self.experiment_id, "node": self.node_id,
               "nodes": self.n_nodes, "meta": dict(self.meta), "phases": {}}
        for name, st in self.phases.items():
            entry = {"ms": st.seconds * 1e3, "calls": st.calls,
                     "tuples": st.tuples}
            if st.tuples and st.seconds > 0:
                entry["mtuples_per_s"] = st.tuples / st.seconds / 1e6
            frac = self.sol_fraction(st)
            if frac is not None:
                entry["speed_of_light_fraction"] = frac
            out["phases"][name] = entry
        if self.details:
            out["details"] = {
                name: {"calls": st.calls, "us": st.seconds * 1e6,
                       "elements": st.elements}
                for name, st in self.details.items()}
        return out

    def print_summary(self) -> None:
        """Per-phase table + "[RESULTS] Summary" line
        (reference Measurements.cpp:592-702)."""
        rep = self.report()
        print(f"[RESULTS] Experiment {rep['experiment']} "
              f"node {rep['node']}/{rep['nodes']}")
        total_ms = 0.0
        for name, e in rep["phases"].items():
            line = f"[RESULTS]   {name:<24s} {e['ms']:10.2f} ms"
            if "mtuples_per_s" in e:
                line += f"  {e['mtuples_per_s']:10.1f} Mt/s"
            if "speed_of_light_fraction" in e:
                line += f"  {e['speed_of_light_fraction']*100:5.1f}% SoL"
            print(line)
            total_ms += e["ms"]
        print(f"[RESULTS] Summary: total {total_ms:.2f} ms")

    # -- artifacts (reference Measurements::init + storeAllMeasurements,
    #    Measurements.cpp:707-776) ---------------------------------------
    def store(self, base_dir: str = ".") -> str:
        d = os.path.join(base_dir,
                         f"experiment-{self.n_nodes}-{self.experiment_id}")
        os.makedirs(d, exist_ok=True)
        perf_path = os.path.join(d, f"{self.node_id}.perf")
        with open(perf_path, "w") as f:
            for name, st in self.phases.items():
                f.write(f"{name}\t{st.seconds*1e6:.0f}\tus\n")
                if st.tuples:
                    f.write(f"{name}_TUPLES\t{st.tuples}\tcount\n")
                frac = self.sol_fraction(st)
                if frac is not None:
                    f.write(f"{name}_SOL\t{frac:.4f}\tfraction\n")
            # detail tier: <tag>\t<µs sum>\tus + _CALLS/_ELEMS rows, the
            # reference's per-step .perf lines (Measurements.cpp:247-541)
            for name, st in self.details.items():
                f.write(f"{name}\t{st.seconds*1e6:.0f}\tus\n")
                f.write(f"{name}_CALLS\t{st.calls}\tcount\n")
                if st.elements:
                    f.write(f"{name}_ELEMS\t{st.elements}\tcount\n")
        info_path = os.path.join(d, f"{self.node_id}.info")
        with open(info_path, "w") as f:
            f.write(f"NUMNODES\t{self.n_nodes}\n")
            f.write(f"NODEID\t{self.node_id}\n")
            f.write(f"HOST\t{socket.gethostname()}\n")
            for k, v in self.meta.items():
                f.write(f"{k}\t{v}\n")
        with open(os.path.join(d, f"{self.node_id}.json"), "w") as f:
            json.dump(self.report(), f, indent=2)
        return d


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/radixjoin-trace"):
    """jax.profiler trace context — the xprof-level ground truth that
    replaces the reference's PAPI counters (Measurements.cpp:778-821)."""
    with jax.profiler.trace(log_dir):
        yield


def device_module_times(log_dir: str = "/tmp/radixjoin-trace") -> dict:
    """DEVICE-time ground truth from the newest jax.profiler trace under
    ``log_dir``: per-XLA-executable device milliseconds (the PAPI-tier
    answer the reference gets from hardware counters,
    Measurements.cpp:90-107,778-821 — here per-phase *device* ms next to
    the wall-clock ms of the Timer tier, which includes relay latency).

    Parses the xplane protobuf directly (tensorflow.tsl proto — no
    tensorboard session needed).  Returns {executable_name: ms} summed
    over executions, from the device planes' "XLA Modules" line; falls
    back to per-op lines summed by program if no module line exists.
    Empty dict if no trace/device plane was captured (e.g. a backend
    whose profiler exposes no device stream)."""
    import glob

    files = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        return {}
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:                      # pragma: no cover
        return {}
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    out: dict = {}
    for plane in xs.planes:
        if not (plane.name.startswith("/device:")
                or "TPU" in plane.name or "Device" in plane.name):
            continue
        md = plane.event_metadata
        module_lines = [ln for ln in plane.lines
                        if "XLA Modules" in ln.name]
        lines = module_lines or list(plane.lines)
        for ln in lines:
            if not module_lines and "Step" in ln.name:
                continue
            for ev in ln.events:
                name = md[ev.metadata_id].name if ev.metadata_id in md \
                    else str(ev.metadata_id)
                out[name] = out.get(name, 0.0) + ev.duration_ps / 1e9
    return out


def attribute_device_time(meas: "Measurements",
                          log_dir: str = "/tmp/radixjoin-trace",
                          prefix: str = "DEV_") -> dict:
    """Fold :func:`device_module_times` into ``meas.details`` as
    ``DEV_<executable>`` rows so the .perf artifact carries device-
    attributed per-executable ms alongside the host wall phases."""
    mod = device_module_times(log_dir)
    for name, ms in sorted(mod.items(), key=lambda kv: -kv[1]):
        st = meas.details.setdefault(prefix + name,
                                     DetailStats(prefix + name))
        st.seconds += ms / 1e3
        st.calls += 1
    return mod
