"""Probe Mosaic's tpu.dynamic_gather support + speed on the real chip.

jnp.take_along_axis(x, idx, axis) on a 2D array inside a Pallas kernel
lowers to tpu.DynamicGatherOp (jax/_src/pallas/mosaic/lowering.py:2464-2524):
  axis=1: out[r, l] = x[r, idx[r, l]]   (per-row lane crossbar)
  axis=0: out[r, l] = x[idx[r, l], l]   (per-column sublane gather)

This is the data-dependent permutation primitive the radix partitioner
needs (docs/ROADMAP.md item 1 said none existed).  This script establishes,
per shape: does it compile, is it correct vs NumPy, and how fast is it.

Usage (each case is its own process so one Mosaic rejection doesn't kill
the rest; `all` drives them sequentially):
  python -m benchmarks.tpu_gather_probe all
  python -m benchmarks.tpu_gather_probe case <rows> <axis>
  python -m benchmarks.tpu_gather_probe speed <rows> <axis> <reps_in_kernel>
"""

import functools
import subprocess
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    _ = np.asarray(jax.device_get(x.ravel()[0:1]))


def _gather_kernel(axis, x_ref, idx_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=axis)


def run_case(rows, axis, interpret=False):
    x = np.arange(rows * 128, dtype=np.int32).reshape(rows, 128)
    rng = np.random.default_rng(0)
    hi = x.shape[axis]
    idx = rng.integers(0, hi, size=(rows, 128)).astype(np.int32)
    f = pl.pallas_call(
        functools.partial(_gather_kernel, axis),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        interpret=interpret,
    )
    got = np.asarray(jax.jit(f)(jnp.asarray(x), jnp.asarray(idx)))
    want = np.take_along_axis(x, idx, axis=axis)
    ok = np.array_equal(got, want)
    print(f"rows={rows} axis={axis} interpret={interpret}: "
          f"{'OK' if ok else 'WRONG'}", flush=True)
    if not ok:
        bad = np.argwhere(got != want)[:4]
        print("  first mismatches at", bad.tolist(),
              "got", got[tuple(bad[0])], "want", want[tuple(bad[0])],
              flush=True)
    return ok


def _speed_kernel(axis, reps, x_ref, idx_ref, o_ref):
    x = x_ref[...]
    idx = idx_ref[...]
    for _ in range(reps):
        x = jnp.take_along_axis(x, idx, axis=axis)
    o_ref[...] = x


def _roll_kernel(reps, x_ref, idx_ref, o_ref):
    del idx_ref
    x = x_ref[...]
    for i in range(reps):
        x = pltpu.roll(x, 1 + (i % 8), axis=1)
    o_ref[...] = x


def run_speed(rows, axis, reps, kernel="gather"):
    # Large grid so timing is dominated by the kernel body.
    tiles = max(1, (1 << 22) // (rows * 128))
    x = np.arange(rows * 128, dtype=np.int32).reshape(rows, 128)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, x.shape[axis], size=(rows, 128)).astype(np.int32)
    body = (functools.partial(_speed_kernel, axis, reps) if kernel == "gather"
            else functools.partial(_roll_kernel, reps))
    f = jax.jit(pl.pallas_call(
        body,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((rows, 128), lambda i: (0, 0)),
                  pl.BlockSpec((rows, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
    ))
    xs, idxs = jnp.asarray(x), jnp.asarray(idx)
    sync(f(xs, idxs))
    t0 = time.perf_counter()
    n_outer = 10
    for _ in range(n_outer):
        sync(f(xs, idxs))
    dt = (time.perf_counter() - t0) / n_outer
    total_ops = tiles * reps
    per_op_ns = dt / total_ops * 1e9
    elems = rows * 128
    print(f"{kernel} rows={rows} axis={axis} reps={reps} tiles={tiles}: "
          f"{dt*1e3:.3f} ms, {per_op_ns:.1f} ns/op "
          f"({per_op_ns/elems*1024:.3f} ns per 1024 elems)", flush=True)


CASES = [(8, 1), (8, 0), (16, 1), (16, 0), (64, 1), (64, 0), (512, 0)]


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    if cmd == "case":
        run_case(int(sys.argv[2]), int(sys.argv[3]))
    elif cmd == "interp":
        for rows, axis in CASES:
            run_case(rows, axis, interpret=True)
    elif cmd == "speed":
        run_speed(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                  sys.argv[5] if len(sys.argv) > 5 else "gather")
    elif cmd == "all":
        for rows, axis in CASES:
            log = f"/tmp/probe_case_{rows}_{axis}.log"
            with open(log, "w") as fh:
                r = subprocess.run(
                    [sys.executable, "-m", "benchmarks.tpu_gather_probe",
                     "case", str(rows), str(axis)],
                    stdout=fh, stderr=subprocess.STDOUT, timeout=900)
            out = open(log).read().splitlines()
            verdict = [l for l in out if ": OK" in l or ": WRONG" in l]
            if verdict:
                print(verdict[-1], flush=True)
            else:
                err = [l for l in out if "NotImplemented" in l
                       or "Unsupported" in l or "error:" in l]
                tail = err[0] if err else (out[-1] if out else "(no output)")
                print(f"rows={rows} axis={axis}: FAIL(rc={r.returncode}): "
                      f"{tail}  [{log}]", flush=True)
    elif cmd == "speedall":
        for a in (["64", "1", "16"], ["64", "1", "64"], ["512", "1", "16"],
                  ["64", "0", "16"], ["512", "0", "16"],
                  ["64", "1", "16", "roll"]):
            log = f"/tmp/probe_speed_{'_'.join(a)}.log"
            with open(log, "w") as fh:
                r = subprocess.run(
                    [sys.executable, "-m", "benchmarks.tpu_gather_probe",
                     "speed", *a], stdout=fh, stderr=subprocess.STDOUT,
                    timeout=900)
            out = open(log).read().splitlines()
            hit = [l for l in out if "ns/op" in l]
            print(hit[-1] if hit else
                  f"speed {a}: FAIL(rc={r.returncode}) [{log}]", flush=True)
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
