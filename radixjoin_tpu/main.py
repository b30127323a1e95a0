"""Command-line driver — the reference's ``main.cpp`` as a real CLI.

The reference driver (main.cpp:28-149) hardcodes everything (20M tuples/node,
unique-keys workload, argc/argv ignored); this one exposes the same flow —
init, generate, distribute, join, measure, store — with runtime arguments.

  python -m radixjoin_tpu.main --tuples 1048576 --workload unique
  python -m radixjoin_tpu.main --tuples 4194304 --workload zipf --skew-aware
  python -m radixjoin_tpu.main --distributed --devices 8 --tuples 16384
  python -m radixjoin_tpu.main --tuples 65536 --materialize out.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp


def _sync(x):
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def main(argv=None):
    ap = argparse.ArgumentParser(prog="radixjoin_tpu",
                                 description="TPU radix hash join driver")
    ap.add_argument("--tuples", type=int, default=1 << 20,
                    help="tuples per relation (reference: 20M/node, "
                         "main.cpp:70-71)")
    ap.add_argument("--workload", default="unique",
                    choices=["unique", "modulo", "zipf"],
                    help="R is always dense-unique; S per this choice")
    ap.add_argument("--match-rate", type=int, default=2,
                    help="outer/inner ratio for --workload modulo")
    ap.add_argument("--zipf-theta", type=float, default=1.05)
    ap.add_argument("--mode", default="auto",
                    choices=["auto", "banded", "partitioned", "sortmerge"])
    ap.add_argument("--skew-aware", action="store_true")
    ap.add_argument("--bits", type=int, default=None,
                    help="radix bits (default: auto from size)")
    ap.add_argument("--distributed", action="store_true",
                    help="run the 4-phase mesh join over all devices")
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--shuffle-rounds", type=int, default=2)
    ap.add_argument("--materialize", metavar="OUT.npz", default=None,
                    help="emit joined (r_rid, s_rid, key) rows to an npz")
    ap.add_argument("--seed", type=int, default=1234,
                    help="reference seeds rand() with 1234+node, "
                         "main.cpp:94-98")
    ap.add_argument("--store", action="store_true",
                    help="write experiment-*/ measurement artifacts")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from radixjoin_tpu import JoinConfig, native
    from radixjoin_tpu.data.tuples import Relation
    from radixjoin_tpu.perf.measurements import Measurements

    on_tpu = jax.default_backend() == "tpu"
    cfg = JoinConfig(use_pallas=on_tpu)
    mode = args.mode
    if mode == "auto":
        mode = "banded" if on_tpu else "partitioned"

    meas = Measurements()
    meas.meta.update(WORKLOAD=args.workload, MODE=mode,
                     TUPLES=args.tuples, BACKEND=jax.default_backend())
    n = args.tuples

    with meas.phase("GENERATE", tuples=2 * n):
        rk, rr = native.fill_unique(n, 0, seed=args.seed)
        if args.workload == "unique":
            sk, sr = native.fill_unique(n, 0, seed=args.seed + 1)
            expected = n
        elif args.workload == "modulo":
            inner = max(1, n // args.match_rate)
            sk, sr = native.fill_modulo(n, inner, seed=args.seed + 1)
            expected = None
        else:
            sk, sr = native.fill_zipf(n, domain=n, theta=args.zipf_theta,
                                      seed=args.seed + 1)
            expected = n  # every key in [0, n) matches the dense R exactly once
        r = Relation(jnp.asarray(rk), jnp.asarray(rr))
        s = Relation(jnp.asarray(sk), jnp.asarray(sr))
        _sync(r.keys); _sync(s.keys)

    if args.distributed:
        from jax.sharding import Mesh
        from radixjoin_tpu.engine.distributed import (
            make_distributed_join, total_distributed_matches)
        devs = jax.devices()[: args.devices]
        mesh = Mesh(np.asarray(devs), ("nodes",))
        per = n // len(devs)
        run = make_distributed_join(mesh, per, per, cfg,
                                    shuffle_rounds=args.shuffle_rounds,
                                    skew_aware=args.skew_aware)
        meas.n_nodes = len(devs)
        with meas.phase("COMPILE"):
            res = run(r, s)
            _sync(res.partial_matches)
        with meas.phase("JOIN", tuples=2 * n, ici_bytes=2 * n * 8):
            res = run(r, s)
            _sync(res.partial_matches)
        got = total_distributed_matches(res)
        ok = bool(np.asarray(res.ok).all())
    elif args.materialize:
        from radixjoin_tpu.engine.join import join_rows_auto
        with meas.phase("JOIN", tuples=2 * n):
            out_r, out_s, out_k, valid, got = join_rows_auto(r, s)
        v = np.asarray(valid)
        np.savez(args.materialize,
                 r_rid=np.asarray(out_r)[v], s_rid=np.asarray(out_s)[v],
                 key=np.asarray(out_k)[v])
        print(f"wrote {int(v.sum())} rows to {args.materialize}",
              file=sys.stderr)
        ok = True
    else:
        from radixjoin_tpu.engine.join import join_count, total_matches
        with meas.phase("COMPILE"):
            res = join_count(r, s, cfg, bits=args.bits, mode=mode,
                             skew_aware=args.skew_aware)
            _sync(res.matches)
        with meas.phase("JOIN", tuples=2 * n, hbm_bytes=2 * n * 8 * 5):
            res = join_count(r, s, cfg, bits=args.bits, mode=mode,
                             skew_aware=args.skew_aware)
            _sync(res.matches)
        got = total_matches(res)
        ok = bool(res.ok)
        if not ok:
            from radixjoin_tpu.engine.join import join_count_checked
            got = join_count_checked(r, s, cfg, bits=args.bits, mode=mode,
                                     skew_aware=args.skew_aware)
            ok = True

    # [RESULTS] summary (reference Measurements.cpp:592-702)
    print(f"[RESULTS] Tuples: {got}")
    if expected is not None and got != expected:
        print(f"[RESULTS] MISMATCH: expected {expected}", file=sys.stderr)
        return 1
    meas.print_summary()
    if args.store:
        print(f"stored: {meas.store()}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
