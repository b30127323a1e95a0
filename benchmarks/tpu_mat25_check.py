"""2^25/shard materialising max_out variant — crash diagnosis (r4 item 4).

Round 4: the pure-XLA row-triple variant of the distributed join crashed
the relay worker once at 2^25/shard (cause unknown); the config has
guarded it at 2^22 since.  Round 5 rewrote join_materialize's three
searchsorted storms (each ~25 passes of output-sized gathered compares —
the prime suspect) into sort + cummax forward-fills.  This probe re-runs
the exact crashing configuration under the new formulation, then one
size up.

    python -m benchmarks.tpu_mat25_check [--logn 25]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=25)
    ap.add_argument("--also", type=int, default=26,
                    help="second size to try (0 = skip)")
    args = ap.parse_args()
    from jax.sharding import Mesh
    from radixjoin_tpu import JoinConfig
    from radixjoin_tpu.data import relation as gen
    from radixjoin_tpu.engine.distributed import make_distributed_join

    assert jax.default_backend() == "tpu"
    cfg = JoinConfig(use_pallas=True)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("nodes",))
    for logn in [args.logn] + ([args.also] if args.also else []):
        n = 1 << logn
        r = gen.fill_unique(n, jax.random.key(2))
        s = gen.fill_unique(n, jax.random.key(3))
        sync(r.keys)
        run = make_distributed_join(mesh, n, n, cfg,
                                    materialize_max_out=n + (n >> 2))
        t0 = time.perf_counter()
        rows = run(r, s)
        sync(rows.counts)
        t_cold = time.perf_counter() - t0
        assert np.asarray(rows.ok).all()
        tot = int(np.sum(np.asarray(rows.counts, dtype=np.int64)))
        assert tot == n, (tot, n)
        t0 = time.perf_counter()
        rows = run(r, s)
        sync(rows.counts)
        dt = time.perf_counter() - t0
        print(f"2^{logn}: {tot} rows, cold {t_cold:.1f} s, warm {dt:.2f} s"
              f" ({2 * n / dt / 1e6:.1f} Mt/s)", flush=True)
        del rows, run, r, s


if __name__ == "__main__":
    main()
