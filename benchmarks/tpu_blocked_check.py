"""Sublane-blocked diagonal probe — REAL-TPU (Mosaic) validation + timing.

The blocked kernel (_probe_diag_kernel_blocked) batches the v2 probe's
+-K shift loop over (8, 128) row blocks — 8 rows per VPU issue instead
of 1.  Staged to contain wedge risk (CLAUDE.md hazards): tiny compile
first, then oracle parity at 2^16, then v2-vs-blocked timing at 2^24 and
a 2^28 prepadded pair (the bench headline's probe shape).

Run DETACHED and poll the log: a failed Mosaic compile can wedge the
relay worker ~40 min.

Usage: python -m benchmarks.tpu_blocked_check [--skip-big]
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from radixjoin_tpu.ops.buildprobe import (bias_keys, diagonal_prepad,
                                          probe_count_diagonal)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def _sorted_perm(n, seed):
    rng = np.random.default_rng(seed)
    return jax.lax.sort(bias_keys(
        jnp.asarray(rng.permutation(n).astype(np.uint32))),
        is_stable=False)


def time_probe(rb, sb, K, blocked, reps=5, prepadded=None):
    out = probe_count_diagonal(rb, sb, k_drift=K, blocked=blocked,
                               prepadded=prepadded)
    sync(out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = probe_count_diagonal(rb, sb, k_drift=K, blocked=blocked,
                                   prepadded=prepadded)
    sync(out[0])
    return (time.perf_counter() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-big", action="store_true")
    args = ap.parse_args()
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    # stage 1: tiny Mosaic compile
    n = 1 << 13
    rb, sb = _sorted_perm(n, 1), _sorted_perm(n, 2)
    t0 = time.perf_counter()
    m, ok = probe_count_diagonal(rb, sb, k_drift=8, blocked=True)
    sync(m)
    log(f"stage1 compile+run {time.perf_counter()-t0:.1f}s: "
        f"m={int(m)} ok={bool(ok)}")
    assert int(m) == n and bool(ok)

    # stage 2: parity vs v2 at 2^16 incl. a trip case
    n = 1 << 16
    rb, sb = _sorted_perm(n, 3), _sorted_perm(n, 4)
    for K in (8, 16):
        m1, ok1 = probe_count_diagonal(rb, sb, k_drift=K)
        m2, ok2 = probe_count_diagonal(rb, sb, k_drift=K, blocked=True)
        assert int(m1) == int(m2) == n and bool(ok1) == bool(ok2) is True
    rng = np.random.default_rng(9)
    rd = jax.lax.sort(bias_keys(jnp.asarray(
        rng.integers(0, n // 8, n, dtype=np.uint32))))
    sd = jax.lax.sort(bias_keys(jnp.asarray(
        rng.integers(0, n // 8, n, dtype=np.uint32))))
    m1, ok1 = probe_count_diagonal(rd, sd, k_drift=8)
    m2, ok2 = probe_count_diagonal(rd, sd, k_drift=8, blocked=True)
    log(f"stage2 parity: dense m={n}, dup m1={int(m1)} m2={int(m2)} "
        f"ok1={bool(ok1)} ok2={bool(ok2)}")
    assert int(m1) == int(m2) and bool(ok1) == bool(ok2)

    # stage 3: timing, 2^24
    n = 1 << 24
    rb, sb = _sorted_perm(n, 5), _sorted_perm(n, 6)
    for K in (8, 16):
        t_v2, (m1, o1) = time_probe(rb, sb, K, False)
        t_bl, (m2, o2) = time_probe(rb, sb, K, True)
        assert int(m1) == int(m2) == n and bool(o1) and bool(o2)
        log(f"stage3 2^24 K={K}: v2 {t_v2*1e3:.1f} ms, "
            f"blocked {t_bl*1e3:.1f} ms ({t_v2/t_bl:.2f}x)")

    if args.skip_big:
        log("BLOCKED TPU OK (big skipped)")
        return

    # stage 4: the headline probe shape — 2^28 prepadded ranged pair
    from radixjoin_tpu.engine.large import (_sort_biased,
                                            gen_unique_keys_ranged_run)
    n = 1 << 28
    K = 8
    src_r = gen_unique_keys_ranged_run(n, 2654435761 | 1)
    src_s = gen_unique_keys_ranged_run(n, 0x9E3779B1 ^ 0x40)
    rp = diagonal_prepad(_sort_biased(src_r(0, 1)), "r", n, n, k_drift=K)
    sp = diagonal_prepad(_sort_biased(src_s(0, 1)), "s", n, n, k_drift=K)
    sync(rp)
    sync(sp)
    for blocked in (False, True):
        t, (m, o) = time_probe(rp, sp, K, blocked, reps=3,
                               prepadded=(n, n))
        assert int(m) == n and bool(o), (int(m), bool(o))
        log(f"stage4 2^28 K={K} blocked={blocked}: {t*1e3:.1f} ms "
            f"({n/t/1e6:.0f} Mrows/s)")
    log("BLOCKED TPU OK")


if __name__ == "__main__":
    main()
