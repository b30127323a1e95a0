"""M-plane multi-match emit kernel — REAL-TPU (Mosaic) validation.

VERDICT r1 item 2: `join_materialize_windowed_multi` had only ever run in
interpret mode; this script Mosaic-compiles it on the chip, checks it
bit-exactly against the numpy oracle at escalating sizes/match rates,
and times it at 2^24 (the reference's probe_match_rate protocol,
operators/gpu/kernels.cu:314-411, as a single bounded-M pass).

Staged to contain wedge risk (CLAUDE.md hazards): tiny N / M=2 compile
first, then M=4, then the 2^24 timing.  Run DETACHED and poll the log.

Usage: python -m benchmarks.tpu_mplane_check
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from radixjoin_tpu.ops.buildprobe import (bias_keys,
                                          join_materialize_windowed_multi)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def oracle(rk, sk, srid, M):
    """Per-R-element match counts + matched-rid sets (order-free)."""
    import collections
    smap = collections.defaultdict(list)
    for k, rid in zip(sk.tolist(), srid.tolist()):
        smap[k].append(rid)
    cnts = np.array([len(smap[k]) for k in rk.tolist()], np.int64)
    sets = [frozenset(smap[k]) for k in rk.tolist()]
    return cnts, sets


def check(n, dup, M, w=4, gr=32, timed=False):
    """R = sorted unique-ish keys; S carries `dup` copies of each R key."""
    rng = np.random.default_rng(7 + n + dup + M)
    rk = np.sort(rng.choice(n * 4, n, replace=False).astype(np.uint32))
    sk = np.sort(np.repeat(rk[:: max(1, dup)], dup)[:n].astype(np.uint32))
    srid = np.arange(n, dtype=np.uint32)

    rb = bias_keys(jnp.asarray(rk))
    sb = bias_keys(jnp.asarray(sk))
    sr = jnp.asarray(srid)

    t0 = time.perf_counter()
    out = join_materialize_windowed_multi(rb, sb, sr, max_matches=M,
                                          window_rows=w, rows_per_group=gr,
                                          interpret=False)
    sync(out[1])
    t_compile = time.perf_counter() - t0
    rid_planes, cnt, win_ok, overflow = map(np.asarray, out)
    log(f"n=2^{n.bit_length()-1} dup={dup} M={M}: compile+run "
        f"{t_compile:.1f}s win_ok={bool(win_ok)} overflow={bool(overflow)}")
    assert bool(win_ok), "window overflow at balanced shape"

    want_cnt, want_sets = oracle(rk, sk, srid, M)
    np.testing.assert_array_equal(cnt.astype(np.int64), want_cnt)
    assert bool(overflow) == bool((want_cnt > M).any())
    # plane contents: exact rid sets where cnt <= M (sample to bound time)
    ix = np.random.default_rng(3).integers(0, n, min(n, 4096))
    for i in ix.tolist():
        c = int(want_cnt[i])
        if c <= M and c > 0:
            got = frozenset(rid_planes[:c, i].tolist())
            assert got == want_sets[i], (i, got, want_sets[i])
    log(f"  exact: counts all-{n}, rid sets sampled x{len(ix)}")

    if timed:
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = join_materialize_windowed_multi(
                rb, sb, sr, max_matches=M, window_rows=w,
                rows_per_group=gr, interpret=False)
        sync(out[1])
        dt = (time.perf_counter() - t0) / reps
        log(f"  timed: {dt*1e3:.1f} ms/rep = {n/dt/1e6:.1f} Mrows/s "
            f"(M={M} planes)")


def main():
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    # stage 1: tiny, M=2 — the Mosaic-compile smoke test
    check(1 << 13, dup=2, M=2)
    # stage 2: M=4 (the pipeline's default), multi-match + overflow mix
    check(1 << 16, dup=2, M=4)
    check(1 << 16, dup=6, M=4)   # cnt>M: overflow flag, counts stay exact
    # stage 3: timing at 2^24
    check(1 << 24, dup=2, M=4, timed=True)
    log("MPLANE TPU OK")


if __name__ == "__main__":
    main()
