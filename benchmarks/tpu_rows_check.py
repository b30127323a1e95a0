"""North-star-scale MATERIALISING join check (run on the TPU):

  2^28 x 2^28 single pair, then 2^29 x 2^29 via ranged (key, rid) runs —
  (r_rid, s_rid) row production with sampled bit-exact verification
  against the generator's rid -> key bijection (VERDICT r1 item 5:
  BASELINE's correctness target is output ROWS, not just counts).

Outputs stay on device per pair (a full host pull of 2^29 rows is
relay-bandwidth-bound at ~25 MB/s here — engine cost is what's timed);
verification pulls 8K sampled rows per pair plus per-pair checksums
(sum of r_rid over matched rows == sum over all rows when every row
matches exactly once).

Usage: python -m benchmarks.tpu_rows_check [--logn 28]
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    _ = np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


SAMPLE = 8192


def verify_pair(k, rrs, srid, cnt, nr, odd_r, odd_s, rng):
    """Sampled bit-exact row verification + full-pair checksums."""
    n_pair = rrs.shape[0]
    ix = jnp.asarray(np.sort(rng.integers(0, n_pair, SAMPLE)
                             .astype(np.int32)))
    sample = jax.jit(lambda a, i: a[i])
    rr_h = np.asarray(jax.device_get(sample(rrs, ix))).astype(np.int64)
    sr_h = np.asarray(jax.device_get(sample(srid, ix))).astype(np.int64)
    ct_h = np.asarray(jax.device_get(sample(cnt, ix)))
    assert (ct_h == 1).all(), f"pair {k}: sampled cnt != 1"

    def key_of(rid, odd):
        return ((rid % nr) * odd) % nr + (rid // nr) * nr

    np.testing.assert_array_equal(key_of(rr_h, odd_r), key_of(sr_h, odd_s))

    # checksums over the WHOLE pair (device-side reductions, no pull):
    # every row matched exactly once, so matched-rid sums equal the run's
    # full rid range sums on both sides.  The device sums are int32 and
    # WRAP past ~2^17 rows (sum of 15-bit planes ~ nr * 2^15), which is
    # fine for a checksum — compare both sides modulo 2^32 (the round-3
    # version compared a wrapped int32 against an int64 and could never
    # pass at 2^28; it had in fact never been run at that size).
    sums = jax.jit(lambda a, c: (
        jnp.sum((a & 0x7FFF) * c), jnp.sum((a >> 15) * c), jnp.sum(c)))
    lo_r, hi_r, tot = (int(x) for x in jax.device_get(sums(rrs, cnt)))
    lo_s, hi_s, _ = (int(x) for x in jax.device_get(sums(srid, cnt)))
    want = np.arange(k * nr, (k + 1) * nr, dtype=np.int64)
    want_lo = int(np.sum(want & 0x7FFF))
    want_hi = int(np.sum(want >> 15))
    assert tot == nr, f"pair {k}: {tot} rows != {nr}"
    m32 = 1 << 32
    assert (lo_r - want_lo) % m32 == 0 and (hi_r - want_hi) % m32 == 0, \
        f"pair {k}: R rid checksum"
    assert (lo_s - want_lo) % m32 == 0 and (hi_s - want_hi) % m32 == 0, \
        f"pair {k}: S rid checksum"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=28)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from radixjoin_tpu.engine.large import (gen_unique_tuples_ranged_run,
                                            join_rows_keys_ranged_runs)
    n = 1 << args.logn
    runs = 1 if args.logn <= 28 else 1 << (args.logn - 28)
    nr = n // runs
    odd_r, odd_s = 2654435761 | 1, 0x9E3779B1 ^ 0x40
    rsrc = gen_unique_tuples_ranged_run(n, odd_r)
    ssrc = gen_unique_tuples_ranged_run(n, odd_s)
    rng = np.random.default_rng(17)

    collected = []

    def consume(k, rrs, srid, cnt):
        collected.append((k, rrs, srid, cnt))

    best = None
    for rep in range(args.reps + 1):
        collected.clear()
        t0 = time.perf_counter()
        total, ok = join_rows_keys_ranged_runs(
            rsrc, ssrc, runs, n, n, n, consume, sync=sync)
        dt = time.perf_counter() - t0
        assert ok and total == n, f"rows={total} ok={ok}"
        if rep:
            best = dt if best is None else min(best, dt)
        log(f"rep {rep}: {dt*1e3:.0f} ms ({'timed' if rep else 'compile'})")

    for k, rrs, srid, cnt in collected:
        verify_pair(k, rrs, srid, cnt, nr, odd_r, odd_s, rng)
    log(f"verified {len(collected)} pair(s): sampled rows bit-exact, "
        f"rid checksums exact")
    log(f"MATERIALIZE 2^{args.logn} x 2^{args.logn}: {best*1e3:.0f} ms "
        f"= {2*n/best/1e6:.1f} Mt/s (rows stay on device)")


if __name__ == "__main__":
    main()
