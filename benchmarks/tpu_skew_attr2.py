"""Phase-level attribution of join_count_keys_skew_hashed (VERDICT r4 #1).

Round-4 accounting left ~25 s/rep of the 1B Zipf config unattributed
(docs/ROADMAP.md round-4 status).  This probe replays the skew-hashed
join phase by phase with hard relay fences, and then SUB-attributes the
phase-2 `_ranges_all` executable by timing three variants of its loop
body on identical resident inputs:

  full      — slice assembly + mergecount (the shipped body)
  assembly  — slice assembly only (mergecount replaced by jnp.sum)
  merge     — mergecount only (one prebuilt range pair, looped n_ranges x)

full - assembly ~ mergecount cost in situ; full - merge ~ assembly cost
in situ; disagreement between the decompositions = loop/executable
overhead.  Usage (detached on the TPU):

    python -m benchmarks.tpu_skew_attr2 --logn 27 --runs 16 --ranges 16
"""

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0:1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=27)
    ap.add_argument("--runs", type=int, default=16)
    ap.add_argument("--ranges", type=int, default=16)
    ap.add_argument("--theta", type=float, default=1.05)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from radixjoin_tpu.engine import large as L
    from radixjoin_tpu.ops import skew as skew_ops
    from radixjoin_tpu.ops.buildprobe import _merged_partials, _PARTIAL_BLOCK

    n = 1 << args.logn
    runs = args.runs
    n_ranges = args.ranges
    nr = n // runs
    r_source = L.gen_zipf_keys_run(n, n, args.theta, seed=42)
    s_source = L.gen_zipf_keys_run(n, n, args.theta, seed=43)
    print(f"n=2^{args.logn}/side runs={runs} ranges={n_ranges} "
          f"theta={args.theta} backend={jax.devices()[0].platform}",
          flush=True)

    t0 = time.perf_counter()

    # ---- phase 0: detection (mirror of _detect_all in skew_hashed) ----
    hks, hvs = [], []
    base = jax.random.key(0)
    fold = 0
    for src, rn in ((r_source, runs), (s_source, runs)):
        for i in range(min(rn, 2)):
            k = src(i, rn)
            fold += 1
            win = 1 << 16
            if k.shape[0] > win:
                off = ((i * 2654435761) % (k.shape[0] - win)) & ~127
                k = jax.lax.slice_in_dim(k, off, off + win)
            hh = skew_ops.detect_heavy_keys(
                k, jax.random.fold_in(base, fold), 8 * max(1, rn // 2))
            hks.append(hh.keys)
            hvs.append(hh.valid)
    hks.append(jnp.asarray(np.array(L._SENT_PREIMAGES, np.uint32)))
    hvs.append(jnp.ones((2,), bool))
    hh = skew_ops.dedup_heavy(skew_ops.HeavyHitters(
        jnp.concatenate(hks), jnp.concatenate(hvs)))
    sync(hh.keys)
    t1 = time.perf_counter()
    print(f"DETECT     {t1 - t0:8.2f} s  (K={hh.keys.shape[0]})", flush=True)

    # ---- phase 1: per-run relabel+sort+heavycount+bounds ----
    @functools.partial(jax.jit, donate_argnums=0)
    def _relabel_sort_count(keys, hk, hv, sentinel):
        eq = (keys[None, :] == hk[:, None]) & hv[:, None]
        hcnt = jnp.sum(eq, axis=1, dtype=jnp.int32)
        m = jnp.any(eq, axis=0)
        rel = keys * jnp.uint32(L._RELABEL_MULT)
        return jax.lax.sort(jnp.where(m, sentinel, rel),
                            is_stable=False), hcnt

    span = (1 << 32) // n_ranges
    bounds_vals = jnp.asarray(
        np.minimum(np.arange(n_ranges + 1, dtype=np.int64) * span,
                   0xFFFFFFFE).astype(np.uint32))

    @jax.jit
    def _bounds_of(sorted_run):
        return jnp.searchsorted(sorted_run, bounds_vals).astype(jnp.int32)

    cap_slack = 1.15
    cap_r = int(-(-int(nr / n_ranges * cap_slack) // 128) * 128)
    cap_s = cap_r

    def build_side(src, sentinel, cap):
        pad = jnp.full((cap,), jnp.uint32(sentinel))
        sorted_runs, bnds = [], []
        hcnt = jnp.zeros((hh.keys.shape[0],), jnp.int32)
        for i in range(runs):
            srt, hc = _relabel_sort_count(src(i, runs), hh.keys, hh.valid,
                                          jnp.uint32(sentinel))
            hcnt = hcnt + hc
            bnds.append(_bounds_of(srt))
            srt = jnp.concatenate([srt, pad])
            sync(srt)
            sorted_runs.append(srt)
        return sorted_runs, jnp.stack(bnds), hcnt

    r_sorted, r_bounds, cr = build_side(r_source, 0xFFFFFFFF, cap_r)
    t2 = time.perf_counter()
    s_sorted, s_bounds, cs = build_side(s_source, 0xFFFFFFFE, cap_s)
    t3 = time.perf_counter()
    print(f"BUILD_R    {t2 - t1:8.2f} s   BUILD_S {t3 - t2:8.2f} s "
          f"(cap={cap_r})", flush=True)
    cr_h = np.asarray(jax.device_get(cr)).astype(np.int64)
    cs_h = np.asarray(jax.device_get(cs)).astype(np.int64)
    heavy_total = int(np.sum(cr_h * cs_h))
    t4 = time.perf_counter()
    print(f"HEAVY_PULL {t4 - t3:8.2f} s  heavy={heavy_total}", flush=True)

    concat_r = runs * cap_r
    concat_s = runs * cap_s
    nb = -(-(concat_r + concat_s) // _PARTIAL_BLOCK)

    def side_concat(sorted_runs, bounds, cap, sentinel, rg):
        slot = jnp.arange(cap, dtype=jnp.int32)
        parts = []
        ok = jnp.bool_(True)
        for run, arr in enumerate(sorted_runs):
            start = jax.lax.dynamic_index_in_dim(bounds[run], rg, 0,
                                                 keepdims=False)
            end = jax.lax.dynamic_index_in_dim(bounds[run], rg + 1, 0,
                                               keepdims=False)
            size = end - start
            ok = ok & (size <= cap)
            sl = jax.lax.dynamic_slice_in_dim(arr, start, cap)
            parts.append(jnp.where(slot < size, sl, jnp.uint32(sentinel)))
        return jnp.concatenate(parts), ok

    @jax.jit
    def ranges_full(r_sorted, r_bounds, s_sorted, s_bounds):
        def body(rg, carry):
            lo_a, hi_a, oks = carry
            rr, ok_r = side_concat(r_sorted, r_bounds, cap_r, 0xFFFFFFFF, rg)
            ss, ok_s = side_concat(s_sorted, s_bounds, cap_s, 0xFFFFFFFE, rg)
            lo, hi = _merged_partials(rr, ss)
            ok_k = (ok_r & ok_s).astype(jnp.int32)
            return (jax.lax.dynamic_update_slice_in_dim(lo_a, lo[None, :], rg, 0),
                    jax.lax.dynamic_update_slice_in_dim(hi_a, hi[None, :], rg, 0),
                    jax.lax.dynamic_update_index_in_dim(oks, ok_k, rg, 0))
        return jax.lax.fori_loop(
            0, n_ranges, body,
            (jnp.zeros((n_ranges, nb), jnp.int32),
             jnp.zeros((n_ranges, nb), jnp.int32),
             jnp.zeros((n_ranges,), jnp.int32)))

    @jax.jit
    def ranges_assembly(r_sorted, r_bounds, s_sorted, s_bounds):
        def body(rg, carry):
            acc, oks = carry
            rr, ok_r = side_concat(r_sorted, r_bounds, cap_r, 0xFFFFFFFF, rg)
            ss, ok_s = side_concat(s_sorted, s_bounds, cap_s, 0xFFFFFFFE, rg)
            tot = (jnp.sum(rr, dtype=jnp.uint32)
                   + jnp.sum(ss, dtype=jnp.uint32)).astype(jnp.int32)
            ok_k = (ok_r & ok_s).astype(jnp.int32)
            return (acc + tot,
                    jax.lax.dynamic_update_index_in_dim(oks, ok_k, rg, 0))
        return jax.lax.fori_loop(
            0, n_ranges, body,
            (jnp.int32(0), jnp.zeros((n_ranges,), jnp.int32)))

    @jax.jit
    def ranges_merge_only(rr, ss):
        def body(rg, carry):
            lo_a, hi_a = carry
            lo, hi = _merged_partials(rr, ss)
            return (jax.lax.dynamic_update_slice_in_dim(lo_a, lo[None, :], rg, 0),
                    jax.lax.dynamic_update_slice_in_dim(hi_a, hi[None, :], rg, 0))
        return jax.lax.fori_loop(
            0, n_ranges, body,
            (jnp.zeros((n_ranges, nb), jnp.int32),
             jnp.zeros((n_ranges, nb), jnp.int32)))

    def timed(label, fn, *a):
        tc0 = time.perf_counter()
        out = fn(*a)
        sync(out[0])
        tc1 = time.perf_counter()
        out = fn(*a)
        sync(out[0])
        tc2 = time.perf_counter()
        print(f"{label:10s} compile+run {tc1 - tc0:8.2f} s   "
              f"warm {tc2 - tc1:8.2f} s", flush=True)
        return out

    full = timed("RANGES", ranges_full, r_sorted, r_bounds,
                 s_sorted, s_bounds)
    timed("ASSEMBLY", ranges_assembly, r_sorted, r_bounds,
          s_sorted, s_bounds)

    # one prebuilt range pair for the merge-only loop
    @jax.jit
    def one_range(r_sorted, r_bounds, s_sorted, s_bounds):
        rr, _ = side_concat(r_sorted, r_bounds, cap_r, 0xFFFFFFFF, 1)
        ss, _ = side_concat(s_sorted, s_bounds, cap_s, 0xFFFFFFFE, 1)
        return rr, ss
    rr1, ss1 = one_range(r_sorted, r_bounds, s_sorted, s_bounds)
    sync(rr1)
    timed("MERGEONLY", ranges_merge_only, rr1, ss1)

    lo_h = np.asarray(jax.device_get(full[0]), np.int64).sum()
    hi_h = np.asarray(jax.device_get(full[1]), np.int64).sum()
    oks = np.asarray(jax.device_get(full[2]))
    total = int(lo_h + (hi_h << 15)) + heavy_total
    print(f"matches={total} ok={bool((oks == 1).all())} "
          f"wall={time.perf_counter() - t0:.2f} s", flush=True)


if __name__ == "__main__":
    main()
