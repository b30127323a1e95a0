"""64-bit-key join support.

The reference's tuples carry ``uint64`` keys (data/Tuple.h:15-22).  The TPU
engine's fast path is 32-bit SoA (the VPU's native word), but capability
parity requires 64-bit keys for >4G key domains.  Wide keys are (hi, lo)
``uint32`` pairs — x64 stays off, and ``jax.lax.sort`` is variadic with
``num_keys=2``, so lexicographic (hi, lo) sorting is native.

``join64_count`` counts equi-join matches with one concat-sort:
  sort [R ++ S] by (hi, lo, side); equal keys form runs; each run
  contributes (#R in run) * (#S in run).  Run extents come from
  change-point scans (no scatter, no hash table), and per-element run
  boundaries from associative max/min scans — the same scatter-free
  discipline as the rest of the engine (docs/DESIGN.md §1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Relation64(NamedTuple):
    """Wide-key relation: parallel (key_hi, key_lo, rid) uint32 vectors."""
    key_hi: jnp.ndarray
    key_lo: jnp.ndarray
    rids: jnp.ndarray

    @property
    def size(self) -> int:
        return self.key_hi.shape[0]


def make_relation64(keys64, rids) -> Relation64:
    import numpy as np
    keys64 = np.asarray(keys64, np.uint64)
    return Relation64(jnp.asarray((keys64 >> np.uint64(32)).astype(np.uint32)),
                      jnp.asarray((keys64 & np.uint64(0xFFFFFFFF))
                                  .astype(np.uint32)),
                      jnp.asarray(rids, jnp.uint32))


@jax.jit
def join64_count(r: Relation64, s: Relation64) -> jnp.ndarray:
    """Exact match count over 64-bit keys. int32 result (chunk upstream for
    larger totals, as with the 32-bit engine)."""
    n_r = r.size
    hi = jnp.concatenate([r.key_hi, s.key_hi])
    lo = jnp.concatenate([r.key_lo, s.key_lo])
    side = jnp.concatenate([jnp.zeros((n_r,), jnp.int32),
                            jnp.ones((s.size,), jnp.int32)])
    shi, slo, stag = jax.lax.sort((hi, lo, side), num_keys=2,
                                  is_stable=False)
    n = shi.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    change = jnp.concatenate([
        jnp.ones((1,), bool),
        (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
    # start index of each element's run: running max of change positions.
    start = jax.lax.associative_scan(jnp.maximum,
                                     jnp.where(change, idx, 0))
    # end index: running min of next-change positions, scanned in reverse.
    next_start = jnp.concatenate([change[1:], jnp.ones((1,), bool)])
    end = jax.lax.associative_scan(
        jnp.minimum, jnp.where(next_start, idx, n - 1), reverse=True)
    cum_r = jnp.cumsum((stag == 0).astype(jnp.int32))
    # R tuples inside [start, end]: cum_r[end] - cum_r[start-1]
    r_in_run = cum_r[end] - jnp.where(start > 0, cum_r[start - 1], 0)
    return jnp.sum(jnp.where(stag == 1, r_in_run, 0))


def join64_count_checked(r: Relation64, s: Relation64) -> int:
    return int(join64_count(r, s))
