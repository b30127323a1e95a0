"""Relation generators and cross-shard redistribution.

TPU-native replacement for the reference's ``data/Relation.{h,cpp}``:

  - ``fill_unique``   ~ ``Relation::fillUniqueValues`` (data/Relation.cpp:63-73):
    dense unique keys ``[start, start+n)`` in random order, rid = row index.
    This is the self-validating oracle workload — joining two such relations
    over the same key range yields exactly ``n`` matches (main.cpp:95-98,
    Measurements.cpp:599-606).
  - ``fill_modulo``   ~ ``Relation::fillModuloValues`` (data/Relation.cpp:75-85):
    foreign keys ``start + (i % inner_size)`` shuffled — configurable match
    rate for probe-side experiments.
  - ``fill_zipf``     — Zipf-distributed keys for the skew configs (the
    reference carries a ``zipf`` factor in args_t, data/data.hpp:82, but no
    generator in this snapshot; BASELINE.json requires Zipf(1.05)).
  - ``distribute``    ~ ``Relation::distribute`` (data/Relation.cpp:99-141):
    the reference swaps equal sections pairwise over MPI so every node holds a
    random sample of the global relation.  On a TPU mesh the same effect is a
    single ``all_to_all`` of equal sections inside ``shard_map`` — see
    :func:`distribute_sections`.

All generators are pure JAX (``jax.random``), jit-able, and deterministic in
the seed — the reference seeds ``rand()`` with ``1234 + nodeId``
(main.cpp:94-98); we use ``jax.random.key(seed + shard_index)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .tuples import Relation


def fill_unique(n: int, key, start_key: int = 0, start_rid: int = 0) -> Relation:
    """Dense unique keys [start_key, start_key+n), shuffled; rid = row index."""
    keys = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(start_key)
    keys = jax.random.permutation(key, keys)
    rids = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(start_rid)
    return Relation(keys, rids)


def fill_modulo(n: int, key, inner_size: int, start_key: int = 0,
                start_rid: int = 0) -> Relation:
    """Foreign keys start_key + (i % inner_size), shuffled; rid = row index.

    Match rate vs a unique inner relation of ``inner_size`` keys is
    ``n / inner_size`` (reference data/Relation.cpp:75-85).
    """
    keys = (jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(inner_size)
            + jnp.uint32(start_key))
    keys = jax.random.permutation(key, keys)
    rids = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(start_rid)
    return Relation(keys, rids)


def fill_zipf(n: int, key, domain: int, theta: float = 1.05,
              start_rid: int = 0) -> Relation:
    """Zipf(theta)-distributed keys over [0, domain).

    Inverse-CDF sampling against the analytic approximation of the Zipf CDF
    (avoids materialising a domain-sized table): for rank r in [1, domain],
    P(X <= r) ~= H_r / H_domain with H_r ~= (r^(1-theta) - 1) / (1 - theta).
    Vectorised and jit-able; skew configs in BASELINE.json use theta=1.05.
    """
    u = jax.random.uniform(key, (n,), dtype=jnp.float32,
                           minval=1e-7, maxval=1.0)
    if abs(theta - 1.0) < 1e-6:
        theta = 1.0 + 1e-4
    one_m = 1.0 - theta
    h_max = (float(domain) ** one_m - 1.0) / one_m
    # invert H_r = u * H_max  ->  r = (1 + u*H_max*(1-theta))^(1/(1-theta))
    r = jnp.power(1.0 + u * h_max * one_m, 1.0 / one_m)
    keys = jnp.clip(r.astype(jnp.uint32), 0, domain - 1)
    rids = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(start_rid)
    return Relation(keys, rids)


def distribute_sections(rel: Relation, axis_name: str) -> Relation:
    """Random-sample redistribution across a mesh axis.

    Inside ``shard_map``: splits the local shard into ``n_devices`` equal
    sections and exchanges section ``j`` with device ``j`` — the collective
    form of the reference's pairwise section swap (data/Relation.cpp:104-136).
    Requires the shard size to be divisible by the axis size (the engine pads
    shards to lane multiples anyway).
    """
    n_dev = jax.lax.axis_size(axis_name)
    n = rel.keys.shape[0]
    sec = n // n_dev

    def xchg(x):
        x = x[: sec * n_dev].reshape(n_dev, sec)
        x = jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=0,
                               tiled=False)
        return x.reshape(-1)

    keys = jnp.concatenate([xchg(rel.keys), rel.keys[sec * n_dev:]])
    rids = jnp.concatenate([xchg(rel.rids), rel.rids[sec * n_dev:]])
    return Relation(keys, rids)
