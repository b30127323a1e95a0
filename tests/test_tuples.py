"""Property tests of tuple packing bit-math vs a NumPy oracle
(SURVEY.md §4 test-pyramid layer (a))."""

import numpy as np
import jax.numpy as jnp

from radixjoin_tpu.data import tuples


def _np_pack(key, rid, fanout, payload):
    key = key.astype(np.uint64)
    rid = rid.astype(np.uint64)
    # reference layout: value = rid | ((key >> F) << (F + PAYLOAD))
    # (tasks/NetworkPartitioning.cpp:128-129)
    return rid | ((key >> np.uint64(fanout)) << np.uint64(fanout + payload))


def test_pack_compressed_matches_reference_layout():
    rng = np.random.default_rng(0)
    n = 4096
    for fanout, payload in [(5, 27), (0, 27), (5, 20), (8, 24), (3, 29)]:
        keys = rng.integers(0, 2**32, n, dtype=np.uint32)
        rids = rng.integers(0, 2**payload, n, dtype=np.uint32)
        hi, lo = tuples.pack_compressed(jnp.asarray(keys), jnp.asarray(rids),
                                        fanout, payload)
        got = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) \
            | np.asarray(lo).astype(np.uint64)
        want = _np_pack(keys, rids, fanout, payload)
        np.testing.assert_array_equal(got, want)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    n = 2048
    for fanout, payload in [(5, 27), (5, 20), (8, 24)]:
        keys = rng.integers(0, 2**32, n, dtype=np.uint32)
        rids = rng.integers(0, 2**payload, n, dtype=np.uint32)
        pid = keys & ((1 << fanout) - 1)
        hi, lo = tuples.pack_compressed(jnp.asarray(keys), jnp.asarray(rids),
                                        fanout, payload)
        k2, r2 = tuples.unpack_compressed(hi, lo, fanout, jnp.asarray(pid),
                                          payload)
        np.testing.assert_array_equal(np.asarray(k2), keys)
        np.testing.assert_array_equal(np.asarray(r2), rids)


def test_pack32_roundtrip():
    rng = np.random.default_rng(2)
    n = 2048
    fanout, payload = 8, 16
    keys = rng.integers(0, 2**24, n, dtype=np.uint32)  # 24-bit keys
    rids = rng.integers(0, 2**payload, n, dtype=np.uint32)
    pid = keys & ((1 << fanout) - 1)
    packed = tuples.pack_compressed32(jnp.asarray(keys), jnp.asarray(rids),
                                      fanout, payload)
    k2, r2 = tuples.unpack_compressed32(packed, fanout, jnp.asarray(pid),
                                        payload)
    np.testing.assert_array_equal(np.asarray(k2), keys)
    np.testing.assert_array_equal(np.asarray(r2), rids)


def test_radix_bits():
    keys = jnp.asarray(np.arange(1024, dtype=np.uint32))
    np.testing.assert_array_equal(
        np.asarray(tuples.radix_bits(keys, 5)), np.arange(1024) % 32)
    np.testing.assert_array_equal(
        np.asarray(tuples.radix_bits(keys, 3, 2)), (np.arange(1024) >> 2) % 8)
