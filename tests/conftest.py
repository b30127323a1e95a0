"""Test harness: force an 8-device virtual CPU mesh.

The test pyramid this repo fills (SURVEY.md §4 — the reference ships no
tests) runs on CPU so it is hardware-independent: Pallas kernels execute in
interpreter mode, multi-device paths run on 8 virtual CPU devices, and the
self-validating unique-keys oracle (reference main.cpp:95-98) provides exact
expected match counts.

NOTE: this environment's sitecustomize registers a remote TPU backend and
forces ``jax_platforms="axon,cpu"`` via jax.config (overriding JAX_PLATFORMS
env); tests override it back to pure CPU with jax.config.update — env vars
alone are not enough.
"""

import os

# Must be set before the CPU backend is instantiated.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    XLA:CPU's JIT keeps every compiled executable's code pages mapped; a
    full-suite run accumulates ~60K VM mappings and aborts inside LLVM when
    it crosses vm.max_map_count (65530 default) — measured: the suite dies
    deterministically at ~85 tests in one process.  Clearing JAX's
    executable caches between modules unmaps retired code at the cost of a
    few duplicate compiles.
    """
    yield
    import gc
    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def mesh8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    from jax.sharding import Mesh
    return Mesh(np.array(devs[:8]), ("nodes",))
