"""Test harness configuration.

Tests run on a simulated 8-device CPU platform so sharding/collective code
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path). Must run before the first ``import jax`` touches the
backend.

CAUTION (this container): when ``PALLAS_AXON_POOL_IPS`` is set, the axon
sitecustomize hook dials the TPU relay at INTERPRETER start — before this
conftest can run — so a pytest invocation can wedge the relay's data plane
for ~10 minutes if another process holds the chip. Launch pytest with
``PALLAS_AXON_POOL_IPS=`` (empty) whenever a TPU job may be running.
"""

import os

# Force CPU: the session environment pre-sets JAX_PLATFORMS=axon (the TPU
# tunnel) and a sitecustomize hook re-asserts it via jax.config at interpreter
# start, which would route every tiny test jit through remote compilation.
# Both the env var and the config flag must be overridden before backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    A full-suite run accumulates a few hundred XLA:CPU programs in one
    process; with all of them live, the LLVM JIT segfaults compiling the
    suite's biggest program (the shard_map-of-interpret-Pallas parity test
    in test_sharded.py) — deterministically in-suite, never standalone.
    Dropping executables between modules keeps per-module state bounded;
    within-module caching (the expensive repeated programs) is unaffected.
    """
    yield
    jax.clear_caches()
