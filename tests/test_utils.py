"""utils coverage: timers, profiler hook, distributed init, native loader."""

import numpy as np
import jax
import jax.numpy as jnp

from point_cloud_registration_tpu.utils import PhaseTimer, profiler_trace
from point_cloud_registration_tpu.parallel import distributed


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        x = jnp.ones((64, 64)).sum()
    with t.phase("a", block_on=lambda: x):
        pass
    with t.phase("b"):
        pass
    d = t.as_dict()
    assert set(d) == {"a", "b"}
    assert t.counts["a"] == 2
    rep = t.report()
    assert "a" in rep and "ms/call" in rep


def test_profiler_trace_smoke(tmp_path):
    with profiler_trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones((32, 32)) @ jnp.ones((32, 32)))
    # a trace directory should have been produced
    assert any(tmp_path.iterdir())


def test_distributed_initialize_noop_single_process():
    # must be safe (no-op) in a single-process environment
    distributed.initialize()
    info = distributed.process_info()
    assert info["process_count"] >= 1
    assert info["global_device_count"] >= 1


def test_native_loader_is_optional():
    from point_cloud_registration_tpu import native

    lib = native.load()  # None (no compiler) or a CDLL — both acceptable
    assert lib is None or hasattr(lib, "pcd_read_xyz")
