"""Multi-host runtime initialization.

The reference is single-process (SURVEY §2.3: deps are numpy + pykdtree,
no comm backend). The TPU framework scales across hosts with the standard
JAX multi-controller runtime: every host runs the same program,
``jax.distributed.initialize`` wires the slice together, and the existing
``shard_map`` aligners then see the global device set — per-iteration traffic
stays the ~40-float GN psum over ICI, with DCN touched only at startup
(SURVEY §5 "distributed communication backend").

Typical pod-slice entrypoint::

    from point_cloud_registration_tpu.parallel import distributed, make_mesh

    distributed.initialize()              # env-driven on TPU pods
    mesh = make_mesh(batch=jax.process_count(), data=...)
    ...

On CPU test rigs pass coordinator/process args explicitly (see
``jax.distributed.initialize`` docs).
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               **kwargs) -> None:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    On Cloud TPU all arguments are discovered from the environment; passing
    them explicitly supports CPU/GPU rigs and tests. Safe to call when the
    runtime is already initialized (no-op) or single-process (no-op when no
    coordinator can be inferred).
    """
    state = getattr(jax._src.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except (ValueError, RuntimeError):
        # single-process environment with nothing to discover: run locally
        if num_processes not in (None, 1):
            raise


def process_info() -> dict:
    """Host/device topology summary for logs and diagnostics."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": [str(d) for d in jax.local_devices()],
        "global_device_count": jax.device_count(),
    }
