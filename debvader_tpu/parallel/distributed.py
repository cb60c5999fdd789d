"""Multi-host / multi-slice runtime initialization.

The reference is single-process (SURVEY.md §5 "Distributed communication
backend — ABSENT").  For multi-host TPU slices (and DCN-spanning multi-slice
jobs) the JAX distributed runtime must be initialized once per process
before any device access; this wrapper makes that a no-op on single-host
setups so library code can call it unconditionally.

Meshes built afterwards with ``parallel.mesh.make_mesh`` use
``jax.devices()``, which spans all hosts after initialization — data
parallelism then rides ICI within a slice and DCN across slices, with XLA
choosing the collective algorithms.
"""

from __future__ import annotations

import jax

__all__ = ["initialize_distributed", "is_multi_host"]

_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    With no arguments, relies on the TPU environment's auto-detection
    (JAX_COORDINATOR_ADDRESS etc.).  Returns True if the distributed
    runtime is (now) active, False for single-process runs.
    """
    global _initialized
    if _initialized:
        return True
    if coordinator_address is None and num_processes is None:
        import os

        if not any(
            k in os.environ
            for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
        ):
            return False  # single-process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def is_multi_host() -> bool:
    return jax.process_count() > 1
