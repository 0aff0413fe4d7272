"""Multi-host initialization.

The reference has no distributed story (SURVEY.md §2.3). For multi-host TPU
slices, JAX's standard recipe applies: call `initialize()` once per host
before any backend use; the mesh then spans all global devices, with the data
axis riding ICI within a slice and DCN across hosts — XLA handles transport,
no custom backend (SURVEY.md §5).
"""

from __future__ import annotations

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize with TPU-pod auto-detection defaults.

    On Cloud TPU pods all three arguments auto-detect; pass them explicitly
    for other clusters. No-op when already initialized or single-process.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        pass


def global_mesh_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
