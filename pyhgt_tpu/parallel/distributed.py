"""Multi-host bootstrap.

The reference has no multi-host story (SURVEY.md §2.9). For N-host TPU
slices, JAX needs one ``jax.distributed.initialize`` per process; this
wrapper reads the standard env (auto-detected on TPU pods) and exposes
the process-local device split. Integration-tested with a real
2-process CPU cluster (cross-process psum) in
tests/test_tasks.py::test_distributed_two_process_psum.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def _already_initialized() -> bool:
    # must NOT touch jax.process_count() here: that initializes the XLA
    # backend, after which jax.distributed.initialize refuses to run —
    # the exact failure mode this wrapper exists to prevent
    try:
        from jax._src import distributed as _dist

        return _dist.global_state.client is not None
    except Exception:
        return False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed if a multi-process env is configured.

    MUST run before any other JAX call in the process (device queries
    included). Returns a summary dict (process_index, process_count,
    local/global device counts). On a single host this is a no-op.
    """
    want_init = (
        coordinator_address
        or os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if want_init and not _already_initialized():
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }
