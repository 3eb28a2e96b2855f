"""Multi-host (pod / multi-slice) initialization.

Single-host multi-chip needs nothing — ``jax.devices()`` sees every chip on
the host and ``parallel.mesh`` spans them over ICI.  For multi-host pods,
call :func:`initialize` once per process before any JAX call; afterwards
``jax.devices()`` is global and the same mesh code scales across hosts
(data-parallel gradients ride ICI within a slice and DCN across slices —
lay the ``data`` axis so the inner dimension maps to ICI).

The reference has no distributed story at all (SURVEY.md §2: no
torch.distributed anywhere); this module is the TPU-native equivalent of
what would have been its NCCL/MPI bootstrap.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX's distributed runtime (idempotent, env-var aware.)

    On Cloud TPU pods the arguments auto-detect from the TPU metadata; on
    other clusters set ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` or pass them explicitly.
    """
    import jax

    if getattr(initialize, "_done", False):
        return
    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    nproc = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    if nproc:
        kwargs["num_processes"] = int(nproc)
    pid = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    initialize._done = True  # type: ignore[attr-defined]


def is_primary() -> bool:
    """True on the process that should write logs/checkpoints."""
    import jax

    return jax.process_index() == 0
