"""Multi-host initialization and process-local sharding helpers.

The reference has no distributed backend at all (SURVEY §2.2).  Pod-slice /
multi-host runs here are the standard JAX recipe: every host runs the same
program, `initialize_multihost()` wires the processes together, and the
global mesh spans all chips (DP collectives ride ICI within a slice, DCN
across slices).  The bake's host loop then feeds each process its local
shard of texel batches via `process_local_slice`.

Nothing in this module is TPU-pod-only: with
`jax.distributed.initialize()`'s env-based autodetection it also covers
multi-process CPU/GPU testing.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed (no-op in single-process runs).

    Returns (process_index, process_count)."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return jax.process_index(), jax.process_count()


def process_local_slice(n: int, process_index: int, process_count: int) -> slice:
    """Contiguous [start, stop) share of n items for this process."""
    per = (n + process_count - 1) // process_count
    start = process_index * per
    return slice(start, min(start + per, n))


def global_mesh(axis_name: str = "rays"):
    """1-D mesh over ALL devices across hosts."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))
