"""Multi-host bootstrap and cross-host control-plane collectives.

Replaces the reference's process topology layer
(reference: COALA-GNN-Setup/COALA_GNN/Shared_Tensor.py:24-113 —
MPI bootstrap + node-split comms, per-node gloo groups, master gather group):

  MPI.COMM_WORLD / SLURM env        -> jax.distributed.initialize
  local (per-node) comm split       -> process_index / local_device_count
  gloo all_reduce + master gather   -> multihost_utils.process_allgather
  (cache-meta exchange, :96-100)

In JAX every host runs one process and the mesh spans all devices; "part" in
the seed distributor == host == process_index.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed bootstrap. No-op when single-process. Arguments fall
    back to COALA_COORDINATOR / COALA_NUM_PROCS / COALA_PROC_ID env vars
    (the SLURM-free analogue of the reference's MASTER_ADDR/PORT +
    SLURM_NODEID wiring, 4GB_script.sh:19-20, sbatch:249-250)."""
    import jax

    coordinator = coordinator or os.environ.get("COALA_COORDINATOR")
    if not coordinator:
        return
    num_processes = num_processes or int(os.environ.get("COALA_NUM_PROCS", 1))
    process_id = process_id if process_id is not None else \
        int(os.environ.get("COALA_PROC_ID", 0))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def topology():
    """(num_hosts, this_host, local_device_count) — the num_nodes/node_id/
    local_size triple of the reference comm manager (Shared_Tensor.py:31-56)."""
    import jax

    return jax.process_count(), jax.process_index(), jax.local_device_count()


def make_meta_exchange_fn(num_colors: int) -> Callable[[np.ndarray], np.ndarray]:
    """Cross-host cache-meta exchange: every host contributes its local
    color-occupancy counters and receives all hosts' counters
    [num_hosts, num_colors+1] — the distributor's scoring input. Equivalent
    of gather_cache_meta (Shared_Tensor.py:96-100: local gloo all_reduce then
    master all_gather), as one process_allgather."""
    import jax

    if jax.process_count() == 1:
        return lambda local: np.asarray(local, np.int32)[None, :]

    from jax.experimental import multihost_utils

    def fn(local: np.ndarray) -> np.ndarray:
        out = multihost_utils.process_allgather(
            np.ascontiguousarray(local, dtype=np.int32))
        return np.asarray(out, dtype=np.int32).reshape(-1, num_colors + 1)

    return fn
