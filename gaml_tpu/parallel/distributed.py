"""Multi-host (multi-process) scoring support.

Single-controller JAX covers one host's chips; across hosts we use
``jax.distributed`` with the standard recipe (SURVEY.md section 5.8):

- every process calls :func:`initialize` with the coordinator address;
- the read set is sharded by process (reads_for_process), each process
  builds its local index and candidate batches;
- the per-shard partial sums (sum of floored log-probs, zero counts)
  combine with a global psum over the full mesh
  (parallel.sharded.sharded_single_end_score already runs on the global
  mesh when built from jax.devices() after distributed init);
- the annealing driver runs replicated-deterministically on every process
  (same seed, same move stream), so walk sets never need broadcasting.

The helper below is environment-driven so the same script works under any
launcher (one process per host):

    GAML_COORD=host0:8476 GAML_NUM_PROCS=4 GAML_PROC_ID=$RANK python run.py
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed from args or GAML_* env vars; no-op for
    single-process runs.  Returns (process_id, num_processes)."""
    import jax

    coordinator = coordinator or os.environ.get("GAML_COORD", "")
    if not coordinator:
        return 0, 1
    num_processes = num_processes or int(os.environ.get("GAML_NUM_PROCS", "1"))
    process_id = process_id if process_id is not None else \
        int(os.environ.get("GAML_PROC_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return process_id, num_processes


def reads_for_process(n_reads: int, process_id: int,
                      num_processes: int) -> List[int]:
    """Deterministic contiguous read partition for one process."""
    per = (n_reads + num_processes - 1) // num_processes
    lo = process_id * per
    hi = min(n_reads, lo + per)
    return list(range(lo, hi))


def combine_partials(local_log_sum: float, local_zero: int,
                     local_count: int):
    """All-gather per-process partial sums and combine into the global
    (log_sum, zero_reads, count) — score = log_sum / count.  Works
    unchanged in single-process runs."""
    import numpy as np
    from jax.experimental import multihost_utils

    arr = np.array([local_log_sum, float(local_zero), float(local_count)])
    gathered = np.asarray(multihost_utils.process_allgather(arr))
    gathered = gathered.reshape(-1, 3)
    return (float(gathered[:, 0].sum()), int(gathered[:, 1].sum()),
            int(gathered[:, 2].sum()))
