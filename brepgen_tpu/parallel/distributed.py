"""Multi-host initialization over DCN.

The reference has no multi-node support (single-process DataParallel only,
SURVEY.md section 2.3). Here: call ``maybe_initialize_distributed()`` at
entry; when the standard coordination env vars are present
(COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or a TPU pod runtime
that auto-detects), ``jax.distributed.initialize`` joins the global mesh
and every device-mesh helper in ``parallel.mesh`` operates on global
devices. Per-host data loading: shard the sample list by
``jax.process_index()``.
"""

from __future__ import annotations

import os

import jax


def maybe_initialize_distributed() -> bool:
    """Initialize multi-host JAX if configured; returns True if distributed.

    The env check MUST run before anything touches the backend —
    ``jax.process_count()`` itself initializes XLA, after which
    ``jax.distributed.initialize`` refuses to run.
    """
    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID")
    if coord and nproc and pid:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
        )
        return True
    return jax.process_count() > 1  # e.g. a TPU pod runtime auto-initialized


def shard_list_for_host(items):
    """Static per-host shard of a sample list (drop remainder for equal
    per-host batch counts)."""
    n = jax.process_count()
    if n == 1:
        return list(items)
    per = len(items) // n
    i = jax.process_index()
    return list(items[i * per : (i + 1) * per])
