"""Multi-host initialization.

The reference never ran multi-node (SURVEY.md §2: no NCCL/MPI anywhere; the
strategy kwarg was only ever single-host MirroredStrategy). TPU-natively,
multi-host data parallelism is: initialize the distributed runtime, build the
mesh from the global device list, shard per-host batches — XLA's psum rides
ICI within a slice and DCN across slices. Nothing in the models changes.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize_distributed", "global_mesh", "process_local_rows"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or standard TPU env vars.
    Returns True when a multi-process runtime is active. Safe to call on a
    single host (no-op)."""
    try:
        if coordinator_address or os.environ.get("COORDINATOR_ADDRESS"):
            jax.distributed.initialize(
                coordinator_address=coordinator_address
                or os.environ.get("COORDINATOR_ADDRESS"),
                num_processes=num_processes,
                process_id=process_id,
            )
        elif os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"
        ):
            jax.distributed.initialize()  # auto-detect on Cloud TPU
    except (RuntimeError, ValueError):
        pass  # already initialized or single host
    return jax.process_count() > 1


def global_mesh(axis_names=("dp",), shape=None):
    """Mesh over ALL global devices (call after initialize_distributed)."""
    from spmf_tpu.parallel.mesh import make_mesh

    return make_mesh(shape=shape, axis_names=axis_names, devices=jax.devices())


def process_local_rows(n_global_rows: int):
    """(start, stop) row range this host should feed for a dp-sharded batch.

    The global batch must divide evenly over processes — silently flooring
    would drop the remainder rows from training with no signal (use
    ``drop_remainder=True`` batching, the standard pod-feeding layout)."""
    if n_global_rows % jax.process_count() != 0:
        raise ValueError(
            f"global batch of {n_global_rows} rows does not divide over "
            f"{jax.process_count()} processes; batch with "
            "drop_remainder=True (or pad) so every host feeds an equal "
            "row shard"
        )
    per = n_global_rows // jax.process_count()
    start = per * jax.process_index()
    return start, start + per
