"""Multi-host readiness: jax.distributed init + per-host batch formation.

The reference's multi-GPU path writes a temp train script and execs
``torch.distributed.run`` with NCCL rendezvous over a free localhost port
(reference utils/dist.py:25-66, engine/trainer.py:217-228). The JAX-native
equivalent needs no launcher and no subprocess relaunch: every host process
calls :func:`initialize` once, after which ``jax.devices()`` is the GLOBAL
device set, a data mesh spans hosts, and GSPMD inserts the gradient
all-reduce — ICI within a slice, DCN across slices.

Single-host runs (the v5e-8 BASELINE target) never need this module; it is
the documented path past one host (SURVEY §2.10 "TPU-native equivalent"
column). Validated by tests/test_mesh.py::test_two_process_distributed_cpu —
two coordinated CPU processes form one global mesh, assemble per-host
batches into a global array, and psum across hosts.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    Args may come explicitly or from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a TPU
    pod's automatic configuration). Returns True when a multi-process
    runtime was (or already is) initialized, False when this is a plain
    single-process run — callers need no branching either way, because the
    mesh helpers operate on ``jax.devices()`` which is correct in both
    cases.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return jax.process_count() > 1  # e.g. TPU pod auto-init already done
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already initialized" not in str(e).lower():
            raise
    return True


def process_batch_slice(n: int, batch_size: int) -> slice:
    """This host's contiguous row range of a global batch: host ``i`` of
    ``n`` feeds rows [i*per, (i+1)*per) — the analog of the reference's
    rank-sharded DistributedSampler (data/build.py:139-163)."""
    assert batch_size % n == 0, (
        f"global batch {batch_size} must divide over {n} processes")
    per = batch_size // n
    import jax

    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_batch(mesh, host_batch: Any, axis: str = "data") -> Any:
    """Assemble per-host numpy batches into GLOBAL jax.Arrays sharded along
    the leading axis of ``mesh``.

    Each process passes only its local rows (see
    :func:`process_batch_slice`); ``jax.make_array_from_process_local_data``
    stitches them into one logical array without any host ever holding the
    full global batch — the multi-host analog of
    :func:`parallel.mesh.shard_batch`. Works unchanged in single-process
    runs (local data IS the global batch).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, host_batch)
