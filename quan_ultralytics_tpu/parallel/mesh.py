"""Device mesh + sharding helpers.

The reference's only parallelism is single-node DDP over NCCL
(ultralytics/engine/trainer.py:217-228, utils/dist.py). The TPU-native
equivalent is a 1-D ``data`` mesh: the batch is sharded over ICI, parameters
and optimizer state are replicated, and XLA's GSPMD partitioner inserts the
gradient all-reduce (psum) automatically — no process-group/rendezvous code,
no subprocess relaunch, no loss*world_size scaling (the global-batch mean is
already the correct objective).

A ``model`` axis is reserved for optional spatial/tensor sharding of very
large image sizes; parity does not require it.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """Shard every leaf along its leading (batch) dimension; batches not
    divisible by the mesh fall back to replication (tiny-run escape hatch)."""
    n = mesh.shape[axis]
    sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def put(x):
        ok = hasattr(x, "shape") and x.ndim > 0 and x.shape[0] % n == 0
        return jax.device_put(x, sharding if ok else rep)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec(axis: str = "data") -> P:
    return P(axis)


def replicated_spec() -> P:
    return P()
