"""Host->device input prefetch (double buffering).

The reference overlaps input work with compute via torch DataLoader worker
processes + pin_memory/non_blocking H2D copies (data/build.py:39-63
InfiniteDataLoader). The TPU-native equivalent: a background thread that
converts + device_puts (shards) the next `size` batches while the current
step runs, so the H2D transfer and the host-side collate hide behind device
compute. jax.device_put is async — the thread only *enqueues* transfers.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator, Optional

import jax.numpy as jnp

from quan_ultralytics_tpu.parallel.mesh import shard_batch


def prefetch_to_device(iterator: Iterable, mesh=None, size: int = 2) -> Iterator[Any]:
    """Yield batches already device-resident (sharded over `mesh` if given).

    Dict batches have array values converted with jnp.asarray; non-array
    values (e.g. im_files lists) pass through untouched.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def _put(batch):
        if isinstance(batch, dict):
            batch = {
                k: (jnp.asarray(v) if not isinstance(v, (list, tuple, str)) else v)
                for k, v in batch.items()
            }
            if mesh is not None:
                arrays = {k: v for k, v in batch.items() if not isinstance(v, (list, tuple, str))}
                arrays = shard_batch(mesh, arrays)
                batch = {**batch, **arrays}
        return batch

    def producer():
        try:
            for batch in iterator:
                q.put(_put(batch))
            q.put(_END)
        except BaseException as e:  # forward into the consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
