"""Benchmark harness: speed table across models / image sizes / dtypes.

Reference utils/benchmarks.py `benchmark` (:51) builds a cross-format
speed/accuracy table; the TPU-native axes are (model scale, imgsz, dtype,
batch) on the XLA runtime. Timing forces host materialization (on the axon
remote tunnel, dispatch alone returns early).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


def benchmark(
    models: Sequence[str] = ("yolo11n-obb-quan.yaml",),
    imgsz: Sequence[int] = (640, 1024),
    batch: int = 16,
    dtypes: Sequence[str] = ("bfloat16",),
    iters: int = 10,
    nc: int = 15,
    include_nms: bool = True,
) -> List[Dict[str, Any]]:
    import jax
    import jax.numpy as jnp

    from quan_ultralytics_tpu.models.tasks import DetectionModel
    from quan_ultralytics_tpu.ops.boxes import non_max_suppression

    rows = []
    for name in models:
        for size in imgsz:
            for dt in dtypes:
                dtype = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
                model = DetectionModel.from_yaml(name, nc=nc, dtype=dtype)
                variables = model.init(jax.random.PRNGKey(0), imgsz=64)
                rotated = model.task == "obb"

                def fwd(v, x):
                    pred = model.decode(model.module.apply(v, x, train=False))
                    if include_nms:
                        det, ok = non_max_suppression(pred, nc=model.nc, rotated=rotated)
                        return det
                    return pred

                # CLAUDE.md remote-bench methodology: generate the input ON
                # DEVICE (a host transfer rides the TCP relay) and time all
                # iters inside ONE jitted fori_loop with a carry-dependent
                # input (per-dispatch timing is relay-latency-dominated)
                @jax.jit
                def run(v, key):
                    x = jax.random.uniform(key, (batch, size, size, 3),
                                           jnp.float32)

                    def body(i, acc):
                        return fwd(v, x + acc * 1e-12).sum().astype(jnp.float32)

                    return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

                key = jax.random.PRNGKey(0)
                float(run(variables, key))  # compile + warmup (real execution)
                t0 = time.perf_counter()
                float(run(variables, key))  # host-synced by the scalar fetch
                t = (time.perf_counter() - t0) / iters
                rows.append({
                    "model": name, "imgsz": size, "dtype": dt, "batch": batch,
                    "ms_per_batch": round(t * 1e3, 2),
                    "img_per_s": round(batch / t, 1),
                })
    return rows


def print_table(rows: List[Dict[str, Any]]) -> None:
    if not rows:
        return
    keys = list(rows[0])
    widths = {k: max(len(k), *(len(str(r[k])) for r in rows)) for k in keys}
    print("  ".join(k.ljust(widths[k]) for k in keys))
    for r in rows:
        print("  ".join(str(r[k]).ljust(widths[k]) for k in keys))
