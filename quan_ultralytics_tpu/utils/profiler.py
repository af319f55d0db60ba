"""Profiling: XLA traces + per-layer cost tables.

TPU analog of the reference profilers (BaseModel._profile_one_layer
nn/tasks.py:177-200, root profiler.py / layer_profiler.py):

  * `trace(path)`: context manager around `jax.profiler` — open the dump in
    TensorBoard/XProf for the op-level timeline (the honest way to profile a
    fused XLA program).
  * `profile_layers(model, variables, x)`: wall-clock per layer by running
    the graph prefix-by-prefix (each prefix jitted); reports per-layer deltas
    like the reference's hook-based LayerProfiler. Fusion across layer
    boundaries makes this approximate — deltas can be slightly negative on
    fast layers.
  * `flops_table(specs)`: analytic FLOPs per layer from the spec (the thop
    analog), counting the separable quaternion conv as 4 component convs +
    mixing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median wall time of a jitted callable (seconds)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def profile_layers(model, variables, x: jnp.ndarray, iters: int = 5) -> List[Dict[str, Any]]:
    """Per-layer wall-clock deltas by timing jitted graph prefixes."""
    from quan_ultralytics_tpu.models.tasks import QUANYOLO

    specs = model.specs
    rows = []
    prev = 0.0
    for upto in range(len(specs)):
        sub = QUANYOLO(tuple(specs[: upto + 1]), model.module.save, dtype=model.module.dtype,
                       mapping_type=model.module.mapping_type)

        def fwd(variables, x):
            return sub.apply(variables, x, train=False)

        try:
            t = time_fn(jax.jit(fwd), variables, x, iters=iters, warmup=1)
        except Exception:  # heads need list inputs; prefix may be invalid
            continue
        spec = specs[upto]
        rows.append({
            "i": spec.i, "module": spec.module, "c2": spec.c2,
            "cum_ms": t * 1e3, "delta_ms": (t - prev) * 1e3,
        })
        prev = t
    return rows


def conv_flops(c1: int, c2: int, k: int, h: int, w: int) -> int:
    """Separable quaternion conv FLOPs: 4 per-component convs + 16-add mix."""
    per_comp = (c1 // 4) * (c2 // 4) * k * k * 2
    return h * w * (4 * per_comp + 16 * (c2 // 4))


def summary(model, variables, imgsz: int = 640) -> Dict[str, Any]:
    """model_info analog (reference torch_utils.py:299): params + GFLOPs."""
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"]))
    flops = 0
    for s in model.specs:
        if s.module in ("Conv", "DWConv") and len(s.args) >= 3:
            h = w = imgsz // max(s.stride, 1)
            flops += conv_flops(s.args[0] if s.args[0] != 3 else 4, s.args[1], s.args[2], h, w)
    return {"params": n_params, "approx_conv_gflops": flops / 1e9}
