"""Focused TPU probes: batch scaling past 96 + stem on/off, one process.

Results stream to /tmp/r2_focus_results.jsonl.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_RES = open("/tmp/r2_focus_results.jsonl", "a", buffering=1)


def emit(**kv):
    line = json.dumps(kv)
    print(line, flush=True)
    _RES.write(line + "\n")


def timed_loop(fn_one, args=(), iters=10):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(i, acc):
            return fn_one(acc, *a)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters


def pipeline_fn(model, nc):
    from quan_ultralytics_tpu.ops.boxes import non_max_suppression

    def one(acc, v, img):
        pred = model.decode(model.module.apply(v, img + acc * 1e-12, train=False))
        det, ok = non_max_suppression(pred, nc=nc, rotated=(model.task == "obb"))
        return det[0, 0, 0].astype("float32")

    return one


def measure(B, img, stem_s2d=True, label=""):
    """One probe; the caller owns the img buffer (re-allocating 1.2 GB per
    probe leaves freed-buffer churn that crashed the remote compile helper)."""
    import gc

    import jax
    import jax.numpy as jnp

    from quan_ultralytics_tpu.models.tasks import DetectionModel

    os.environ["QUAN_STEM_S2D"] = "1" if stem_s2d else "0"
    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15, dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), imgsz=64)
    try:
        t0 = time.perf_counter()
        dt = timed_loop(pipeline_fn(model, 15), args=(v, img), iters=10)
        emit(label=label or f"b{B}_s2d{int(stem_s2d)}", img_s=round(B / dt, 1),
             ms_iter=round(dt * 1e3, 2), compile_s=round(time.perf_counter() - t0 - 10 * dt, 1))
        return B / dt
    except Exception as e:
        emit(label=label or f"b{B}_s2d{int(stem_s2d)}", error=f"{type(e).__name__}: {e}"[:250])
        return 0.0
    finally:
        del v, model
        gc.collect()
        jax.clear_caches()


def _mk_img(B):
    import jax
    import jax.numpy as jnp

    img = jax.jit(lambda k: jax.random.uniform(k, (B, 1024, 1024, 3), jnp.float32))(
        jax.random.PRNGKey(1))
    jax.block_until_ready(img)
    return img


def main():
    import gc

    import jax
    import jax.numpy as jnp

    os.environ.setdefault("QUAN_QCONV_IMPL", "auto")
    t0 = time.perf_counter()
    a = jnp.ones((1024, 1024), jnp.bfloat16)
    float((a @ a)[0, 0])
    emit(probe_s=round(time.perf_counter() - t0, 2))

    img = _mk_img(96)
    measure(96, img, stem_s2d=True, label="b96_stem")
    measure(96, img, stem_s2d=False, label="b96_nostem")
    del img
    gc.collect()
    for B in (112, 120):
        img = _mk_img(B)
        measure(B, img, stem_s2d=True, label=f"b{B}_stem")
        del img
        gc.collect()


if __name__ == "__main__":
    main()
