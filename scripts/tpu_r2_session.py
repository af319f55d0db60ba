"""Round-2 TPU measurement session: baseline + perf-variant A/Bs, one process.

Batches everything into a single long-lived process (the axon tunnel wedges
under process churn). fori_loop timing methodology per CLAUDE.md. Sections:

  1. probe + matmul calibration (session-relative speed-of-light)
  2. full OBB pipeline @1024 (fwd+decode+NMS) at the headline batch:
       a. baseline (QUAN_QCONV_IMPL=auto, fold<32)
       b. fold threshold 64 / 128
       c. fused Pallas 1x1 path (QUAN_FUSED_1X1=1)
       d. best-combo re-measure
  3. COCO detect @640 b64 pipeline (headline config)
  4. train step @1024 b8

Usage: timeout 5400 python scripts/tpu_r2_session.py [batch] | tee /tmp/r2s.json
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timed_loop(fn_one, args=(), iters=10):
    """fn_one(acc, *args) -> scalar. Big arrays MUST come through `args`:
    closed-over concrete arrays embed as HLO constants, and the axon
    remote-compile endpoint rejects oversized request bodies (HTTP 413 -
    measured with a 400 MB closed-over batch)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(i, acc):
            return fn_one(acc, *a)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(run(*args))  # compile + warmup
    t0 = time.perf_counter()
    float(run(*args))
    return (time.perf_counter() - t0) / iters


_RESULTS = open("/tmp/r2_session_results.jsonl", "a", buffering=1)


def emit(**kv):
    line = json.dumps(kv)
    print(line, flush=True)
    _RESULTS.write(line + "\n")


_T0 = time.time()


def over_budget(seconds):
    return time.time() - _T0 > seconds


def pipeline_fn(model, nc):
    from quan_ultralytics_tpu.ops.boxes import non_max_suppression

    def one(acc, v, img):
        pred = model.decode(model.module.apply(v, img + acc * 1e-12, train=False))
        det, ok = non_max_suppression(pred, nc=nc, rotated=(model.task == "obb"))
        return det[0, 0, 0].astype("float32")

    return one


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    a = jnp.ones((1024, 1024), jnp.bfloat16)
    float((a @ a)[0, 0])
    emit(probe_s=round(time.perf_counter() - t0, 2),
         devices=[str(d) for d in jax.devices()])

    N = 4096
    x = jnp.asarray(np.random.randn(N, N).astype(np.float32)).astype(jnp.bfloat16)
    y = jnp.asarray(np.random.randn(N, N).astype(np.float32)).astype(jnp.bfloat16)
    dt = timed_loop(lambda acc, x, y: ((x + acc.astype(jnp.bfloat16) * 1e-12) @ y)[0, 0].astype(jnp.float32),
                    args=(x, y), iters=50)
    emit(matmul4096_tflops=round(2 * N**3 / dt / 1e12, 1))

    from quan_ultralytics_tpu.models.tasks import DetectionModel

    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15, dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), imgsz=64)
    # device-generated input: avoids a 1.2 GB host->device transfer over the relay
    img = jax.jit(lambda k: jax.random.uniform(k, (B, 1024, 1024, 3), jnp.float32))(
        jax.random.PRNGKey(1))
    jax.block_until_ready(img)
    emit(input_ready=True)

    variants = [
        ("baseline_auto", {"QUAN_QCONV_IMPL": "auto"}),
        ("fused1x1", {"QUAN_QCONV_IMPL": "auto", "QUAN_FUSED_1X1": "1"}),
        ("fold64", {"QUAN_QCONV_IMPL": "auto", "QUAN_QCONV_FOLD_MAX": "64"}),
        ("fold128", {"QUAN_QCONV_IMPL": "auto", "QUAN_QCONV_FOLD_MAX": "128"}),
        ("fused1x1_fold64", {"QUAN_QCONV_IMPL": "auto", "QUAN_QCONV_FOLD_MAX": "64",
                             "QUAN_FUSED_1X1": "1"}),
    ]
    keys = ("QUAN_QCONV_IMPL", "QUAN_QCONV_FOLD_MAX", "QUAN_FUSED_1X1")
    results = {}
    budget = float(os.environ.get("R2_BUDGET_S", "3600"))
    for name, env in variants:
        if over_budget(budget * 0.7):
            emit(skipped=name, reason="section budget")
            continue
        for k in keys:
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            t0 = time.perf_counter()
            dt = timed_loop(pipeline_fn(model, 15), args=(v, img), iters=10)
            results[name] = round(B / dt, 1)
            emit(variant=name, img_s=round(B / dt, 1), ms_iter=round(dt * 1e3, 2),
                 compile_s=round(time.perf_counter() - t0 - dt * 10, 1))
        except Exception as e:
            emit(variant=name, error=f"{type(e).__name__}: {e}"[:300])

    # COCO detect headline @640
    for k in keys:
        os.environ.pop(k, None)
    os.environ["QUAN_QCONV_IMPL"] = "auto"
    best = max((v_ for v_ in results.items()), key=lambda kv: kv[1], default=None)
    if best and best[0] != "baseline_auto" and results.get("baseline_auto") and \
            best[1] > results["baseline_auto"] * 1.02:
        os.environ.update(dict(variants[[n for n, _ in variants].index(best[0])][1]))
        emit(best_variant=best[0])

    dmodel = DetectionModel.from_yaml("yolo11n-quan.yaml", nc=80, dtype=jnp.bfloat16)
    dv = dmodel.init(jax.random.PRNGKey(0), imgsz=64)
    dimg = jax.jit(lambda k: jax.random.uniform(k, (64, 640, 640, 3), jnp.float32))(
        jax.random.PRNGKey(2))
    jax.block_until_ready(dimg)
    try:
        dt = timed_loop(pipeline_fn(dmodel, 80), args=(dv, dimg), iters=10)
        emit(coco_640_b64_img_s=round(64 / dt, 1))
    except Exception as e:
        emit(coco_error=str(e)[:300])

    # train step @1024 b8
    from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer

    Bt = 8
    cfg = TrainConfig(epochs=10, batch=Bt, imgsz=1024, nbs=Bt)
    trainer = Trainer(model, cfg, steps_per_epoch=100)
    state = trainer.init_state()
    step_fn = trainer.make_train_step()
    M = 64
    batch = {
        "img": jax.jit(lambda k: jax.random.uniform(k, (Bt, 1024, 1024, 3), jnp.float32))(
            jax.random.PRNGKey(3)),
        "bboxes": jnp.asarray(np.random.rand(Bt, M, 5).astype(np.float32) * 0.3 + 0.1),
        "cls": jnp.zeros((Bt, M), jnp.int32),
        "mask": jnp.ones((Bt, M), bool),
    }
    state, loss, aux = step_fn(state, batch)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(5):
        state, loss, aux = step_fn(state, batch)
    float(loss)
    dt = (time.perf_counter() - t0) / 5
    emit(train_step_b8_1024_img_s=round(Bt / dt, 1), loss=round(float(loss), 2))


if __name__ == "__main__":
    main()
