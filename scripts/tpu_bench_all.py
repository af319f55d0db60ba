"""Consolidated TPU measurement session.

The axon tunnel degrades with process churn — run ALL measurements in one
process. Prints labeled JSON lines; safe to ctrl-C between sections.

Timing methodology: the tunnel adds ~30ms per dispatch roundtrip, and
block_until_ready does not synchronize with real remote execution — so each
measurement runs K iterations inside ONE jitted fori_loop (with a
carry-dependent input to defeat loop-invariant hoisting) and fetches a
scalar, then divides by K.
"""

import json
import time

import numpy as np


def timed_loop(fn_one, make_dep, iters=10):
    """Build jit(fori_loop) around fn_one(x_dep) -> scalar; time one call."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run():
        def body(i, acc):
            return fn_one(acc)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    r = float(run())  # compile + warmup
    t0 = time.perf_counter()
    r = float(run())
    dt = (time.perf_counter() - t0) / iters
    return dt, r


def main():
    import jax
    import jax.numpy as jnp

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))

    # 1. MXU calibration
    N = 4096
    a = jnp.asarray(np.random.randn(N, N).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(np.random.randn(N, N).astype(np.float32)).astype(jnp.bfloat16)

    def mm(acc):
        return ((a + acc.astype(jnp.bfloat16) * 1e-12) @ b)[0, 0].astype(jnp.float32)

    dt, _ = timed_loop(mm, None, iters=50)
    print(json.dumps({"matmul4096_tflops": round(2 * N**3 / dt / 1e12, 1)}))

    # 2. flagship inference @1024 (grouped-conv path)
    from quan_ultralytics_tpu.models.tasks import DetectionModel
    from quan_ultralytics_tpu.ops.boxes import non_max_suppression

    B = 16
    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15, dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), imgsz=64)
    img = jnp.asarray(np.random.rand(B, 1024, 1024, 3).astype(np.float32))

    def fwd(acc):
        pred = model.decode(model.module.apply(v, img + acc * 1e-12, train=False))
        return pred[0, 0, 0].astype(jnp.float32)

    dt, _ = timed_loop(fwd, None, iters=10)
    print(json.dumps({"fwd_decode_b16_1024_img_s": round(B / dt, 1), "ms": round(dt * 1e3, 2)}))

    def fwd_nms(acc):
        pred = model.decode(model.module.apply(v, img + acc * 1e-12, train=False))
        det, ok = non_max_suppression(pred, nc=15, rotated=True)
        return det[0, 0, 0].astype(jnp.float32)

    dt, _ = timed_loop(fwd_nms, None, iters=10)
    print(json.dumps({"fwd_decode_nms_b16_1024_img_s": round(B / dt, 1), "ms": round(dt * 1e3, 2)}))

    # 3. train step @1024 (smaller batch)
    from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer

    Bt = 8
    cfg = TrainConfig(epochs=10, batch=Bt, imgsz=1024, nbs=Bt)
    trainer = Trainer(model, cfg, steps_per_epoch=100)
    # model dtype already bf16
    state = trainer.init_state()
    step_fn = trainer.make_train_step()
    M = 64
    batch = {
        "img": jnp.asarray(np.random.rand(Bt, 1024, 1024, 3).astype(np.float32)),
        "bboxes": jnp.asarray(np.random.rand(Bt, M, 5).astype(np.float32) * 0.3 + 0.1),
        "cls": jnp.zeros((Bt, M), jnp.int32),
        "mask": jnp.ones((Bt, M), bool),
    }
    state, loss, aux = step_fn(state, batch)  # compile
    t0 = time.perf_counter()
    for _ in range(5):
        state, loss, aux = step_fn(state, batch)
    l = float(loss)  # sync
    dt = (time.perf_counter() - t0) / 5
    print(json.dumps({"train_step_b8_1024_img_s": round(Bt / dt, 1),
                      "ms": round(dt * 1e3, 1), "loss": round(l, 2)}))


if __name__ == "__main__":
    main()
