"""Diagnose pose-train descent (VERDICT r4 weak #2): single fixed batch,
40 steps, log loss components; A/B assigner f32 vs bf16."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_test_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax.numpy as jnp

from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
from quan_ultralytics_tpu.models.tasks import DetectionModel


def batch(seed=6, B=4, M=4, imgsz=64, nk=17):
    rng = np.random.RandomState(seed)
    boxes = np.tile(np.array([[0.5, 0.5, 0.5, 0.5]], np.float32), (B, M, 1))
    kpts = np.zeros((B, M, nk, 3), np.float32)
    kpts[..., :2] = 0.3 + 0.4 * rng.rand(B, M, nk, 2)
    kpts[..., 2] = 1.0
    img = rng.rand(B, imgsz, imgsz, 3).astype(np.float32)
    return {"img": jnp.asarray(img),
            "bboxes": jnp.asarray(boxes),
            "cls": jnp.zeros((B, M), jnp.int32),
            "mask": jnp.ones((B, M), bool),
            "keypoints": jnp.asarray(kpts)}


def run(tag, assigner_bf16, lr=0.01, steps=40):
    m = DetectionModel.from_yaml("yolo11n-pose-quan.yaml", nc=1)
    cfg = TrainConfig(epochs=100, batch=4, imgsz=64, nbs=4, warmup_epochs=0.0,
                      lr0=lr, assigner_bf16=assigner_bf16)
    tr = Trainer(m, cfg, steps_per_epoch=1)
    state = tr.init_state()
    step = tr.make_train_step()
    b = batch()
    for i in range(steps):
        state, loss, aux = step(state, b)
        if i % 4 == 0 or i == steps - 1:
            comps = {k: round(float(v), 3) for k, v in aux.items()}
            print(f"[{tag}] step {i}: loss={float(loss):.3f} {comps}", flush=True)


if __name__ == "__main__":
    run("f32", False)
    run("bf16", True)
