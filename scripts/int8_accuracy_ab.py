"""int8 PTQ accuracy A/B on the synthetic-overfit OBB model (CPU, ~30 min).

Trains the tests/test_convergence.py model (60-epoch overfit of
QUAN-YOLO11n-OBB nc=3 on 8 synthetic rotated-box images @96), saves the
weights, then validates the SAME weights in fresh subprocesses under
QUAN_QCONV_IMPL=auto and =int8 and prints both metric rows. Quantifies the
accuracy cost of the opt-in PTQ serving path (ops/qconv.py:qconv2d_int8):
per-out-channel folded-kernel weights + dynamic per-tensor activations.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/int8_accuracy_ab.py [all|train|val]

Results land in /tmp/int8ab/{weights.pkl,results.jsonl}.
"""

import json
import os
import pickle
import subprocess
import sys
from pathlib import Path

WORK = Path("/tmp/int8ab")


def train():
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    from test_e2e import make_synthetic_obb_dataset

    from quan_ultralytics_tpu.data.build import build_dataloader
    from quan_ultralytics_tpu.data.dataset import YOLODataset
    from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
    from quan_ultralytics_tpu.models.tasks import DetectionModel

    WORK.mkdir(parents=True, exist_ok=True)
    yml = make_synthetic_obb_dataset(WORK / "ds", n_images=8, imgsz=96, nc=3)
    ds = YOLODataset(yml, split="train", task="obb")
    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=3)
    cfg = TrainConfig(epochs=60, batch=8, imgsz=96, lr0=0.01, nbs=8, warmup_epochs=0.0)
    trainer = Trainer(model, cfg, steps_per_epoch=1)
    state = trainer.init_state()
    step = trainer.make_train_step()
    for epoch in range(60):
        for b in build_dataloader(ds, 8, imgsz=96, hyp=None, augment=False,
                                  max_labels=16, seed=0):
            b = {k: jnp.asarray(v) for k, v in b.items()}
            state, loss, aux = step(state, b)
        if epoch % 10 == 0:
            print(f"epoch {epoch}: loss={float(loss):.3f}", flush=True)
    with open(WORK / "weights.pkl", "wb") as f:
        pickle.dump(state.variables(ema=False), f)
    print("weights saved", flush=True)


def val(impl: str):
    from quan_ultralytics_tpu.data.dataset import YOLODataset
    from quan_ultralytics_tpu.engine.validator import Validator
    from quan_ultralytics_tpu.models.tasks import DetectionModel

    with open(WORK / "weights.pkl", "rb") as f:
        variables = pickle.load(f)
    ds = YOLODataset(str(WORK / "ds" / "data.yaml"), split="train", task="obb")
    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=3)
    v = Validator(model, imgsz=96, conf=0.01)
    m = v(variables, ds, batch_size=8)
    row = {"impl": impl, **{k: round(float(x), 4) for k, x in m.items()}}
    with open(WORK / "results.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    cpu_env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                   PYTHONPATH=str(Path(__file__).resolve().parents[1]))
    if mode == "train":
        train()
    elif mode == "val":
        val(os.environ.get("QUAN_QCONV_IMPL", "auto"))
    else:
        if not (WORK / "weights.pkl").exists():
            # subprocess so the 60-epoch loop never rides the ambient axon
            # platform (CLAUDE.md: short-lived TPU clients wedge the tunnel)
            subprocess.run([sys.executable, __file__, "train"], env=cpu_env,
                           check=True)
        for impl in ("auto", "int8"):
            subprocess.run([sys.executable, __file__, "val"],
                           env=dict(cpu_env, QUAN_QCONV_IMPL=impl), check=True)


if __name__ == "__main__":
    main()
