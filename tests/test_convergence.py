"""Slow whole-stack convergence test (opt-in via --slow).

60-epoch overfit of QUAN-YOLO11n-OBB on an 8-image synthetic rotated-box
dataset. Validates the full chain — augment-free loader, quaternion graph,
TaskAligned assigner, OBB loss (probiou + DFL + quaternion angular), rotated
decode, fast-NMS, and mAP — converging together. Reference run (single-core
CPU, ~25 min): epoch 59 -> mAP50 0.995, mAP50-95 0.83, P 1.0, R 1.0.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_e2e import make_synthetic_obb_dataset


@pytest.mark.slow
def test_obb_overfit_reaches_high_map(tmp_path):
    from quan_ultralytics_tpu.data.build import build_dataloader
    from quan_ultralytics_tpu.data.dataset import YOLODataset
    from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
    from quan_ultralytics_tpu.engine.validator import Validator
    from quan_ultralytics_tpu.models.tasks import DetectionModel

    yml = make_synthetic_obb_dataset(tmp_path / "ds", n_images=8, imgsz=96, nc=3)
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
    val = Validator(model, imgsz=96, conf=0.01)
    m = val(state.variables(ema=False), ds, batch_size=8)
    assert m["mAP50"] > 0.8, m
    assert m["recall"] > 0.8, m
