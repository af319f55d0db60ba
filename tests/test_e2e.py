"""End-to-end smoke tests on synthetic tiny datasets (dota8-style).

Mirrors the reference test strategy (tests/test_python.py:test_train_scratch
/ test_workflow on coco8/dota8): train -> val -> predict on an 8-image
synthetic dataset. Small imgsz keeps single-core CI tolerable.
"""

import math
from pathlib import Path

import numpy as np
import pytest
import yaml


def make_synthetic_obb_dataset(root: Path, n_images: int = 8, imgsz: int = 96, nc: int = 3):
    """Images with bright rotated rectangles on dark background + matching
    8-coord OBB labels."""
    import cv2

    rng = np.random.default_rng(42)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n_images):
            im = np.full((imgsz, imgsz, 3), 30, np.uint8)
            lines = []
            for _ in range(rng.integers(1, 4)):
                cx, cy = rng.uniform(0.3, 0.7, 2) * imgsz
                w, h = rng.uniform(0.2, 0.4) * imgsz, rng.uniform(0.1, 0.25) * imgsz
                theta = rng.uniform(0, 180)
                cls = int(rng.integers(0, nc))
                color = [(255, 80, 80), (80, 255, 80), (80, 80, 255)][cls]
                box = cv2.boxPoints(((cx, cy), (w, h), theta))
                cv2.fillPoly(im, [box.astype(np.int32)], color)
                coords = (box / imgsz).reshape(-1)
                lines.append(" ".join([str(cls)] + [f"{v:.6f}" for v in coords]))
            cv2.imwrite(str(root / "images" / split / f"im{i}.jpg"), im)
            (root / "labels" / split / f"im{i}.txt").write_text("\n".join(lines) + "\n")
    cfg = {"path": str(root), "train": "images/train", "val": "images/val",
           "names": {i: f"c{i}" for i in range(nc)}}
    yml = root / "data.yaml"
    yml.write_text(yaml.dump(cfg))
    return yml


@pytest.fixture(scope="module")
def obb_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_obb")
    return make_synthetic_obb_dataset(root)


def test_dataset_and_loader(obb_data):
    from quan_ultralytics_tpu.data.dataset import YOLODataset
    from quan_ultralytics_tpu.data.build import build_dataloader
    from quan_ultralytics_tpu.data.augment import AugmentHyp

    ds = YOLODataset(obb_data, split="train", task="obb")
    assert len(ds) == 8 and ds.nc == 3
    batches = list(build_dataloader(ds, 4, imgsz=64, hyp=AugmentHyp(), max_labels=32, seed=0))
    assert len(batches) == 2
    b = batches[0]
    assert b["img"].shape == (4, 64, 64, 3)
    assert b["bboxes"].shape == (4, 32, 5)
    assert b["mask"].any(), "augmented batch lost all labels"
    # xywh normalized-ish, angle in radians
    valid = b["bboxes"][b["mask"]]
    assert (valid[:, 2] > 0).all() and (valid[:, 3] > 0).all()
    assert np.abs(valid[:, 4]).max() <= math.pi


def test_train_overfit_and_val(obb_data):
    """A few steps of training must reduce loss; val + predict must run."""
    import jax
    import jax.numpy as jnp

    from quan_ultralytics_tpu.data.build import build_dataloader
    from quan_ultralytics_tpu.data.dataset import YOLODataset
    from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
    from quan_ultralytics_tpu.models.tasks import DetectionModel

    ds = YOLODataset(obb_data, split="train", task="obb")
    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=ds.nc)
    cfg = TrainConfig(epochs=3, batch=4, imgsz=64, lr0=0.01, nbs=4, warmup_epochs=0.0)
    trainer = Trainer(model, cfg, steps_per_epoch=2)
    state = trainer.init_state()
    step_fn = trainer.make_train_step()

    losses = []
    for epoch in range(3):
        for b in build_dataloader(ds, 4, imgsz=64, hyp=None, augment=False,
                                  max_labels=32, seed=epoch):
            b = {k: jnp.asarray(v) for k, v in b.items()}
            state, loss, aux = step_fn(state, b)
            losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"

    # validator runs end to end
    from quan_ultralytics_tpu.engine.validator import Validator

    val = Validator(model, imgsz=64, conf=0.01)
    metrics = val(state.variables(ema=True), ds, batch_size=4)
    assert set(metrics) >= {"mAP50", "mAP50-95"}

    # predictor runs end to end
    from quan_ultralytics_tpu.engine.predictor import Predictor

    pred = Predictor(model, imgsz=64, conf=0.01)
    im = ds.load_image(0)
    results = pred(state.variables(ema=True), im)
    assert len(results) == 1
    assert results[0].boxes.shape[1] == 7  # xywhr + conf + cls


def test_classification_synthetic_smoke():
    """Tiny Q-WRN learns synthetic separable data above chance."""
    from quan_ultralytics_tpu.classification.data import make_synthetic, batches
    from quan_ultralytics_tpu.classification.train import ClsConfig, ClsTrainer

    tx, ty, vx, vy = make_synthetic(num_classes=4, n_train=256, n_test=64, size=32)
    cfg = ClsConfig(model="qwrn16_2", num_classes=4, batch_size=64, lr=0.05, epochs=3)
    trainer = ClsTrainer(cfg, steps_per_epoch=4)
    state = trainer.init_state(32)
    step = trainer.make_train_step()
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)
    for epoch in range(5):
        for b in batches(tx, ty, 64, train=True, seed=epoch):
            rng, sub = jax.random.split(rng)
            b = {k: jnp.asarray(v) for k, v in b.items()}
            state, loss, acc = step(state, b, sub)
    res = trainer.evaluate(state, batches(vx, vy, 64, train=False))
    assert np.isfinite(float(loss))
    assert float(acc) > 0.9, float(acc)  # the model must fit the train set
    assert res["top1"] > 0.3, res  # well above 0.25 chance on val
