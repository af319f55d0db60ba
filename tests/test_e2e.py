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


def make_synthetic_detect_dataset(root: Path, n_images: int = 8, imgsz: int = 96, nc: int = 3):
    """Axis-aligned analog of the OBB fixture: bright rectangles + YOLO
    ``cls cx cy w h`` labels (the coco8-style detect smoke set)."""
    import cv2

    rng = np.random.default_rng(7)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n_images):
            im = np.full((imgsz, imgsz, 3), 30, np.uint8)
            lines = []
            for _ in range(rng.integers(1, 4)):
                cx, cy = rng.uniform(0.3, 0.7, 2) * imgsz
                w, h = rng.uniform(0.2, 0.4) * imgsz, rng.uniform(0.15, 0.3) * imgsz
                cls = int(rng.integers(0, nc))
                color = [(255, 80, 80), (80, 255, 80), (80, 80, 255)][cls]
                x1, y1 = int(cx - w / 2), int(cy - h / 2)
                cv2.rectangle(im, (x1, y1), (int(cx + w / 2), int(cy + h / 2)), color, -1)
                lines.append(f"{cls} {cx / imgsz:.6f} {cy / imgsz:.6f} {w / imgsz:.6f} {h / imgsz:.6f}")
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


@pytest.fixture(scope="module")
def detect_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_detect")
    return make_synthetic_detect_dataset(root)


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


def test_detect_task_train_val_predict(detect_data):
    """Detect-task e2e mirroring the OBB one (reference
    tests/test_python.py:205 workflow on coco8): a few steps reduce loss,
    val + predict run, rect val batching works."""
    import jax.numpy as jnp

    from quan_ultralytics_tpu.data.build import build_dataloader
    from quan_ultralytics_tpu.data.dataset import YOLODataset
    from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
    from quan_ultralytics_tpu.models.tasks import DetectionModel

    ds = YOLODataset(detect_data, split="train", task="detect")
    assert ds.nc == 3 and len(ds) == 8
    model = DetectionModel.from_yaml("yolo11n-quan.yaml", nc=ds.nc)
    assert model.task == "detect"
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

    from quan_ultralytics_tpu.engine.validator import Validator

    val = Validator(model, imgsz=64, conf=0.01)
    metrics = val(state.variables(ema=True), ds, batch_size=4)
    assert set(metrics) >= {"mAP50", "mAP50-95"}

    from quan_ultralytics_tpu.engine.predictor import Predictor

    pred = Predictor(model, imgsz=64, conf=0.01)
    results = pred(state.variables(ema=True), ds.load_image(0))
    assert results[0].boxes.shape[1] == 6  # xyxy + conf + cls


def test_rect_dataloader(detect_data):
    """rect batching: non-square images letterbox to a minimal stride-32
    batch shape; labels normalize per-axis (reference data/base.py
    set_rectangle)."""
    import cv2

    from quan_ultralytics_tpu.data.build import build_dataloader
    from quan_ultralytics_tpu.data.dataset import YOLODataset

    # make a wide variant of the dataset on the fly
    ds = YOLODataset(detect_data, split="val", task="detect")
    # square images: the reference set_rectangle formula keeps a 0.5-stride
    # headroom -> ceil(64/32 + 0.5) * 32 = 96 (reference base.py pad=0.5)
    batches = list(build_dataloader(ds, 4, imgsz=64, hyp=None, augment=False,
                                    shuffle=False, drop_last=False, rect=True))
    assert batches[0]["img"].shape[1:] == (96, 96, 3)

    # wide images: H shrinks to the stride grid
    wide_root = Path(detect_data).parent / "wide"
    (wide_root / "images" / "val").mkdir(parents=True)
    (wide_root / "labels" / "val").mkdir(parents=True)
    for i in range(4):
        im = np.full((50, 200, 3), 40, np.uint8)
        cv2.rectangle(im, (80, 10), (120, 40), (255, 0, 0), -1)
        cv2.imwrite(str(wide_root / "images" / "val" / f"w{i}.jpg"), im)
        (wide_root / "labels" / "val" / f"w{i}.txt").write_text("0 0.5 0.5 0.2 0.6\n")
    cfg = {"path": str(wide_root), "train": "images/val", "val": "images/val",
           "names": {0: "c0"}}
    yml = wide_root / "data.yaml"
    yml.write_text(yaml.dump(cfg))
    wds = YOLODataset(yml, split="val", task="detect")
    wb = list(build_dataloader(wds, 4, imgsz=128, hyp=None, augment=False,
                               shuffle=False, drop_last=False, rect=True))
    # ar = 50/200 = 0.25: H = ceil(0.25*128/32+0.5)*32 = 64, W = 160
    H, W = wb[0]["img"].shape[1:3]
    assert (H, W) == (64, 160), (H, W)
    # labels renormalized per-axis: w_norm ~ 0.2 of W, h_norm ~ 0.6 of H-ish
    valid = wb[0]["bboxes"][wb[0]["mask"]]
    assert valid.shape[0] == 4
    assert (valid <= 1.0 + 1e-6).all() and (valid >= 0).all()


def test_dataset_cache_ram_and_disk(detect_data):
    from quan_ultralytics_tpu.data.dataset import YOLODataset

    ds_ram = YOLODataset(detect_data, split="val", task="detect", cache="ram")
    im0 = ds_ram.load_image(0)
    assert ds_ram._ram[0] is not None
    im0b = ds_ram.load_image(0)
    assert im0b is ds_ram._ram[0]
    np.testing.assert_array_equal(im0, im0b)

    ds_disk = YOLODataset(detect_data, split="val", task="detect", cache="disk")
    a = ds_disk.load_image(1)
    p = ds_disk._npy_path(1)
    assert p.exists()
    b = ds_disk.load_image(1)
    np.testing.assert_array_equal(a, b)
    # shapes() reads headers without decoding
    shp = ds_disk.shapes()
    assert shp.shape == (8, 2) and (shp == 96).all()


def test_dota_merged_patch_eval(tmp_path):
    """End-to-end DOTA merged evaluation (reference obb/val.py pred_to_json /
    eval_json): split a synthetic big image into overlapping patches, train a
    couple of steps, validate with save_submission, and check the Task1 files
    contain merged detections in SOURCE-image coordinates with patch stems
    collapsed back to the big image id."""
    import cv2
    import jax.numpy as jnp

    from quan_ultralytics_tpu.data.dataset import YOLODataset
    from quan_ultralytics_tpu.data.split_dota import split_image, split_test
    from quan_ultralytics_tpu.engine.dota_eval import DOTASubmission

    # big 256x256 image, two planted rotated boxes
    big = np.full((256, 256, 3), 25, np.uint8)
    planted = [(70.0, 70.0, 60.0, 30.0, 20.0), (190.0, 190.0, 50.0, 25.0, 100.0)]
    lines = []
    for cx, cy, w, h, deg in planted:
        box = cv2.boxPoints(((cx, cy), (w, h), deg))
        cv2.fillPoly(big, [box.astype(np.int32)], (255, 90, 90))
        lines.append(" ".join(["0"] + [f"{v / 256:.6f}" for v in box.reshape(-1)]))
    src = tmp_path / "src"
    (src / "images" / "train").mkdir(parents=True)
    (src / "labels" / "train").mkdir(parents=True)
    cv2.imwrite(str(src / "images" / "train" / "P0001.jpg"), big)
    (src / "labels" / "train" / "P0001.txt").write_text("\n".join(lines) + "\n")

    out = tmp_path / "split"
    n = split_image(src / "images" / "train" / "P0001.jpg",
                    src / "labels" / "train" / "P0001.txt",
                    out / "images" / "train", out / "labels" / "train",
                    crop_size=160, gap=64)
    assert n >= 4  # 2x2 overlapping windows
    # patch stems carry window origins
    stems = sorted(p.stem for p in (out / "images" / "train").glob("*.jpg"))
    assert all("__" in s for s in stems)

    # --- submission merge path with KNOWN predictions: feed each patch its
    # own GT as "predictions" and check the merged Task1 output recovers the
    # planted boxes once each (cross-patch NMS collapses duplicates).
    import yaml as _yaml

    cfg = {"path": str(out), "train": "images/train", "val": "images/train",
           "names": {0: "plane"}}
    yml = out / "data.yaml"
    yml.write_text(_yaml.dump(cfg))
    ds = YOLODataset(yml, split="train", task="obb")
    sub = DOTASubmission(ds.names)
    from quan_ultralytics_tpu.data.dataset import xyxyxyxy2xywhr_np

    for i, s in enumerate(ds.samples):
        stem = Path(s.im_file).stem
        if len(s.bboxes) == 0:
            continue
        im = ds.load_image(i)
        ph, pw = im.shape[:2]
        corners_px = s.bboxes.reshape(-1, 4, 2) * [pw, ph]
        xywhr = xyxyxyxy2xywhr_np(corners_px.reshape(-1, 8))
        sub.add_patch(stem, xywhr, np.full(len(xywhr), 0.9, np.float32),
                      np.zeros(len(xywhr), np.float32))
    merged = sub.merge(iou_thr=0.3)
    assert set(merged) == {"P0001"}
    rows = merged["P0001"]
    assert len(rows) == len(planted), f"expected {len(planted)} merged boxes, got {len(rows)}"
    got_centers = sorted((float(r[0]), float(r[1])) for r in rows)
    want_centers = sorted((c[0], c[1]) for c in planted)
    for (gx, gy), (wx, wy) in zip(got_centers, want_centers):
        assert abs(gx - wx) < 6 and abs(gy - wy) < 6, (got_centers, want_centers)
    files = sub.write(str(tmp_path / "task1"))
    task1 = Path(tmp_path / "task1" / "Task1_plane.txt").read_text().strip().splitlines()
    assert len(task1) == len(planted)
    assert all(line.startswith("P0001 ") for line in task1)

    # split_test: label-less crops for submission inference
    (src / "images" / "test").mkdir(parents=True)
    cv2.imwrite(str(src / "images" / "test" / "P0002.jpg"), big)
    n_test = split_test(str(src), str(tmp_path / "split_test"), crop_size=160, gap=64)
    assert n_test >= 4
    assert not (tmp_path / "split_test" / "labels").exists()


def test_validator_save_submission_end_to_end(tmp_path, obb_data):
    """The Validator itself produces Task1 files through save_submission
    (model predictions, untrained weights — only plumbing is asserted)."""
    import jax

    from quan_ultralytics_tpu.data.dataset import YOLODataset
    from quan_ultralytics_tpu.engine.validator import Validator
    from quan_ultralytics_tpu.models.tasks import DetectionModel

    ds = YOLODataset(obb_data, split="val", task="obb")
    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=ds.nc)
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)
    val = Validator(model, imgsz=64, conf=0.01)
    out = tmp_path / "sub"
    metrics = val(variables, ds, batch_size=4, save_submission=str(out),
                  save_json=str(tmp_path / "dets.json"))
    assert set(metrics) >= {"mAP50", "mAP50-95"}
    files = sorted(out.glob("Task1_*.txt"))
    assert len(files) == ds.nc  # one file per class, even if empty
    assert (tmp_path / "dets.json").exists()


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
