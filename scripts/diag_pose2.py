"""Diagnose pose-train descent with the EXACT test_segpose dataset/loader
setup, more steps, component logging."""
import os
import sys
import tempfile
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_test_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import cv2
import numpy as np
import jax.numpy as jnp
import yaml

from quan_ultralytics_tpu.data.build import build_dataloader
from quan_ultralytics_tpu.data.dataset import YOLODataset
from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
from quan_ultralytics_tpu.models.tasks import DetectionModel

root = Path(tempfile.mkdtemp()) / "poseds"
imgsz = 96
base = np.linspace(0.3, 0.7, 17)
kp_pat = np.stack([base, 0.3 + 0.4 * (base - 0.3) / 0.4 * (base - 0.3) / 0.4], 1)
for split in ("train",):
    (root / "images" / split).mkdir(parents=True)
    (root / "labels" / split).mkdir(parents=True)
    for i in range(8):
        im = np.full((imgsz, imgsz, 3), 25, np.uint8)
        cv2.rectangle(im, (24, 24), (72, 72), (200, 100, 50), -1)
        for kx, ky in kp_pat:
            cv2.circle(im, (int(kx * imgsz), int(ky * imgsz)), 2, (60, 220, 60), -1)
        vals = [0, 0.5, 0.5, 0.5, 0.5] + [f for xy in kp_pat for f in (xy[0], xy[1], 2.0)]
        cv2.imwrite(str(root / "images" / split / f"im{i}.jpg"), im)
        (root / "labels" / split / f"im{i}.txt").write_text(
            " ".join(str(v) for v in vals) + "\n")
yml = root / "data.yaml"
yml.write_text(yaml.dump({"path": str(root), "train": "images/train",
                          "val": "images/train", "names": {0: "person"}}))

ds = YOLODataset(yml, split="train", task="pose")
m = DetectionModel.from_yaml("yolo11n-pose-quan.yaml", nc=1)
cfg = TrainConfig(epochs=2, batch=4, imgsz=64, nbs=4, warmup_epochs=0.0, lr0=0.01)
trainer = Trainer(m, cfg, steps_per_epoch=2)
state = trainer.init_state()
step = trainer.make_train_step()
k = 0
for epoch in range(15):
    for b in build_dataloader(ds, 4, imgsz=64, hyp=None, augment=False,
                              max_labels=4, seed=epoch):
        b = {k2: jnp.asarray(v) for k2, v in b.items()}
        state, loss, aux = step(state, b)
        comps = {kk: round(float(v), 3) for kk, v in aux.items()}
        print(f"step {k}: loss={float(loss):.3f} {comps}", flush=True)
        k += 1
