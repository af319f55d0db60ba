"""YOLO-format dataset reader (detect + OBB).

Host-side analog of reference ultralytics/data/dataset.py (YOLODataset :45)
minus torch: reads the standard layout

    root/images/{split}/*.jpg
    root/labels/{split}/*.txt

Detect labels: ``cls cx cy w h`` (normalized). OBB labels: ``cls x1 y1 x2 y2
x3 y3 x4 y4`` (normalized corners, DOTA-YOLO format produced by
convert_dota_to_yolo_obb, reference data/converter.py:421-516) converted to
xywhr via the minimal-rotation corner fit (reference ops.py:549
xyxyxyxy2xywhr).

Dataset YAMLs match the reference schema: ``path``, ``train``, ``val``,
``names``.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np
import yaml

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff"}


def xyxyxyxy2xywhr_np(corners: np.ndarray) -> np.ndarray:
    """[N, 8] corner boxes -> [N, 5] xywhr with r in (-pi/2, pi/2] via
    cv2.minAreaRect semantics (reference ops.py:549-570)."""
    out = np.zeros((corners.shape[0], 5), np.float32)
    for i, c in enumerate(corners.reshape(-1, 4, 2)):
        (cx, cy), (w, h), angle = cv2.minAreaRect(c.astype(np.float32))
        # reference converts to radians and keeps [0, 90) degrees from cv2
        out[i] = [cx, cy, w, h, angle / 180 * math.pi]
    return out


@dataclass
class Sample:
    im_file: str
    cls: np.ndarray      # [n]
    bboxes: np.ndarray   # detect: [n, 4] xywh normalized; obb: [n, 8] corner
                         # points normalized (converted to pixel-space xywhr
                         # only at Format time, like reference Format
                         # return_obb, so the angle is computed in pixels)
    shape: Optional[Tuple[int, int]] = None  # (h, w) original


class YOLODataset:
    def __init__(self, data_cfg: str | Dict, split: str = "train", task: str = "detect"):
        if isinstance(data_cfg, (str, Path)):
            with open(data_cfg) as fh:
                cfg = yaml.safe_load(fh)
            cfg_dir = Path(data_cfg).resolve().parent
        else:
            cfg, cfg_dir = data_cfg, Path(".")
        self.task = task
        root = Path(cfg.get("path", "."))
        if not root.is_absolute():
            root = (cfg_dir / root).resolve()
        split_rel = cfg.get(split, f"images/{split}")
        self.img_dir = root / split_rel if not Path(split_rel).is_absolute() else Path(split_rel)
        names = cfg.get("names", {})
        if isinstance(names, dict):
            self.names = [names[k] for k in sorted(names, key=int)]
        else:
            self.names = list(names)
        self.nc = len(self.names)
        self.samples = self._load_labels()

    def _label_path(self, im_file: Path) -> Path:
        parts = list(im_file.parts)
        parts[-3] = "labels" if parts[-3] == "images" else parts[-3]
        return Path(*parts).with_suffix(".txt")

    def _load_labels(self) -> List[Sample]:
        files = sorted(p for p in self.img_dir.rglob("*") if p.suffix.lower() in IMG_EXTS)
        samples = []
        for f in files:
            lp = self._label_path(f)
            rows = []
            if lp.exists():
                with open(lp) as fh:
                    for line in fh:
                        v = line.split()
                        if v:
                            rows.append([float(x) for x in v])
            if rows:
                arr = np.array(rows, np.float32)
                cls = arr[:, 0].astype(np.int32)
                if self.task == "obb":
                    assert arr.shape[1] == 9, f"OBB labels need 8 coords, got {arr.shape[1] - 1}"
                    boxes = arr[:, 1:9]
                else:
                    boxes = arr[:, 1:5]
            else:
                cls = np.zeros(0, np.int32)
                boxes = np.zeros((0, 8 if self.task == "obb" else 4), np.float32)
            samples.append(Sample(str(f), cls, boxes))
        return samples

    def __len__(self):
        return len(self.samples)

    def load_image(self, i: int) -> np.ndarray:
        im = cv2.imread(self.samples[i].im_file)
        if im is None:
            raise FileNotFoundError(self.samples[i].im_file)
        return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
