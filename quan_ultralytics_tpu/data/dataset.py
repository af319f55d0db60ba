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


SEG_POINTS = 32  # polygons are resampled to this fixed vertex count
                 # (reference resample_segments, ops.py:329; fixed-shape here)


def resample_polygon(pts: np.ndarray, n: int = SEG_POINTS) -> np.ndarray:
    """Uniformly resample a closed polygon [k, 2] to exactly n vertices by
    arc length (reference ops.py:329 resample_segments)."""
    closed = np.concatenate([pts, pts[:1]], axis=0)
    seg = np.linalg.norm(np.diff(closed, axis=0), axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = max(cum[-1], 1e-9)
    t = np.linspace(0.0, total, n, endpoint=False)
    x = np.interp(t, cum, closed[:, 0])
    y = np.interp(t, cum, closed[:, 1])
    return np.stack([x, y], axis=1).astype(np.float32)


@dataclass
class Sample:
    im_file: str
    cls: np.ndarray      # [n]
    bboxes: np.ndarray   # detect/pose: [n, 4] xywh normalized; obb: [n, 8]
                         # corner points normalized (converted to pixel-space
                         # xywhr only at Format time, like reference Format
                         # return_obb, so the angle is computed in pixels);
                         # segment: [n, 2*SEG_POINTS] resampled polygon
                         # points normalized
    shape: Optional[Tuple[int, int]] = None  # (h, w) original
    kpts: Optional[np.ndarray] = None        # pose: [n, nk, 3] normalized + vis


class YOLODataset:
    """cache: None | 'ram' | 'disk' — the reference's BaseDataset image cache
    (data/base.py:181-244 cache_images / cache_images_to_disk). 'ram' keeps
    decoded RGB arrays (bounded by a psutil availability check like the
    reference's check_cache_ram); 'disk' writes .npy sidecars into a
    ``.npy_cache`` directory next to the images and loads those on later
    epochs (decode once, then raw IO)."""

    def __init__(self, data_cfg: str | Dict, split: str = "train", task: str = "detect",
                 cache: Optional[str] = None):
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
        assert cache in (None, "ram", "disk"), f"cache must be None|'ram'|'disk', got {cache}"
        self.cache = cache
        self._ram: List[Optional[np.ndarray]] = [None] * len(self.samples)
        if cache == "ram" and not self._check_cache_ram():
            self.cache = None

    def _check_cache_ram(self, safety_margin: float = 0.5) -> bool:
        """Require the estimated decoded size to fit in available RAM with
        margin (reference data/base.py:214-235 check_cache_ram)."""
        if not self.samples:
            return True
        try:
            import psutil

            n_probe = min(8, len(self.samples))
            per = np.mean([
                np.prod(self._read_shape(i)) * 3 for i in range(n_probe)
            ])
            need = per * len(self.samples)
            return need < psutil.virtual_memory().available * safety_margin
        except Exception:
            return True

    def _read_shape(self, i: int) -> Tuple[int, int]:
        """(h, w) without a full decode (PIL header read)."""
        s = self.samples[i]
        if s.shape is None:
            from PIL import Image

            with Image.open(s.im_file) as im:
                s.shape = (im.height, im.width)
        return s.shape

    def shapes(self) -> np.ndarray:
        """[N, 2] (h, w) of every image — used by rect batching."""
        return np.array([self._read_shape(i) for i in range(len(self))], np.int64)

    def _label_path(self, im_file: Path) -> Path:
        parts = list(im_file.parts)
        parts[-3] = "labels" if parts[-3] == "images" else parts[-3]
        return Path(*parts).with_suffix(".txt")

    def _parse_rows(self, rows: List[List[float]]) -> tuple:
        """rows -> (cls, boxes, kpts) per task. YOLO label formats:
        detect: cls cx cy w h; obb: cls + 8 corner coords
        (convert_dota_to_yolo_obb); segment: cls + polygon x1 y1 x2 y2 ...
        (variable length, reference data/utils.py verify_image_label);
        pose: cls cx cy w h + nk*(2|3) keypoint values."""
        cls = np.array([r[0] for r in rows], np.int32)
        kpts = None
        if self.task == "obb":
            arr = np.array(rows, np.float32)
            assert arr.shape[1] == 9, f"OBB labels need 8 coords, got {arr.shape[1] - 1}"
            boxes = arr[:, 1:9]
        elif self.task == "segment":
            polys = [resample_polygon(np.array(r[1:], np.float32).reshape(-1, 2))
                     for r in rows]
            boxes = np.stack(polys).reshape(len(rows), -1) if polys else \
                np.zeros((0, 2 * SEG_POINTS), np.float32)
        elif self.task == "pose":
            arr = np.array(rows, np.float32)
            boxes = arr[:, 1:5]
            k = arr[:, 5:]
            ndim = 3 if k.shape[1] % 3 == 0 else 2
            k = k.reshape(len(rows), -1, ndim)
            if ndim == 2:  # visibility implicit: labeled == visible
                k = np.concatenate([k, np.ones((*k.shape[:2], 1), np.float32)], axis=-1)
            kpts = k
        else:
            arr = np.array(rows, np.float32)
            boxes = arr[:, 1:5]
        return cls, boxes, kpts

    def _load_labels(self) -> List[Sample]:
        files = sorted(p for p in self.img_dir.rglob("*") if p.suffix.lower() in IMG_EXTS)
        samples = []
        empty_dim = {"obb": 8, "segment": 2 * SEG_POINTS}.get(self.task, 4)
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
                cls, boxes, kpts = self._parse_rows(rows)
            else:
                cls = np.zeros(0, np.int32)
                boxes = np.zeros((0, empty_dim), np.float32)
                kpts = np.zeros((0, 17, 3), np.float32) if self.task == "pose" else None
            samples.append(Sample(str(f), cls, boxes, kpts=kpts))
        return samples

    def __len__(self):
        return len(self.samples)

    def _npy_path(self, i: int) -> Path:
        f = Path(self.samples[i].im_file)
        return f.parent / ".npy_cache" / (f.stem + ".npy")

    def load_image(self, i: int) -> np.ndarray:
        """Decoded RGB uint8 image, via the RAM/disk cache when enabled.
        Callers must not mutate the returned array in place (the augment
        pipeline letterboxes/copies before any in-place op)."""
        if self.cache == "ram" and self._ram[i] is not None:
            return self._ram[i]
        if self.cache == "disk":
            p = self._npy_path(i)
            if p.exists():
                return np.load(p)
        im = cv2.imread(self.samples[i].im_file)
        if im is None:
            raise FileNotFoundError(self.samples[i].im_file)
        im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
        self.samples[i].shape = im.shape[:2]
        if self.cache == "ram":
            self._ram[i] = im
        elif self.cache == "disk":
            p = self._npy_path(i)
            p.parent.mkdir(exist_ok=True)
            np.save(p, im)
        return im
