"""Plotting: annotate detections, plot train batches, training curves.

Host-side cv2/matplotlib analog of reference utils/plotting.py (Annotator,
plot_images with rotated-target support, plot_results)."""

from __future__ import annotations

import math
from pathlib import Path
from typing import List, Optional, Sequence

import cv2
import numpy as np

PALETTE = [
    (255, 56, 56), (255, 157, 151), (255, 112, 31), (255, 178, 29),
    (207, 210, 49), (72, 249, 10), (26, 204, 56), (0, 212, 187),
    (44, 153, 168), (0, 194, 255), (52, 69, 147), (100, 115, 255),
    (0, 24, 236), (132, 56, 255), (82, 0, 133), (203, 56, 255),
]


def _color(i: int):
    return PALETTE[int(i) % len(PALETTE)]


class Annotator:
    """Draw boxes / rotated boxes / labels on an image (reference Annotator)."""

    def __init__(self, im: np.ndarray, names: Optional[Sequence[str]] = None, lw: Optional[int] = None):
        self.im = np.ascontiguousarray(im)
        self.names = names
        self.lw = lw or max(round(sum(im.shape[:2]) / 2 * 0.003), 2)

    def box_label(self, xyxy, label: str = "", cls: int = 0):
        c = _color(cls)
        p1, p2 = (int(xyxy[0]), int(xyxy[1])), (int(xyxy[2]), int(xyxy[3]))
        cv2.rectangle(self.im, p1, p2, c, self.lw, cv2.LINE_AA)
        if label:
            self._text(p1, label, c)

    def obb_label(self, xywhr, label: str = "", cls: int = 0):
        c = _color(cls)
        cx, cy, w, h, t = xywhr[:5]
        pts = cv2.boxPoints(((float(cx), float(cy)), (float(w), float(h)), float(t) * 180 / math.pi))
        cv2.polylines(self.im, [pts.astype(np.int32)], True, c, self.lw, cv2.LINE_AA)
        if label:
            self._text((int(pts[0][0]), int(pts[0][1])), label, c)

    def _text(self, org, label, color):
        tf = max(self.lw - 1, 1)
        wh, _ = cv2.getTextSize(label, 0, self.lw / 3, tf)
        x, y = org
        cv2.rectangle(self.im, (x, y - wh[1] - 3), (x + wh[0], y), color, -1, cv2.LINE_AA)
        cv2.putText(self.im, label, (x, y - 2), 0, self.lw / 3, (255, 255, 255), tf, cv2.LINE_AA)

    def result(self):
        return self.im


def plot_results(results, path: str = "results_annotated.jpg", source_im: Optional[np.ndarray] = None):
    """Annotate one `Results` (engine/predictor.py) onto its source image."""
    im = source_im.copy()
    ann = Annotator(im, results.names)
    for row in results.boxes:
        cls = int(row[-1])
        name = results.names[cls] if results.names else str(cls)
        label = f"{name} {row[-2]:.2f}"
        if results.task == "obb":
            ann.obb_label(row[:5], label, cls)
        else:
            ann.box_label(row[:4], label, cls)
    out = ann.result()
    cv2.imwrite(path, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
    return out


def feature_visualization(feat, path="features.png", n: int = 32):
    """Save a grid of per-channel feature maps as one grayscale PNG
    (reference utils/plotting.py:1346 feature_visualization).

    feat: ``[H, W, 4, C]`` or ``[B, H, W, 4, C]`` (first image used); the
    quaternion-component axis is flattened into channels. Each of the first
    ``n`` channel maps is min-max normalized independently."""
    feat = np.asarray(feat, np.float32)
    if feat.ndim == 5:
        feat = feat[0]
    feat = feat.reshape(feat.shape[0], feat.shape[1], -1)
    n = min(n, feat.shape[-1])
    if n == 0:
        return None
    cols = math.ceil(math.sqrt(n))
    rows = math.ceil(n / cols)
    cell = 96
    canvas = np.zeros((rows * cell, cols * cell), np.uint8)
    for i in range(n):
        ch = feat[..., i]
        lo, hi = float(ch.min()), float(ch.max())
        img = ((ch - lo) / (hi - lo + 1e-9) * 255.0).astype(np.uint8)
        img = cv2.resize(img, (cell, cell), interpolation=cv2.INTER_NEAREST)
        r, c = divmod(i, cols)
        canvas[r * cell:(r + 1) * cell, c * cell:(c + 1) * cell] = img
    cv2.imwrite(str(path), canvas)
    return str(path)


def plot_images(batch, path: str = "train_batch.jpg", max_ims: int = 16, names=None):
    """Mosaic plot of a train batch with its (rotated) targets
    (reference plot_images / output_to_rotated_target)."""
    imgs = batch["img"][:max_ims]
    n = len(imgs)
    cols = math.ceil(math.sqrt(n))
    rows = math.ceil(n / cols)
    s = imgs.shape[1]
    canvas = np.full((rows * s, cols * s, 3), 255, np.uint8)
    for i, im in enumerate(imgs):
        r, c = divmod(i, cols)
        im = np.asarray(im)
        # loader batches are uint8 0..255; float inputs are [0, 1]
        tile = im.copy() if im.dtype == np.uint8 else (im * 255).astype(np.uint8)
        ann = Annotator(tile, names)
        mask = batch["mask"][i]
        for b, k in zip(batch["bboxes"][i][mask], batch["cls"][i][mask]):
            if b.shape[-1] == 5:
                ann.obb_label(np.array([b[0] * s, b[1] * s, b[2] * s, b[3] * s, b[4]]), cls=int(k))
            else:
                xy = np.array([(b[0] - b[2] / 2) * s, (b[1] - b[3] / 2) * s,
                               (b[0] + b[2] / 2) * s, (b[1] + b[3] / 2) * s])
                ann.box_label(xy, cls=int(k))
        canvas[r * s : (r + 1) * s, c * s : (c + 1) * s] = ann.result()
    cv2.imwrite(path, cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
    return canvas


def plot_curves(history: List[dict], path: str = "results.png"):
    """Loss/metric curves per epoch (reference plot_results / classification
    experiment_manager curves)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    if not history:
        return None
    keys = [k for k in history[0] if k not in ("epoch",) and isinstance(history[0][k], (int, float))]
    ncols = min(len(keys), 4)
    nrows = math.ceil(len(keys) / ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False)
    xs = [h["epoch"] for h in history]
    for i, k in enumerate(keys):
        ax = axes[i // ncols][i % ncols]
        ax.plot(xs, [h.get(k) for h in history])
        ax.set_title(k)
        ax.set_xlabel("epoch")
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path
