"""Host-side augmentations (NumPy/OpenCV) for the YOLO train pipeline.

Re-implements the reference v8_transforms chain
(ultralytics/data/augment.py:2278-2345): Mosaic -> RandomPerspective ->
RandomHSV -> RandomFlip -> Format. Runs on CPU in loader workers; the TPU
only ever sees fixed-shape float batches.

Geometry operates on *points*: detect boxes become their 4 corners, OBB
labels already are corner polygons — so one affine path covers both tasks
(the reference transforms `Instances` with segments for OBB the same way,
augment.py:952-1303).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import cv2
import numpy as np


@dataclass
class AugmentHyp:
    """Augmentation gains (reference cfg/default.yaml)."""

    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    perspective: float = 0.0
    flipud: float = 0.0
    fliplr: float = 0.5
    mosaic: float = 1.0
    mixup: float = 0.0
    copy_paste: float = 0.0


def letterbox(im: np.ndarray, new_shape, scaleup: bool = True,
              center: bool = True) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Resize + pad keeping aspect (reference augment.py LetterBox).

    new_shape: int (square) or (H, W) — rect batching passes non-square
    targets (reference data/base.py set_rectangle).
    Returns (image, gain, (pad_w, pad_h))."""
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    H, W = new_shape
    h, w = im.shape[:2]
    r = min(H / h, W / w)
    if not scaleup:
        r = min(r, 1.0)
    nh, nw = round(h * r), round(w * r)
    if (nh, nw) != (h, w):
        im = cv2.resize(im, (nw, nh), interpolation=cv2.INTER_LINEAR)
    dh, dw = H - nh, W - nw
    if center:
        top, left = dh // 2, dw // 2
    else:
        top, left = 0, 0
    out = np.full((H, W, 3), 114, im.dtype)
    out[top : top + nh, left : left + nw] = im
    return out, r, (left, top)


def random_hsv(im: np.ndarray, hyp: AugmentHyp, rng: np.random.Generator) -> np.ndarray:
    """HSV jitter (reference augment.py:1303 RandomHSV)."""
    if hyp.hsv_h == hyp.hsv_s == hyp.hsv_v == 0:
        return im
    r = rng.uniform(-1, 1, 3) * [hyp.hsv_h, hyp.hsv_s, hyp.hsv_v] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(im, cv2.COLOR_RGB2HSV))
    x = np.arange(256)
    lut_h = ((x * r[0]) % 180).astype(im.dtype)
    lut_s = np.clip(x * r[1], 0, 255).astype(im.dtype)
    lut_v = np.clip(x * r[2], 0, 255).astype(im.dtype)
    im_hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v)))
    return cv2.cvtColor(im_hsv, cv2.COLOR_HSV2RGB)


def _affine_matrix(imgsz: int, hyp: AugmentHyp, rng: np.random.Generator,
                   border: Tuple[int, int]) -> Tuple[np.ndarray, float]:
    """Compose the perspective/rotation/shear/translate matrix
    (reference augment.py:1040-1090 RandomPerspective.affine_transform)."""
    C = np.eye(3)
    C[0, 2] = -imgsz / 2
    C[1, 2] = -imgsz / 2
    P = np.eye(3)
    P[2, 0] = rng.uniform(-hyp.perspective, hyp.perspective)
    P[2, 1] = rng.uniform(-hyp.perspective, hyp.perspective)
    R = np.eye(3)
    a = rng.uniform(-hyp.degrees, hyp.degrees)
    s = rng.uniform(1 - hyp.scale, 1 + hyp.scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-hyp.shear, hyp.shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-hyp.shear, hyp.shear) * math.pi / 180)
    T = np.eye(3)
    out_w = imgsz + border[1] * 2
    out_h = imgsz + border[0] * 2
    T[0, 2] = rng.uniform(0.5 - hyp.translate, 0.5 + hyp.translate) * out_w
    T[1, 2] = rng.uniform(0.5 - hyp.translate, 0.5 + hyp.translate) * out_h
    M = T @ S @ R @ P @ C
    return M, s


def random_perspective(im: np.ndarray, corners: np.ndarray, cls: np.ndarray,
                       hyp: AugmentHyp, rng: np.random.Generator,
                       border: Tuple[int, int] = (0, 0), out_size: Optional[int] = None):
    """Affine/perspective warp of image + corner-point labels.

    corners: [n, 4, 2] pixel-space. Returns (im, corners, cls) with
    candidates filtered like the reference box_candidates
    (augment.py:1214-1230)."""
    imgsz = im.shape[0]
    out_w = out_size or (imgsz + border[1] * 2)
    out_h = out_size or (imgsz + border[0] * 2)
    M, s = _affine_matrix(imgsz, hyp, rng, border)
    if hyp.perspective:
        im = cv2.warpPerspective(im, M, dsize=(out_w, out_h), borderValue=(114, 114, 114))
    else:
        im = cv2.warpAffine(im, M[:2], dsize=(out_w, out_h), borderValue=(114, 114, 114))
    n = corners.shape[0]
    if n:
        P = corners.shape[1]  # 4 box corners, or P polygon/keypoint points
        pts = np.concatenate([corners.reshape(-1, 2), np.ones((n * P, 1))], axis=1)  # [Pn, 3]
        pts = pts @ M.T
        if hyp.perspective:
            pts = pts[:, :2] / pts[:, 2:3]
        else:
            pts = pts[:, :2]
        new_corners = pts.reshape(n, P, 2)
        # candidate filter on the axis-aligned hulls (wh>2px, area ratio, ar<100)
        def hull_wh(cs):
            mn, mx = cs.min(axis=1), cs.max(axis=1)
            return (mx - mn)[:, 0], (mx - mn)[:, 1]
        w1, h1 = hull_wh(corners)
        w2, h2 = hull_wh(new_corners)
        eps = 1e-9
        ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
        keep = (w2 > 2) & (h2 > 2) & (w2 * h2 / (w1 * h1 * s * s + eps) > 0.1) & (ar < 100)
        # keep boxes whose center stays inside
        cx = new_corners.mean(axis=1)
        keep &= (cx[:, 0] >= 0) & (cx[:, 0] < out_w) & (cx[:, 1] >= 0) & (cx[:, 1] < out_h)
        corners, cls = new_corners[keep], cls[keep]
    return im, corners, cls


def flip_corners(im: np.ndarray, corners: np.ndarray, hyp: AugmentHyp, rng: np.random.Generator):
    h, w = im.shape[:2]
    if rng.random() < hyp.flipud:
        im = np.flipud(im)
        if corners.size:
            corners = corners.copy()
            corners[..., 1] = h - corners[..., 1]
    if rng.random() < hyp.fliplr:
        im = np.fliplr(im)
        if corners.size:
            corners = corners.copy()
            corners[..., 0] = w - corners[..., 0]
    return np.ascontiguousarray(im), corners


def mixup(im1, c1, cls1, im2, c2, cls2, rng: np.random.Generator):
    """MixUp (reference augment.py:867): beta(32, 32) image blend, label
    union."""
    r = rng.beta(32.0, 32.0)
    im = (im1.astype(np.float32) * r + im2.astype(np.float32) * (1 - r)).astype(im1.dtype)
    corners = np.concatenate([c1, c2]) if (c1.size or c2.size) else c1
    cls = np.concatenate([cls1, cls2])
    return im, corners, cls


def bbox_ioa(box1: np.ndarray, box2: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Intersection over box2's area, [N, M] (reference utils/metrics.py
    bbox_ioa). Boxes are xyxy pixel coords."""
    ix1 = np.maximum(box1[:, None, 0], box2[None, :, 0])
    iy1 = np.maximum(box1[:, None, 1], box2[None, :, 1])
    ix2 = np.minimum(box1[:, None, 2], box2[None, :, 2])
    iy2 = np.minimum(box1[:, None, 3], box2[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    return inter / (area2[None] + eps)


def _hulls(corners: np.ndarray) -> np.ndarray:
    """Unclipped axis-aligned hull xyxy [n, 4] of point sets [n, P, 2]."""
    mn, mx = corners.min(axis=1), corners.max(axis=1)
    return np.concatenate([mn, mx], axis=1)


def copy_paste(im, corners, cls, rng: np.random.Generator, p: float = 0.5):
    """Segment-polygon CopyPaste, reference 'flip' mode
    (augment.py:1634-1733): candidate instances are the horizontally flipped
    ones whose hull-box IoA with EVERY existing instance is < 0.30 (no
    occlusion of real objects); the ``round(p * n)`` least-occluding of them
    are pasted by copying the flipped image's pixels inside their polygons
    (cv2.drawContours mask) and their flipped labels are appended.

    ``corners`` [n, P, 2] serve as the polygons: OBB corner quads, segment
    polygon points, or detect box corners (degenerate rectangle polygon —
    the reference's IoA/paste math is identical there).
    """
    n = corners.shape[0]
    if n == 0 or p == 0:
        return im, corners, cls
    h, w = im.shape[:2]
    flipped = corners.copy()
    flipped[..., 0] = w - flipped[..., 0]
    ioa = bbox_ioa(_hulls(flipped), _hulls(corners))  # [n, n]
    cand = np.nonzero((ioa < 0.30).all(axis=1))[0]
    if cand.size == 0:
        return im, corners, cls
    cand = cand[np.argsort(ioa.max(axis=1)[cand])]  # least-occluding first
    sel = cand[: round(p * cand.size)]
    if sel.size == 0:
        return im, corners, cls
    mask = np.zeros((h, w), np.uint8)
    cv2.drawContours(mask, [flipped[j].astype(np.int32) for j in sel],
                     -1, 1, cv2.FILLED)
    # cv2.flip + cv2.copyTo instead of numpy boolean fancy-indexing of the
    # reversed view: pixel-identical, 8.6 vs 28.2 ms on a 2048px mosaic
    # canvas with 124 pasted instances (measured; the numpy path pays a
    # full-frame gather/scatter over a non-contiguous reversed array)
    out = im.copy()
    cv2.copyTo(cv2.flip(im, 1), mask, out)
    return (out, np.concatenate([corners, flipped[sel]]),
            np.concatenate([cls, cls[sel]]))


def photometric_augment(im: np.ndarray, rng: np.random.Generator,
                        p: float = 1.0) -> np.ndarray:
    """cv2-native equivalents of the reference's default Albumentations list
    (reference augment.py:1735, 1847-1850): Blur / MedianBlur / ToGray /
    CLAHE, each applied independently at p=0.01 (the other three entries
    ship at p=0.0 there). Pixel-level only — labels untouched.

    Blur/MedianBlur draw an odd kernel from {3, 5, 7} (albumentations
    blur_limit=7 default); CLAHE draws clip_limit from U(1, 4) on the LAB
    L channel with an 8x8 tile grid (albumentations CLAHE defaults).
    """
    if p <= 0 or rng.random() >= p:
        return im
    if rng.random() < 0.01:
        k = 2 * int(rng.integers(1, 4)) + 1
        im = cv2.blur(im, (k, k))
    if rng.random() < 0.01:
        k = 2 * int(rng.integers(1, 4)) + 1
        im = cv2.medianBlur(im, k)
    if rng.random() < 0.01:
        im = cv2.cvtColor(cv2.cvtColor(im, cv2.COLOR_RGB2GRAY),
                          cv2.COLOR_GRAY2RGB)
    if rng.random() < 0.01:
        lab = cv2.cvtColor(im, cv2.COLOR_RGB2LAB)
        clahe = cv2.createCLAHE(clipLimit=float(rng.uniform(1.0, 4.0)),
                                tileGridSize=(8, 8))
        lab[..., 0] = clahe.apply(lab[..., 0])
        im = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
    return im


def corners_to_xywhr(corners: np.ndarray) -> np.ndarray:
    """Pixel-space [n, 4, 2] corners -> [n, 5] xywhr via minAreaRect
    (reference ops.py:549 xyxyxyxy2xywhr used by Format return_obb)."""
    out = np.zeros((corners.shape[0], 5), np.float32)
    for i, c in enumerate(corners.astype(np.float32)):
        (cx, cy), (bw, bh), angle = cv2.minAreaRect(c)
        out[i] = [cx, cy, bw, bh, angle / 180 * math.pi]
    return out


def xywh_to_corners(xywh: np.ndarray) -> np.ndarray:
    """Axis-aligned normalized-or-pixel xywh [n,4] -> [n,4,2] corners."""
    x, y, w, h = xywh[:, 0], xywh[:, 1], xywh[:, 2], xywh[:, 3]
    x1, y1, x2, y2 = x - w / 2, y - h / 2, x + w / 2, y + h / 2
    return np.stack([
        np.stack([x1, y1], -1), np.stack([x2, y1], -1),
        np.stack([x2, y2], -1), np.stack([x1, y2], -1),
    ], axis=1)


def corners_to_xyxy(corners: np.ndarray, w: int, h: int) -> np.ndarray:
    """[n,4,2] -> clipped xyxy [n,4]."""
    mn = corners.min(axis=1)
    mx = corners.max(axis=1)
    return np.stack([
        np.clip(mn[:, 0], 0, w), np.clip(mn[:, 1], 0, h),
        np.clip(mx[:, 0], 0, w), np.clip(mx[:, 1], 0, h),
    ], axis=1)
