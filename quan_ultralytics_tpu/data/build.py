"""Batch builder: augment -> format -> fixed-shape padded numpy batches.

The TPU analog of reference data/build.py (InfiniteDataLoader :28 +
collate). Every batch has static shapes: images ``[B, imgsz, imgsz, 3]``
float32 in [0, 1], labels padded to ``max_labels`` with a validity mask —
the dense equivalent of the reference's variable-length collate + loss-side
`preprocess` (loss.py:425-439). Uses a thread pool for decode/augment
overlap (cv2 releases the GIL).
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from quan_ultralytics_tpu.data.augment import (
    AugmentHyp,
    copy_paste,
    corners_to_xywhr,
    corners_to_xyxy,
    flip_corners,
    letterbox,
    mixup,
    photometric_augment,
    random_hsv,
    random_perspective,
    xywh_to_corners,
)
from quan_ultralytics_tpu.data.dataset import YOLODataset


def _load_sample_pixels(ds: YOLODataset, i: int, imgsz: int, with_meta: bool = False):
    """Load image letterboxed to imgsz; labels as pixel-space point sets:
    detect [n,4,2] box corners; obb [n,4,2] rotated corners; segment
    [n,SEG_POINTS,2] polygon points; pose [n,4+nk,2] box corners + keypoints
    (visibility rides in the sample's kpts, see make_sample)."""
    from quan_ultralytics_tpu.data.dataset import SEG_POINTS

    im = ds.load_image(i)
    h0, w0 = im.shape[:2]
    s = ds.samples[i]
    im, r, (dw, dh) = letterbox(im, imgsz)
    if ds.task == "obb":
        corners = s.bboxes.reshape(-1, 4, 2) * [w0, h0]
    elif ds.task == "segment":
        corners = s.bboxes.reshape(-1, SEG_POINTS, 2) * [w0, h0]
    elif ds.task == "pose":
        box_c = xywh_to_corners(s.bboxes * [w0, h0, w0, h0])
        kxy = (s.kpts[..., :2] if s.kpts is not None and len(s.kpts)
               else np.zeros((len(s.bboxes), 17, 2), np.float32)) * [w0, h0]
        corners = np.concatenate([box_c, kxy], axis=1)
    else:
        corners = xywh_to_corners(s.bboxes * [w0, h0, w0, h0])
    corners = corners * r + [dw, dh]
    if with_meta:
        meta = {"ori_shape": np.array([h0, w0], np.float32),
                "ratio_pad": np.array([r, dw, dh], np.float32)}
        return im, corners.astype(np.float32), s.cls.copy(), meta
    return im, corners.astype(np.float32), s.cls.copy()


def _mosaic4(ds: YOLODataset, indices, imgsz: int, rng: np.random.Generator):
    """4-image mosaic on a 2x canvas (reference augment.py:490 Mosaic)."""
    s2 = imgsz * 2
    yc, xc = (int(rng.uniform(imgsz // 2, 3 * imgsz // 2)) for _ in range(2))
    canvas = np.full((s2, s2, 3), 114, np.uint8)
    all_c, all_cls = [], []
    for k, idx in enumerate(indices):
        im, corners, cls = _load_sample_pixels(ds, idx, imgsz)
        h, w = im.shape[:2]
        if k == 0:
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
        elif k == 1:
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s2), yc
            x1b, y1b = 0, h - (y2a - y1a)
        elif k == 2:
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s2, yc + h)
            x1b, y1b = w - (x2a - x1a), 0
        else:
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s2), min(s2, yc + h)
            x1b, y1b = 0, 0
        canvas[y1a:y2a, x1a:x2a] = im[y1b : y1b + (y2a - y1a), x1b : x1b + (x2a - x1a)]
        if corners.size:
            shifted = corners + [x1a - x1b, y1a - y1b]
            all_c.append(shifted)
            all_cls.append(cls)
    corners = np.concatenate(all_c) if all_c else np.zeros((0, 4, 2), np.float32)
    cls = np.concatenate(all_cls) if all_cls else np.zeros(0, np.int32)
    return canvas, corners.astype(np.float32), cls


def _hull_xywh(corners: np.ndarray, W: int, H: int) -> np.ndarray:
    """Axis-aligned hull of a point set -> clipped normalized xywh [n, 4]."""
    xyxy = corners_to_xyxy(corners, W, H)
    return np.stack([
        (xyxy[:, 0] + xyxy[:, 2]) / 2, (xyxy[:, 1] + xyxy[:, 3]) / 2,
        xyxy[:, 2] - xyxy[:, 0], xyxy[:, 3] - xyxy[:, 1],
    ], axis=1) / [W, H, W, H]


def _format(im, corners, cls, task: str, imgsz, max_labels: int, vis=None):
    """Pixel corners -> normalized padded label tensors.

    imgsz: int (square) or (H, W) — rect batches normalize x by W and y by H
    (the loss de-normalizes per-axis the same way, losses/detect.py:93-97).
    OBB requires square: per-axis normalization would shear rotated boxes.

    segment: corners are [n, SEG_POINTS, 2] polygons — emits hull boxes +
    'masks' rasterized at proto resolution (imgsz//4, reference
    downsample_ratio=4, loss.py:560).
    pose: corners are [n, 4+nk, 2] box corners + keypoints, `vis` [n, nk] —
    emits boxes + 'keypoints' [M, nk, 3] normalized.
    """
    import cv2

    H, W = (imgsz, imgsz) if isinstance(imgsz, int) else imgsz
    boxes_dim = 5 if task == "obb" else 4
    out_boxes = np.zeros((max_labels, boxes_dim), np.float32)
    out_cls = np.zeros(max_labels, np.int32)
    out_mask = np.zeros(max_labels, bool)
    extra = {}
    if task == "segment":
        Hp, Wp = H // 4, W // 4
        extra["masks"] = np.zeros((max_labels, Hp, Wp), np.float32)
    elif task == "pose":
        nk = corners.shape[1] - 4 if corners.size else 17
        extra["keypoints"] = np.zeros((max_labels, nk, 3), np.float32)
    n = min(corners.shape[0], max_labels)
    if n:
        if task == "segment":
            out_boxes[:n] = _hull_xywh(corners[:n], W, H)
            scale = np.array([extra["masks"].shape[2] / W,
                              extra["masks"].shape[1] / H], np.float32)
            for j in range(n):
                poly = (corners[j] * scale).astype(np.int32)
                cv2.fillPoly(extra["masks"][j], [poly], 1.0)
        elif task == "pose":
            out_boxes[:n] = _hull_xywh(corners[:n, :4], W, H)
            kxy = corners[:n, 4:]
            v = (vis[:n] if vis is not None
                 else np.ones(kxy.shape[:2], np.float32)).astype(np.float32)
            inside = ((kxy[..., 0] >= 0) & (kxy[..., 0] < W)
                      & (kxy[..., 1] >= 0) & (kxy[..., 1] < H))
            extra["keypoints"][:n, :, 0] = kxy[..., 0] / W
            extra["keypoints"][:n, :, 1] = kxy[..., 1] / H
            extra["keypoints"][:n, :, 2] = v * inside
        elif task == "obb":
            assert H == W, "rect batching is not supported for the OBB task"
            xywhr = corners_to_xywhr(corners[:n])
            xywhr[:, :4] /= H
            out_boxes[:n] = xywhr
        else:
            xyxy = corners_to_xyxy(corners[:n], W, H)
            xywh = np.stack([
                (xyxy[:, 0] + xyxy[:, 2]) / 2, (xyxy[:, 1] + xyxy[:, 3]) / 2,
                xyxy[:, 2] - xyxy[:, 0], xyxy[:, 3] - xyxy[:, 1],
            ], axis=1) / [W, H, W, H]
            out_boxes[:n] = xywh
        out_cls[:n] = cls[:n]
        out_mask[:n] = True
    return {
        # uint8: the host->device transfer is 4x smaller than f32; consumers
        # (trainer.loss_fn, Validator.infer, Predictor) normalize ON DEVICE
        # with the bit-identical f32/255 -> compute-dtype cast
        "img": im,
        "bboxes": out_boxes,
        "cls": out_cls,
        "mask": out_mask,
        **extra,
    }


# COCO-17 left/right keypoint swap under horizontal flip (reference
# cfg/datasets/coco-pose.yaml flip_idx)
COCO_FLIP_IDX = [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15]


def _pose_sample(ds: YOLODataset, idx: int, imgsz, hyp, max_labels, rng, augment):
    """Pose path: letterbox + HSV + flips (with keypoint left/right swap).
    Mosaic/perspective drop instances, which would desynchronize the
    visibility array — restricted like the reference's simpler pose recipes."""
    im, corners, cls = _load_sample_pixels(ds, idx, imgsz)
    s = ds.samples[idx]
    vis = (s.kpts[..., 2].copy() if s.kpts is not None and len(s.kpts)
           else np.ones((len(cls), corners.shape[1] - 4), np.float32))
    if augment and hyp:
        im = photometric_augment(im, rng)  # pixel-level, keypoint-safe
        im = random_hsv(im, hyp, rng)
        h, w = im.shape[:2]
        if rng.random() < hyp.flipud:
            im = np.ascontiguousarray(np.flipud(im))
            if corners.size:
                corners[..., 1] = h - corners[..., 1]
        if rng.random() < hyp.fliplr:
            im = np.ascontiguousarray(np.fliplr(im))
            if corners.size:
                corners[..., 0] = w - corners[..., 0]
                nk = corners.shape[1] - 4
                if nk == 17:
                    corners[:, 4:] = corners[:, 4:][:, COCO_FLIP_IDX]
                    vis = vis[:, COCO_FLIP_IDX]
    return _format(im, corners, cls, "pose", imgsz, max_labels, vis=vis)


def make_sample(ds: YOLODataset, idx: int, imgsz: int, hyp: Optional[AugmentHyp],
                max_labels: int, rng: np.random.Generator, augment: bool,
                with_meta: bool = False) -> Dict[str, np.ndarray]:
    if with_meta and not augment:
        # validation path: carry letterbox geometry so predictions can be
        # mapped back to source-image coordinates (reference ops.scale_boxes,
        # utils/ops.py:92, and obb/val.py pred_to_json patch handling)
        im, corners, cls, meta = _load_sample_pixels(ds, idx, imgsz, with_meta=True)
        vis = None
        if ds.task == "pose":
            s = ds.samples[idx]
            vis = s.kpts[..., 2] if s.kpts is not None and len(s.kpts) else None
        out = _format(im, corners, cls, ds.task, imgsz, max_labels, vis=vis)
        out.update(meta)
        if ds.task == "segment":
            # letterboxed-pixel polygons for native-resolution mask eval
            # (Validator mask_native; reference ops.process_mask_native).
            # Variable count per image -> collated as a list, not stacked.
            n = min(corners.shape[0], max_labels)
            out["polys"] = corners[:n].astype(np.float32)
        return out
    if ds.task == "pose":
        return _pose_sample(ds, idx, imgsz, hyp, max_labels, rng, augment)
    if augment and hyp and rng.random() < hyp.mosaic:
        others = rng.integers(0, len(ds), 3)
        im, corners, cls = _mosaic4(ds, [idx, *others], imgsz, rng)
        if hyp.copy_paste > 0:
            im, corners, cls = copy_paste(im, corners, cls, rng, hyp.copy_paste)
        # mosaic canvas (2x) -> perspective with border crop back to imgsz
        im, corners, cls = random_perspective(im, corners, cls, hyp, rng,
                                              border=(-imgsz // 2, -imgsz // 2))
        if hyp.mixup > 0 and rng.random() < hyp.mixup:
            # second mosaic for MixUp (reference v8_transforms: MixUp after
            # RandomPerspective, augment.py:2278-2345)
            o2 = rng.integers(0, len(ds), 4)
            im2, c2, k2 = _mosaic4(ds, list(o2), imgsz, rng)
            im2, c2, k2 = random_perspective(im2, c2, k2, hyp, rng,
                                             border=(-imgsz // 2, -imgsz // 2))
            im, corners, cls = mixup(im, corners, cls, im2, c2, k2, rng)
    else:
        im, corners, cls = _load_sample_pixels(ds, idx, imgsz)
        if augment and hyp:
            im, corners, cls = random_perspective(im, corners, cls, hyp, rng, border=(0, 0))
    if augment and hyp:
        # reference v8_transforms order (augment.py:2278-2345): ...MixUp ->
        # Albumentations (Blur/MedianBlur/ToGray/CLAHE) -> HSV -> flips
        im = photometric_augment(im, rng)
        im = random_hsv(im, hyp, rng)
        im, corners = flip_corners(im, corners, hyp, rng)
    return _format(im, corners, cls, ds.task, imgsz, max_labels)


def build_dataloader(
    ds: YOLODataset,
    batch_size: int,
    imgsz: int = 640,
    hyp: Optional[AugmentHyp] = None,
    max_labels: int = 128,
    augment: bool = True,
    shuffle: bool = True,
    seed: int = 0,
    workers: int = 4,
    drop_last: bool = True,
    multi_scale: bool = False,
    with_meta: bool = False,
    rect: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """One epoch of fixed-shape batches (stack of `make_sample` outputs).

    multi_scale: per-batch image size drawn from a discrete 0.5-1.5x ladder
    aligned to the 32-stride grid (reference detect/train.py:60-72). A small
    static set of sizes keeps the number of XLA compilations bounded.

    rect: rectangular batching (reference data/base.py set_rectangle): sort
    by aspect ratio, letterbox each batch to its own minimal stride-32 shape
    instead of a square — less padding, fewer wasted pixels. Shapes are
    quantized to the 32-stride grid, so the number of distinct XLA
    compilations stays bounded by the aspect spread. Val/predict path only
    (requires augment=False; forces shuffle off, like the reference).
    """
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(ds)) if shuffle and not rect else np.arange(len(ds))
    batch_shapes = None
    if rect:
        assert not augment and not multi_scale, "rect batching is a val/predict feature"
        shapes = ds.shapes().astype(np.float64)  # [N, 2] (h, w)
        ar = shapes[:, 0] / shapes[:, 1]
        order = order[np.argsort(ar[order], kind="stable")]
        gs = 32
        nb_r = math.ceil(len(order) / batch_size)
        batch_shapes = []
        for b in range(nb_r):
            ari = ar[order[b * batch_size : (b + 1) * batch_size]]
            mini, maxi = ari.min(), ari.max()
            sh = [1.0, 1.0]
            if maxi < 1:
                sh = [maxi, 1.0]       # wide images: shrink H
            elif mini > 1:
                sh = [1.0, 1.0 / mini]  # tall images: shrink W
            batch_shapes.append(tuple(
                int(math.ceil(v * imgsz / gs + 0.5) * gs) for v in sh
            ))
    n = len(order)
    nb = n // batch_size if drop_last else math.ceil(n / batch_size)
    tiny_real = None
    if nb == 0 and n > 0:  # tiny dataset: repeat to fill one batch
        tiny_real = n  # the repeats are padding for scoring purposes
        order = np.resize(order, batch_size)
        nb = 1
    if multi_scale:
        gs = 32
        sizes = sorted({max(int(imgsz * f) // gs * gs, gs) for f in (0.5, 0.75, 1.0, 1.25, 1.5)})
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for b in range(nb):
            idxs = order[b * batch_size : (b + 1) * batch_size]
            n_real = tiny_real if tiny_real is not None else len(idxs)
            if len(idxs) < batch_size:
                idxs = np.resize(idxs, batch_size)
            if batch_shapes is not None:
                size = batch_shapes[b]
            elif multi_scale:
                size = int(rng.choice(sizes))
            else:
                size = imgsz
            child_rngs = [np.random.default_rng(rng.integers(1 << 31)) for _ in idxs]
            samples = list(pool.map(
                lambda t: make_sample(ds, int(t[0]), size, hyp, max_labels, t[1],
                                      augment, with_meta=with_meta),
                zip(idxs, child_rngs),
            ))
            batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]
                     if k != "polys"}
            if "polys" in samples[0]:
                batch["polys"] = [s["polys"] for s in samples]
            if with_meta:
                batch["im_files"] = [ds.samples[int(i)].im_file for i in idxs]
                # consumers must not score tail-padding repeats; a path-set
                # dedup would wrongly drop legitimate duplicate paths
                batch["n_real"] = n_real
            yield batch
