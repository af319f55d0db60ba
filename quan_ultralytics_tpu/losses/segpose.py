"""Segmentation and pose losses (reference utils/loss.py:504-786).

Fixed-shape TPU versions of v8SegmentationLoss / v8PoseLoss: the reference
gathers dynamic foreground sets; here the task-specific terms run on the
top-K assigner-weighted anchors (K static) — every anchor that carries
assignment weight participates, padding anchors carry zero weight, so the
sums are exact whenever the image has <= K foreground anchors (K defaults to
the padded label capacity).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import numpy as np
import jax.numpy as jnp

from quan_ultralytics_tpu.losses.detect import LossHyp, detect_terms, _bce_logits
from quan_ultralytics_tpu.models.head import decode_kpts, flatten_levels

# COCO keypoint OKS sigmas (reference utils/metrics.py OKS_SIGMA).
# NUMPY on purpose: this module is imported lazily inside trainer.loss_fn,
# i.e. under an active jit trace — a module-level jnp expression would be
# staged into THAT trace and the cached global becomes an escaped tracer
# (seg-train then pose-train in one process: UnexpectedTracerError,
# scripts/r4_results.jsonl segposetrain).
OKS_SIGMA = np.array(
    [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62,
     1.07, 1.07, 0.87, 0.87, 0.89, 0.89], np.float32) / 10.0


def _topk_fg(ctx, assign, K: int):
    """Top-K anchors by assignment weight: returns (idx [B,K], w [B,K],
    tgt_gt [B,K])."""
    w = ctx["weight"]  # [B, A] target-score weight, 0 on background
    sel_w, sel_idx = jax.lax.top_k(w, K)
    tgt_gt = jnp.take_along_axis(assign.target_gt_idx, sel_idx, axis=1)
    return sel_idx, sel_w, tgt_gt


def segmentation_loss(
    preds: Tuple[Sequence[jnp.ndarray], Sequence[jnp.ndarray], jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    reg_max: int = 16,
    hyp: LossHyp = LossHyp(),
    max_fg: int = 64,
    assigner_bf16: bool | None = None,
):
    """v8SegmentationLoss (reference loss.py:504-604): detect terms + mask
    BCE. Masks are predicted as sigmoid(mc @ proto), cropped to the target
    box, BCE'd against the instance mask, normalized by box area.

    batch extra:
      'masks' [B, M, Hp, Wp] float/bool instance masks at PROTO resolution
      (the loader downsamples, like the reference's downsample_ratio=4).
    """
    feats, mc, proto = preds
    loss_iou, loss_cls, loss_dfl, assign, ctx = detect_terms(
        feats, batch, strides, nc, reg_max, assigner_bf16=assigner_bf16)
    B, A = ctx["B"], ctx["A"]
    Hp, Wp = proto.shape[1:3]
    imgsz_h, imgsz_w = ctx["imgsz"]

    K = min(max_fg, A)
    sel_idx, sel_w, tgt_gt = _topk_fg(ctx, assign, K)

    mc_flat = flatten_levels(mc).astype(jnp.float32)            # [B, A, nm]
    sel_mc = jnp.take_along_axis(mc_flat, sel_idx[..., None], axis=1)  # [B, K, nm]
    pm = jnp.einsum("bkn,bhwn->bkhw", sel_mc, proto.astype(jnp.float32))

    gtm = jnp.take_along_axis(
        batch["masks"].astype(jnp.float32), tgt_gt[..., None, None], axis=1
    )  # [B, K, Hp, Wp]

    # crop to the assigned target box in proto pixels (reference crop_mask)
    tb = assign.target_bboxes  # [B, A, 4] xyxy input pixels
    sel_box = jnp.take_along_axis(tb, sel_idx[..., None], axis=1)  # [B, K, 4]
    sx = Wp / imgsz_w
    sy = Hp / imgsz_h
    x1, y1 = sel_box[..., 0] * sx, sel_box[..., 1] * sy
    x2, y2 = sel_box[..., 2] * sx, sel_box[..., 3] * sy
    xx = jnp.arange(Wp, dtype=jnp.float32)[None, None, None, :]
    yy = jnp.arange(Hp, dtype=jnp.float32)[None, None, :, None]
    inside = ((xx >= x1[..., None, None]) & (xx < x2[..., None, None])
              & (yy >= y1[..., None, None]) & (yy < y2[..., None, None]))

    bce = _bce_logits(pm, gtm) * inside
    area = jnp.maximum((x2 - x1) * (y2 - y1), 1.0)
    per_anchor = bce.sum(axis=(2, 3)) / area  # [B, K]
    fg_sel = (sel_w > 0).astype(jnp.float32)
    loss_mask = (per_anchor * fg_sel).sum() / ctx["target_scores_sum"]

    total = (hyp.box * loss_iou + hyp.cls * loss_cls + hyp.dfl * loss_dfl
             + hyp.box * loss_mask) * B
    aux = {"box": hyp.box * loss_iou, "cls": hyp.cls * loss_cls,
           "dfl": hyp.dfl * loss_dfl, "seg": hyp.box * loss_mask,
           "num_fg": assign.fg_mask.sum()}
    return total, aux


def pose_loss(
    preds: Tuple[Sequence[jnp.ndarray], Sequence[jnp.ndarray]],
    batch: Dict[str, jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    kpt_shape: Tuple[int, int] = (17, 3),
    reg_max: int = 16,
    hyp: LossHyp = LossHyp(),
    pose_gain: float = 12.0,
    kobj_gain: float = 1.0,
    max_fg: int = 64,
    assigner_bf16: bool | None = None,
):
    """v8PoseLoss (reference loss.py:687-786): detect terms + the OKS-style
    keypoint location loss (KeypointLoss, loss.py:90-110) + visibility BCE.

    batch extra:
      'keypoints' [B, M, nk, 3] — x, y normalized to [0,1], visibility flag.
    """
    feats, kpts = preds
    loss_iou, loss_cls, loss_dfl, assign, ctx = detect_terms(
        feats, batch, strides, nc, reg_max, assigner_bf16=assigner_bf16)
    B, A = ctx["B"], ctx["A"]
    imgsz_h, imgsz_w = ctx["imgsz"]
    nk, ndim = kpt_shape

    pred_k = decode_kpts(kpts, strides, kpt_shape)  # [B, A, nk, ndim] pixels
    K = min(max_fg, A)
    sel_idx, sel_w, tgt_gt = _topk_fg(ctx, assign, K)
    sel_k = jnp.take_along_axis(pred_k, sel_idx[..., None, None], axis=1)  # [B, K, nk, ndim]

    gk = batch["keypoints"].astype(jnp.float32)  # [B, M, nk, 3] normalized
    sel_g = jnp.take_along_axis(gk, tgt_gt[..., None, None], axis=1)  # [B, K, nk, 3]
    g_xy = sel_g[..., :2] * jnp.array([imgsz_w, imgsz_h], jnp.float32)
    kpt_mask = (sel_g[..., 2] > 0).astype(jnp.float32)  # [B, K, nk]

    tb = jnp.take_along_axis(assign.target_bboxes, sel_idx[..., None], axis=1)
    area = jnp.maximum((tb[..., 2] - tb[..., 0]) * (tb[..., 3] - tb[..., 1]), 1.0)

    sigmas = jnp.asarray(OKS_SIGMA) if nk == 17 else jnp.full((nk,), 1.0 / nk, jnp.float32)
    d2 = ((sel_k[..., :2] - g_xy) ** 2).sum(-1)  # [B, K, nk]
    e = d2 / (2.0 * (2.0 * sigmas[None, None, :]) ** 2 * (area[..., None] + 1e-9))
    kpt_loss_factor = nk / jnp.maximum(kpt_mask.sum(-1, keepdims=True), 1.0)
    fg_sel = (sel_w > 0).astype(jnp.float32)[..., None]
    loc = (kpt_loss_factor * (1.0 - jnp.exp(-e)) * kpt_mask * fg_sel).sum() \
        / jnp.maximum((kpt_mask * fg_sel).sum(), 1.0)

    if ndim == 3:
        # visibility objectness: BCE(pred_vis_logit, visible)
        raw = flatten_levels(kpts).reshape(B, A, nk, ndim).astype(jnp.float32)
        sel_v = jnp.take_along_axis(raw, sel_idx[..., None, None], axis=1)[..., 2]
        vis = _bce_logits(sel_v, kpt_mask) * fg_sel  # fg_sel broadcasts over nk
        loss_kobj = vis.sum() / jnp.maximum(fg_sel.sum() * nk, 1.0)
    else:
        loss_kobj = jnp.float32(0.0)

    total = (hyp.box * loss_iou + hyp.cls * loss_cls + hyp.dfl * loss_dfl
             + pose_gain * loc + kobj_gain * loss_kobj) * B
    aux = {"box": hyp.box * loss_iou, "cls": hyp.cls * loss_cls,
           "dfl": hyp.dfl * loss_dfl, "pose": pose_gain * loc,
           "kobj": kobj_gain * loss_kobj, "num_fg": assign.fg_mask.sum()}
    return total, aux
