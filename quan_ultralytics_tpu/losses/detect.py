"""YOLO detection + OBB training losses (fully jittable, fixed shape).

Reference: ultralytics/utils/loss.py v8DetectionLoss (:398-502) and v8OBBLoss
(:853-1047, with the QUAN quaternion angular loss). Ground truths arrive as
padded fixed-size tensors with a validity mask (the dense analog of the
reference `preprocess`, loss.py:425-439); every data-dependent branch is a
`where`. Loss math runs in fp32 regardless of the model compute dtype
(assigner and DFL are precision-sensitive).
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from quan_ultralytics_tpu.losses.tal import task_aligned_assigner
from quan_ultralytics_tpu.models.block import dfl as dfl_decode
from quan_ultralytics_tpu.models.head import flatten_levels
from quan_ultralytics_tpu.ops.boxes import (
    bbox2dist,
    bbox_iou,
    dist2bbox,
    dist2rbox,
    make_anchors,
    probiou,
    xywh2xyxy,
)


class LossHyp(NamedTuple):
    """Loss gains (reference cfg/default.yaml:99-101 + QUAN extras
    loss.py:866-867)."""

    box: float = 7.5
    cls: float = 0.5
    dfl: float = 1.5
    lambda_angular: float = 0.5
    lambda_reg: float = 0.05


def _bce_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with logits (no reduction)."""
    return jnp.clip(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _dfl_loss(pred_dist: jnp.ndarray, target: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Distribution focal loss (reference loss.py:306-330): CE against the
    two integer bins bracketing the target, linearly weighted.

    pred_dist: [..., 4, reg_max] logits; target: [..., 4] in [0, reg_max-1].
    Returns [...] (mean over the 4 sides).
    """
    t = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = jnp.floor(t).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - t
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    # contract against a two-hot weight vector instead of gathering: the two
    # take_along_axis gathers over the dense [B, A, 4, reg_max] tensor lower
    # to 20ms-each kCustom gather fusions on TPU (train profile @1024 b16);
    # the bins-axis compare+sum is pure vector work and fuses away.
    bins = jnp.arange(reg_max, dtype=jnp.int32)
    w2 = (wl[..., None] * (bins == tl[..., None])
          + wr[..., None] * (bins == jnp.clip(tr, 0, reg_max - 1)[..., None]))
    return -(logp * w2).sum(axis=-1).mean(axis=-1)


def _split_preds(feats: Sequence[jnp.ndarray], nc: int, reg_max: int):
    x = flatten_levels(feats).astype(jnp.float32)  # [B, A, 4*reg_max + nc]
    assert x.shape[-1] == 4 * reg_max + nc, \
        f"head channels {x.shape[-1]} != 4*{reg_max}+{nc}"
    return x[..., : 4 * reg_max], x[..., 4 * reg_max :]


def detection_loss(
    feats: Sequence[jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    reg_max: int = 16,
    hyp: LossHyp = LossHyp(),
    assigner_bf16: bool | None = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Axis-aligned v8 detection loss (reference loss.py:398-502).

    batch:
      'cls'    [B, M] int class ids (padded)
      'bboxes' [B, M, 4] normalized xywh in [0, 1]
      'mask'   [B, M] bool validity
    Returns (total_loss == sum * batch_size, aux dict), matching the
    reference's ``loss.sum() * batch_size`` (loss.py:501).

    ``assigner_bf16``: explicit bf16-metric-chain selection for the TAL
    assigner (the trainer passes its config here); ``None`` keeps the
    standalone default — exact f32 unless $QUAN_ASSIGNER_BF16 == "1".
    """
    loss_iou, loss_cls, loss_dfl, assign, ctx = detect_terms(
        feats, batch, strides, nc, reg_max, assigner_bf16=assigner_bf16)
    B = ctx["B"]
    total = (hyp.box * loss_iou + hyp.cls * loss_cls + hyp.dfl * loss_dfl) * B
    aux = {
        "box": hyp.box * loss_iou,
        "cls": hyp.cls * loss_cls,
        "dfl": hyp.dfl * loss_dfl,
        "num_fg": assign.fg_mask.sum(),
    }
    return total, aux


def detect_terms(feats, batch, strides, nc, reg_max=16, assigner_bf16=None):
    """Shared detect-loss core (assigner + cls/iou/dfl terms) used by the
    detect, segment, and pose losses. Returns
    (loss_iou, loss_cls, loss_dfl, assign, ctx) with ctx carrying the
    geometry the task-specific terms need."""
    pred_distri, pred_scores = _split_preds(feats, nc, reg_max)
    B, A, _ = pred_scores.shape
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_t = make_anchors(shapes, strides, 0.5)
    imgsz_h = feats[0].shape[1] * strides[0]
    imgsz_w = feats[0].shape[2] * strides[0]
    scale = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)

    gt_xyxy = xywh2xyxy(batch["bboxes"][..., :4].astype(jnp.float32) * scale)
    mask_gt = batch["mask"] & (gt_xyxy.sum(-1) > 0)

    # Decode predictions (grid units).
    pd = dfl_decode(pred_distri, reg_max)
    pred_bboxes = dist2bbox(pd, anchors[None], xywh=False)  # [B, A, 4] grid

    assign = task_aligned_assigner(
        jax.nn.sigmoid(jax.lax.stop_gradient(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes) * stride_t[None],
        anchors * stride_t,
        batch["cls"],
        gt_xyxy,
        mask_gt,
        num_classes=nc,
        topk=10,
        alpha=0.5,
        beta=6.0,
        bf16_metric=assigner_bf16,
    )
    target_scores_sum = jnp.maximum(assign.target_scores.sum(), 1.0)
    fg = assign.fg_mask  # [B, A]

    # Cls BCE (loss.py:486)
    loss_cls = _bce_logits(pred_scores, assign.target_scores).sum() / target_scores_sum

    # Box CIoU + DFL on foreground (loss.py:339-355), masked not gathered.
    tb = assign.target_bboxes / stride_t[None]  # grid units xyxy
    weight = assign.target_scores.sum(-1) * fg  # [B, A]
    safe_tb = jnp.where(fg[..., None], tb, pred_bboxes)  # avoid NaN on padding
    iou = bbox_iou(pred_bboxes, safe_tb, xywh=False, ciou=True)
    loss_iou = ((1.0 - iou) * weight).sum() / target_scores_sum

    target_ltrb = bbox2dist(anchors[None], safe_tb, reg_max - 1)
    dflv = _dfl_loss(pred_distri.reshape(B, A, 4, reg_max), target_ltrb, reg_max)
    loss_dfl = (dflv * weight).sum() / target_scores_sum

    ctx = {
        "B": B, "A": A, "anchors": anchors, "stride_t": stride_t,
        "weight": weight, "target_scores_sum": target_scores_sum,
        "imgsz": (imgsz_h, imgsz_w), "fg": fg,
    }
    return loss_iou, loss_cls, loss_dfl, assign, ctx


def _angle_to_quaternion(angles: jnp.ndarray) -> jnp.ndarray:
    """z-axis rotation quaternion [cos t/2, 0, 0, sin t/2] (loss.py:870-883)."""
    half = angles / 2
    z = jnp.zeros_like(half)
    return jnp.concatenate([jnp.cos(half), z, z, jnp.sin(half)], axis=-1)


def quaternion_angular_loss(q_pred: jnp.ndarray, q_target: jnp.ndarray) -> jnp.ndarray:
    """SO(3) geodesic distance 2*arccos(|<q_p, q_t>|) with double-cover
    handling (reference loss.py:884-911)."""
    qp = q_pred / jnp.maximum(jnp.linalg.norm(q_pred, axis=-1, keepdims=True), 1e-12)
    qt = q_target / jnp.maximum(jnp.linalg.norm(q_target, axis=-1, keepdims=True), 1e-12)
    dot = jnp.clip((qp * qt).sum(-1), -1.0 + 1e-7, 1.0 - 1e-7)
    return 2.0 * jnp.arccos(jnp.abs(dot))


def obb_loss(
    preds: Tuple[Sequence[jnp.ndarray], Sequence[jnp.ndarray]],
    batch: Dict[str, jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    reg_max: int = 16,
    hyp: LossHyp = LossHyp(),
    assigner_bf16: bool | None = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """OBB loss with the QUAN quaternion angular term (loss.py:853-1047).

    preds: (feats, angles) from the OBB head — angles already mapped to
    [-pi/4, 3pi/4].
    batch:
      'cls'    [B, M] int
      'bboxes' [B, M, 5] normalized xywhr (x, y, w, h in [0,1], r radians)
      'mask'   [B, M] bool
    """
    feats, angles = preds
    pred_distri, pred_scores = _split_preds(feats, nc, reg_max)
    pred_angle = flatten_levels(angles).astype(jnp.float32)  # [B, A, 1]
    B, A, _ = pred_scores.shape
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_t = make_anchors(shapes, strides, 0.5)
    imgsz_h = feats[0].shape[1] * strides[0]
    imgsz_w = feats[0].shape[2] * strides[0]

    gt = batch["bboxes"].astype(jnp.float32)
    gt_xywhr = jnp.concatenate(
        [gt[..., 0:1] * imgsz_w, gt[..., 1:2] * imgsz_h, gt[..., 2:3] * imgsz_w,
         gt[..., 3:4] * imgsz_h, gt[..., 4:5]],
        axis=-1,
    )
    # Tiny-rbox filter (loss.py:966-968): stabilizes training.
    rw, rh = gt_xywhr[..., 2], gt_xywhr[..., 3]
    mask_gt = batch["mask"] & (rw >= 2) & (rh >= 2)

    # Rotated decode in grid units -> [B, A, 5] (loss.py:1029-1047).
    pd = dfl_decode(pred_distri, reg_max)
    pred_xywh = dist2rbox(pd, pred_angle, anchors[None])
    pred_rbox = jnp.concatenate([pred_xywh, pred_angle], axis=-1)

    assigner_boxes = jax.lax.stop_gradient(pred_rbox)
    assigner_boxes = jnp.concatenate(
        [assigner_boxes[..., :4] * stride_t[None], assigner_boxes[..., 4:5]], axis=-1
    )
    assign = task_aligned_assigner(
        jax.nn.sigmoid(jax.lax.stop_gradient(pred_scores)),
        assigner_boxes,
        anchors * stride_t,
        batch["cls"],
        gt_xywhr,
        mask_gt,
        num_classes=nc,
        topk=10,
        alpha=0.5,
        beta=6.0,
        rotated=True,
        bf16_metric=assigner_bf16,
    )
    target_scores_sum = jnp.maximum(assign.target_scores.sum(), 1.0)
    fg = assign.fg_mask

    loss_cls = _bce_logits(pred_scores, assign.target_scores).sum() / target_scores_sum

    # Rotated box loss: probiou + DFL (loss.py:357-379).
    tb = jnp.concatenate(
        [assign.target_bboxes[..., :4] / stride_t[None], assign.target_bboxes[..., 4:5]], axis=-1
    )
    weight = assign.target_scores.sum(-1) * fg
    safe_tb = jnp.where(fg[..., None], tb, pred_rbox)
    iou = probiou(pred_rbox, safe_tb)
    loss_iou = ((1.0 - iou) * weight).sum() / target_scores_sum

    target_ltrb = bbox2dist(anchors[None], xywh2xyxy(safe_tb[..., :4]), reg_max - 1)
    dflv = _dfl_loss(pred_distri.reshape(B, A, 4, reg_max), target_ltrb, reg_max)
    loss_dfl = (dflv * weight).sum() / target_scores_sum

    # Quaternion angular loss (QUAN, loss.py:1010-1027).
    q_pred = _angle_to_quaternion(pred_rbox[..., 4:5])
    q_tgt = _angle_to_quaternion(safe_tb[..., 4:5])
    ang = quaternion_angular_loss(q_pred, q_tgt)  # [B, A]
    loss_ang = (ang * weight).sum() / target_scores_sum
    # Unit-norm regularizer (loss.py:913-922): mean over fg predictions.
    # NOTE: faithfully ~zero — the reference also builds q_pred from
    # angle_to_quaternion ([cos t/2, 0, 0, sin t/2], unit by construction,
    # loss.py:1014+1023), so its reg term is a no-op there too; kept for
    # exact loss-value parity.
    norm_sq = (q_pred**2).sum(-1)
    reg = (((norm_sq - 1.0) ** 2) * fg).sum() / jnp.maximum(fg.sum(), 1.0)
    loss_quat = loss_ang + hyp.lambda_reg * reg

    total = (
        hyp.box * loss_iou + hyp.cls * loss_cls + hyp.dfl * loss_dfl + hyp.lambda_angular * loss_quat
    ) * B
    aux = {
        "box": hyp.box * loss_iou,
        "cls": hyp.cls * loss_cls,
        "dfl": hyp.dfl * loss_dfl,
        "quat": hyp.lambda_angular * loss_quat,
        "num_fg": fg.sum(),
    }
    return total, aux
