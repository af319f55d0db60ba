"""Task-Aligned Assigner as fixed-shape, jit-friendly tensor ops.

Re-implements reference ultralytics/utils/tal.py:14-331 (TaskAlignedAssigner
and RotatedTaskAlignedAssigner). The reference is already pure tensor math;
here every data-dependent branch becomes a `where`, ground truths arrive
padded to a static ``M`` with a validity mask, and boolean advanced indexing
becomes dense masked computation — so the whole assignment jits and shards.

Run this in fp32: the align metric takes overlaps**6.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from quan_ultralytics_tpu.ops.boxes import bbox_iou, probiou, xywhr2xyxyxyxy


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray  # [B, A] int32
    target_bboxes: jnp.ndarray  # [B, A, 4|5]
    target_scores: jnp.ndarray  # [B, A, nc] float
    fg_mask: jnp.ndarray        # [B, A] bool
    target_gt_idx: jnp.ndarray  # [B, A] int32


def _candidates_in_gts(anc_points: jnp.ndarray, gt_bboxes: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Axis-aligned: anchor strictly inside the gt box (tal.py:252-276)."""
    lt = gt_bboxes[..., None, :2]  # [B, M, 1, 2]
    rb = gt_bboxes[..., None, 2:4]
    deltas = jnp.concatenate([anc_points[None, None] - lt, rb - anc_points[None, None]], axis=-1)
    return deltas.min(axis=-1) > eps  # [B, M, A]


def _candidates_in_rotated_gts(anc_points: jnp.ndarray, gt_bboxes: jnp.ndarray) -> jnp.ndarray:
    """Rotated: point-in-rotated-rect via edge projections (tal.py:305-331)."""
    corners = xywhr2xyxyxyxy(gt_bboxes)  # [B, M, 4, 2]
    a, b, d = corners[..., 0, :], corners[..., 1, :], corners[..., 3, :]
    ab = (b - a)[..., None, :]  # [B, M, 1, 2]
    ad = (d - a)[..., None, :]
    ap = anc_points[None, None] - a[..., None, :]  # [B, M, A, 2]
    norm_ab = (ab * ab).sum(-1)
    norm_ad = (ad * ad).sum(-1)
    ap_ab = (ap * ab).sum(-1)
    ap_ad = (ap * ad).sum(-1)
    return (ap_ab >= 0) & (ap_ab <= norm_ab) & (ap_ad >= 0) & (ap_ad <= norm_ad)


def _exact_topk_idx(metrics: jnp.ndarray, topk: int, chunk: int = 128) -> jnp.ndarray:
    """Exact top-k indices over the last axis via two-level selection.

    ``lax.top_k`` over the full anchor axis (A=21504 at 1024px) lowers to a
    full stable sort — ~19.5 ms/step in the train profile. Chunking the axis,
    taking top-k per chunk, then top-k over the ``(A/chunk)*k`` survivors is
    exact (any global top-k element is in its chunk's top-k) and preserves
    lax.top_k's lowest-index tie-breaking: candidates are ordered by
    (chunk, rank), which for equal values is global index order.
    """
    B, M, A = metrics.shape
    if A <= 4 * chunk:
        _, idx = jax.lax.top_k(metrics, topk)
        return idx
    pad = (-A) % chunk
    if pad:
        # metrics are >= 0 everywhere, so -inf padding is never selected
        metrics = jnp.pad(metrics, ((0, 0), (0, 0), (0, pad)),
                          constant_values=-jnp.inf)
    nch = (A + pad) // chunk
    k1 = min(topk, chunk)
    v1, i1 = jax.lax.top_k(metrics.reshape(B, M, nch, chunk), k1)
    gidx = (jnp.arange(nch, dtype=jnp.int32)[:, None] * chunk
            + i1).reshape(B, M, nch * k1)
    _, sel = jax.lax.top_k(v1.reshape(B, M, nch * k1), topk)
    return jnp.take_along_axis(gidx, sel, axis=-1)


def _select_topk_mask(metrics: jnp.ndarray, topk: int, valid_gt: jnp.ndarray) -> jnp.ndarray:
    """Reference select_topk_candidates (tal.py:160-193) incl. its index-0
    collision quirk: invalid rows scatter all their k picks onto index 0,
    and any count > 1 is dropped.

    ``lax.top_k`` indices within a row are distinct, so for VALID rows the
    reference's collision counter can never exceed 1 and its count>1 drop is
    a no-op; for INVALID rows all k picks collide on index 0 and (k > 1) the
    row is dropped entirely.  Scattering ``valid_gt`` with a max-combiner
    therefore reproduces the reference mask exactly while replacing the
    ``one_hot(idx, A).sum`` lowering — k compare-add passes over the dense
    [B, M, A] metric tensor (part of the 40.6 ms/step loop-fusion bucket in
    trainprof24) — with one [B, M, A] zero-fill plus a B*M*k-element scatter.
    (The k == 1 edge case, where the reference KEEPS an invalid row's pick
    at index 0, does not matter downstream: the assigner multiplies by
    mask_gt; we still reproduce it by scattering 0 for invalid rows.)
    """
    B, M, A = metrics.shape
    idx = _exact_topk_idx(metrics, topk)  # [B, M, k], distinct within a row
    val = jnp.broadcast_to(valid_gt[..., None], idx.shape).astype(metrics.dtype)
    if topk == 1:
        val = jnp.ones_like(val)  # reference keeps the single index-0 pick
        idx = jnp.where(valid_gt[..., None], idx, 0)
    mask = jnp.zeros((B, M, A), metrics.dtype)
    bi = jnp.arange(B, dtype=jnp.int32)[:, None, None]
    mi = jnp.arange(M, dtype=jnp.int32)[None, :, None]
    return mask.at[bi, mi, idx].max(val)


def task_aligned_assigner(
    pd_scores: jnp.ndarray,   # [B, A, nc] sigmoid probabilities
    pd_bboxes: jnp.ndarray,   # [B, A, 4] xyxy or [B, A, 5] xywhr (pixels)
    anc_points: jnp.ndarray,  # [A, 2] pixels
    gt_labels: jnp.ndarray,   # [B, M] int
    gt_bboxes: jnp.ndarray,   # [B, M, 4|5]
    mask_gt: jnp.ndarray,     # [B, M] bool
    num_classes: int,
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
    rotated: bool = False,
    bf16_metric: Optional[bool] = None,
) -> AssignResult:
    """Wrapper resolving the metric dtype OUTSIDE the jit cache.

    ``bf16_metric`` (default: $QUAN_ASSIGNER_BF16 == "1") runs the dense
    [B, M, A] alignment-metric chain — class-score einsum, pairwise IoU,
    metric power, top-k — in bf16: the assignment is a selection heuristic
    (no gradients flow through it) and those tensors are the train step's
    largest HBM intermediates (~132 MB each at b24/M=64/A=21504). Targets
    and the final normalize stay f32. OFF by default: selection can differ
    where competing metrics are within bf16 resolution, so the exact-parity
    default is untouched."""
    if bf16_metric is None:
        bf16_metric = os.environ.get("QUAN_ASSIGNER_BF16") == "1"
    return _assigner_jit(pd_scores, pd_bboxes, anc_points, gt_labels,
                         gt_bboxes, mask_gt, num_classes=num_classes,
                         topk=topk, alpha=alpha, beta=beta, eps=eps,
                         rotated=rotated, bf16_metric=bool(bf16_metric))


@partial(jax.jit, static_argnames=("num_classes", "topk", "alpha", "beta",
                                   "rotated", "bf16_metric"))
def _assigner_jit(
    pd_scores: jnp.ndarray,
    pd_bboxes: jnp.ndarray,
    anc_points: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    mask_gt: jnp.ndarray,
    num_classes: int,
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
    rotated: bool = False,
    bf16_metric: bool = False,
) -> AssignResult:
    B, A, nc = pd_scores.shape
    M = gt_bboxes.shape[1]
    pd_scores = pd_scores.astype(jnp.float32)
    pd_bboxes = pd_bboxes.astype(jnp.float32)
    gt_bboxes = gt_bboxes.astype(jnp.float32)

    if rotated:
        mask_in_gts = _candidates_in_rotated_gts(anc_points, gt_bboxes)
        overlaps_fn = lambda g, p: jnp.clip(probiou(g, p), 0)
    else:
        mask_in_gts = _candidates_in_gts(anc_points, gt_bboxes)
        overlaps_fn = lambda g, p: jnp.clip(bbox_iou(g, p, xywh=False, ciou=True), 0)

    mask = mask_in_gts & mask_gt[..., None]  # [B, M, A]

    # Alignment metric (tal.py:137-156): score of each anchor for the gt
    # class, times IoU, both zeroed outside the candidate mask.
    gt_lab = jnp.clip(gt_labels.astype(jnp.int32), 0, nc - 1)
    # per-gt class-score rows as a one-hot contraction (exact: each output
    # element is a single product) — the take_along_axis gather over the
    # class axis lowers to a kCustom gather over the dense [B, M, A] tensor,
    # while the [B, M, nc] x [B, A, nc] einsum rides the MXU.
    mdt = jnp.bfloat16 if bf16_metric else jnp.float32
    lab_oh = jax.nn.one_hot(gt_lab, nc, dtype=mdt)  # [B, M, nc]
    scores_for_gt = jnp.einsum(
        "bmn,ban->bma", lab_oh, pd_scores.astype(mdt),
        precision=None if bf16_metric else jax.lax.Precision.HIGHEST)  # [B, M, A]
    bbox_scores = jnp.where(mask, scores_for_gt, jnp.asarray(0.0, mdt))
    # IoU math stays f32 (inputs are small per-box tensors and the fused
    # chain's intermediates never hit HBM — bf16 inputs were measurably
    # inaccurate for thin rotated boxes); only the materialized [B, M, A]
    # output drops to the metric dtype, which is where the bandwidth is
    overlaps = jnp.where(
        mask,
        overlaps_fn(gt_bboxes[:, :, None, :],
                    pd_bboxes[:, None, :, :]).astype(mdt),
        jnp.asarray(0.0, mdt))
    align_metric = bbox_scores**alpha * overlaps**beta

    mask_topk = _select_topk_mask(align_metric, topk, mask_gt)
    mask_pos = mask_topk * mask_in_gts.astype(mdt) * mask_gt[..., None].astype(mdt)

    # Resolve anchors claimed by multiple gts by highest overlap (tal.py:277-296).
    # (0/1 sums up to M=64 are exact in bf16, so fg_count/fg_mask are safe.)
    fg_count = mask_pos.sum(axis=-2)  # [B, A]
    mask_multi = (fg_count > 1)[:, None, :]  # [B, 1, A]
    max_overlap_gt = overlaps.argmax(axis=1)  # [B, A]
    # build the [B, M, A] one-hot directly (a fused compare): one_hot
    # produces [B, A, M] and the transpose materializes a full dense copy
    is_max = (jnp.arange(M, dtype=jnp.int32)[None, :, None]
              == max_overlap_gt[:, None, :]).astype(mdt)  # [B, M, A]
    mask_pos = jnp.where(mask_multi, is_max, mask_pos)
    fg_mask_f = mask_pos.sum(axis=-2)
    target_gt_idx = mask_pos.argmax(axis=-2)  # [B, A]
    fg_mask = fg_mask_f > 0

    # Gather targets (tal.py:195-250) as one-hot contractions: per-anchor
    # take_along_axis over the gt axis lowers to ~2-4 ms kCustom gather
    # fusions on TPU (trainprof24), while the [B, A, M] x [B, M, .] matmul
    # rides the MXU. mask_pos.argmax is already one-hot-able exactly.
    prec = jax.lax.Precision.HIGHEST  # exact f32: one-hot selection must be bit-exact
    sel = jax.nn.one_hot(target_gt_idx, M, dtype=jnp.float32)  # [B, A, M]
    target_labels = jnp.einsum("bam,bm->ba", sel, gt_lab.astype(jnp.float32),
                               precision=prec).astype(jnp.int32)
    target_bboxes = jnp.einsum("bam,bmc->bac", sel, gt_bboxes, precision=prec)
    target_scores = jax.nn.one_hot(target_labels, num_classes, dtype=jnp.float32)
    target_scores = target_scores * fg_mask[..., None]

    # Normalize by per-gt best alignment (tal.py:117-125).
    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(axis=-1, keepdims=True)   # [B, M, 1]
    pos_overlap = (overlaps * mask_pos).max(axis=-1, keepdims=True)
    norm = (align_metric * pos_overlap / (pos_align + eps)).max(axis=-2)[..., None]  # [B, A, 1]
    target_scores = target_scores * norm.astype(jnp.float32)

    return AssignResult(target_labels, target_bboxes, target_scores, fg_mask, target_gt_idx)
