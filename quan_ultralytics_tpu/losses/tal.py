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


def _candidates_in_gts(anc: jnp.ndarray, gt_bboxes: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Axis-aligned: anchor strictly inside the gt box (tal.py:252-276).

    ``anc``: [..., S, 2] broadcastable against gt's [B, M, 1, 2] (pass
    ``anc_points[None, None]`` for the shared dense grid, or a per-batch
    ``[B, 1, S, 2]`` selection for the sparse path)."""
    lt = gt_bboxes[..., None, :2]  # [B, M, 1, 2]
    rb = gt_bboxes[..., None, 2:4]
    deltas = jnp.concatenate([anc - lt, rb - anc], axis=-1)
    return deltas.min(axis=-1) > eps  # [B, M, S]


def _candidates_in_rotated_gts(anc: jnp.ndarray, gt_bboxes: jnp.ndarray) -> jnp.ndarray:
    """Rotated: point-in-rotated-rect via edge projections (tal.py:305-331).

    ``anc`` broadcasts like in :func:`_candidates_in_gts`."""
    corners = xywhr2xyxyxyxy(gt_bboxes)  # [B, M, 4, 2]
    a, b, d = corners[..., 0, :], corners[..., 1, :], corners[..., 3, :]
    ab = (b - a)[..., None, :]  # [B, M, 1, 2]
    ad = (d - a)[..., None, :]
    ap = anc - a[..., None, :]  # [B, M, S, 2]
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


def _iter_topk_idx(metrics: jnp.ndarray, topk: int) -> jnp.ndarray:
    """Exact top-k indices via ``topk`` iterative argmax+mask passes.

    ``lax.top_k`` over chunk-reshaped metrics lowers to a segment SORT of
    value+index tensors (~6.6 ms/step on the [24,64,168,128] level-1 sort in
    trainprof24i); for small static k, k fused (argmax, mask) passes over
    [B, M, A] touch only the bf16 value tensor and no index payload.
    Rank-ordered output with ``lax.top_k``'s exact tie order: ``argmax``
    returns the lowest index among equals, and masking the previous pick
    before the next pass reproduces (value desc, index asc).

    PRECONDITION: metrics must be NaN-free (the assigner where-masks them to
    >= 0 upstream). ``argmax`` and sort-based ``top_k`` order NaNs
    differently, so a NaN metric would silently diverge the two impls.
    """
    B, M, A = metrics.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, M, A), 2)
    idxs = []
    m = metrics
    for _ in range(topk):
        i = jnp.argmax(m, axis=-1).astype(jnp.int32)  # lowest-index ties
        idxs.append(i)
        m = jnp.where(iota == i[..., None], -jnp.inf, m)
    return jnp.stack(idxs, axis=-1)


def _select_topk_mask(metrics: jnp.ndarray, topk: int, valid_gt: jnp.ndarray,
                      topk_impl: str = "chunk") -> jnp.ndarray:
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
    # both impls produce identical indices (tie order included); pick via
    # QUAN_TOPK_IMPL=iter|chunk (A/B'd on chip before flipping the default),
    # resolved in task_aligned_assigner and plumbed here as a static.
    if topk_impl == "iter" and topk > 16:
        # the k sequential argmax passes only beat the chunked sort for
        # small static k; refuse loudly rather than silently falling back
        # (an A/B that quietly ran 'chunk' would record a bogus verdict)
        raise ValueError(f"topk_impl='iter' supports topk <= 16, got {topk}")
    if topk_impl == "iter":
        idx = _iter_topk_idx(metrics, topk)
    else:
        idx = _exact_topk_idx(metrics, topk)  # [B, M, k], distinct in a row
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
    impl: Optional[str] = None,
    topk_impl: Optional[str] = None,
) -> AssignResult:
    """Wrapper resolving the metric dtype OUTSIDE the jit cache.

    ``bf16_metric`` (default: $QUAN_ASSIGNER_BF16 == "1") runs the dense
    [B, M, A] alignment-metric chain — class-score einsum, pairwise IoU,
    metric power, top-k — in bf16: the assignment is a selection heuristic
    (no gradients flow through it) and those tensors are the train step's
    largest HBM intermediates (~132 MB each at b24/M=64/A=21504). Targets
    and the final normalize stay f32. OFF by default: selection can differ
    where competing metrics are within bf16 resolution, so the exact-parity
    default is untouched.

    ``impl`` (default: $QUAN_ASSIGNER_IMPL or "dense"): "sparse" streams the
    metric through a chunked scan and resolves targets on the <= M*topk
    selected anchors only — bitwise-equal outputs, ~33x smaller peak
    intermediates, but MEASURED SLOWER on v5e (train b24 @1024: 132.8 vs
    dense 156.9 img/s, r4 assign_ab — the scan serializes what XLA fuses
    wide). A memory knob for M or A far past the defaults, not a speed knob.

    ``topk_impl`` (default: $QUAN_TOPK_IMPL, else "iter" for topk <= 16 and
    "chunk" beyond): "iter" replaces the chunked-sort top-k with k fused
    argmax+mask passes — identical indices, tie order included; requesting
    it explicitly with topk > 16 raises (the sequential passes lose to the
    sort for large k). Default flipped to "iter" in round 5: train b24
    @1024 measured 165.2 vs 156.3 img/s (145.2 vs 153.6 ms/step, the
    profile's 6.6 ms sort.2 retired; scripts/r5_results.jsonl topk_ab)."""
    if bf16_metric is None:
        bf16_metric = os.environ.get("QUAN_ASSIGNER_BF16") == "1"
    if impl is None:
        impl = os.environ.get("QUAN_ASSIGNER_IMPL", "dense")
    if topk_impl is None:
        topk_impl = os.environ.get("QUAN_TOPK_IMPL",
                                   "iter" if topk <= 16 else "chunk")
    return _assigner_jit(pd_scores, pd_bboxes, anc_points, gt_labels,
                         gt_bboxes, mask_gt, num_classes=num_classes,
                         topk=topk, alpha=alpha, beta=beta, eps=eps,
                         rotated=rotated, bf16_metric=bool(bf16_metric),
                         impl=str(impl), topk_impl=str(topk_impl))


@partial(jax.jit, static_argnames=("num_classes", "topk", "alpha", "beta",
                                   "rotated", "bf16_metric", "impl",
                                   "topk_impl"))
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
    impl: str = "dense",
    topk_impl: str = "chunk",
) -> AssignResult:
    B, A, nc = pd_scores.shape
    M = gt_bboxes.shape[1]
    pd_scores = pd_scores.astype(jnp.float32)
    pd_bboxes = pd_bboxes.astype(jnp.float32)
    gt_bboxes = gt_bboxes.astype(jnp.float32)

    cand_fn = _candidates_in_rotated_gts if rotated else _candidates_in_gts
    if rotated:
        overlaps_fn = lambda g, p: jnp.clip(probiou(g, p), 0)
    else:
        overlaps_fn = lambda g, p: jnp.clip(bbox_iou(g, p, xywh=False, ciou=True), 0)
    if impl == "sparse":
        return _assigner_sparse(pd_scores, pd_bboxes, anc_points, gt_labels,
                                gt_bboxes, mask_gt, cand_fn, overlaps_fn,
                                num_classes, topk, alpha, beta, eps,
                                bf16_metric)
    mask_in_gts = cand_fn(anc_points[None, None], gt_bboxes)

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

    mask_topk = _select_topk_mask(align_metric, topk, mask_gt, topk_impl)
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


def _scan_topk_idx(metric_chunk_fn, B: int, M: int, A: int, topk: int,
                   xs, mdt) -> jnp.ndarray:
    """Global top-k anchor indices per gt without materializing [B, M, A].

    ``metric_chunk_fn(x) -> [B, M, CH]`` computes the align metric for one
    anchor chunk; a lax.scan carries the running top-k (values, global idx).
    Tie-breaking matches ``lax.top_k`` over the dense axis exactly: the carry
    (earlier chunks, ordered value-desc then global-index-asc by induction)
    precedes the current chunk's candidates in the merge concat, and within a
    chunk the two-level selection preserves (sub-chunk, rank) = index order —
    so equal values always resolve to the lowest global index, like the dense
    :func:`_exact_topk_idx`.
    """
    def body(carry, x):
        vals, idx = carry
        off, *xi = x
        al = metric_chunk_fn(*xi)  # [B, M, CH]
        CH = al.shape[-1]
        k1 = min(topk, 128)
        v1, i1 = jax.lax.top_k(al.reshape(B, M, CH // 128, 128), k1)
        gi = (jnp.arange(CH // 128, dtype=jnp.int32)[:, None] * 128 + i1
              ).reshape(B, M, -1) + off
        cat_v = jnp.concatenate([vals, v1.reshape(B, M, -1)], axis=-1)
        cat_i = jnp.concatenate([idx, gi], axis=-1)
        nv, sel = jax.lax.top_k(cat_v, topk)
        ni = jnp.take_along_axis(cat_i, sel, axis=-1)
        return (nv, ni), None

    init = (jnp.full((B, M, topk), -jnp.inf, mdt),
            jnp.zeros((B, M, topk), jnp.int32))
    (_, idx), _ = jax.lax.scan(body, init, xs)
    return idx


def _assigner_sparse(
    pd_scores: jnp.ndarray,
    pd_bboxes: jnp.ndarray,
    anc_points: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    mask_gt: jnp.ndarray,
    cand_fn,
    overlaps_fn,
    num_classes: int,
    topk: int,
    alpha: float,
    beta: float,
    eps: float,
    bf16_metric: bool,
) -> AssignResult:
    """Sparse TAL: chunk-scan top-k, then resolve on the <= M*topk selected
    anchors only.

    Output-equivalent to the dense ``_assigner_jit`` chain (bitwise, including
    top-k/argmax tie order and the reference's index-0 quirks — see
    tests/test_losses.py), but the dense [B, M, A] intermediates (~66 MB each
    at b24/M=64/A=21504, many passes of the train profile's loop-fusion
    bucket) never materialize: phase A streams the metric through a lax.scan
    keeping only a [B, M, k] top-k carry, and phase B recomputes
    overlaps/metrics at the selected anchors ([B, M, M*k] — 33x smaller) and
    scatters per-anchor results into [B, A] maps. Reference semantics:
    ultralytics/utils/tal.py:58-296.
    """
    B, A, nc = pd_scores.shape
    M = gt_bboxes.shape[1]
    D = pd_bboxes.shape[-1]
    # Static invariants the padding construction relies on (trace-time):
    #  * topk <= A — fewer anchors than picks would select padding;
    #  * the -1e9 pad sentinel for anchor points must lie outside every gt,
    #    which holds for any pixel-coordinate gt (coords >= 0 by domain);
    #    padded pd_bboxes rows are only ever read under the where-mask.
    assert topk <= A, f"sparse TAL needs topk ({topk}) <= num anchors ({A})"
    mdt = jnp.bfloat16 if bf16_metric else jnp.float32
    prec = None if bf16_metric else jax.lax.Precision.HIGHEST
    gt_lab = jnp.clip(gt_labels.astype(jnp.int32), 0, nc - 1)
    lab_oh = jax.nn.one_hot(gt_lab, nc, dtype=mdt)  # [B, M, nc]

    def chunk_metric(anc, sc, pb):
        # anc [CH, 2], sc [B, CH, nc], pb [B, CH, D] -> align metric [B, M, CH]
        msk = cand_fn(anc[None, None], gt_bboxes) & mask_gt[..., None]
        s_gt = jnp.einsum("bmn,ban->bma", lab_oh, sc.astype(mdt), precision=prec)
        bs = jnp.where(msk, s_gt, jnp.asarray(0.0, mdt))
        ov = jnp.where(msk,
                       overlaps_fn(gt_bboxes[:, :, None, :],
                                   pb[:, None, :, :]).astype(mdt),
                       jnp.asarray(0.0, mdt))
        return bs**alpha * ov**beta

    # ----- phase A: top-k indices via chunked scan ---------------------------
    # ~8 scan steps; chunk a multiple of 128 so the in-chunk two-level top-k
    # tie order equals index order. Padded anchors sit at (-1e9, -1e9) (never
    # inside a gt -> metric 0) at indices >= A, so real anchors always win
    # ties — exactly the dense behavior where padding is -inf.
    CH = 128 * max(1, -(-A // (128 * 8)))
    Ap = -(-A // CH) * CH
    pad = Ap - A
    anc_p = jnp.pad(anc_points, ((0, pad), (0, 0)), constant_values=-1e9)
    sc_p = jnp.pad(pd_scores, ((0, 0), (0, pad), (0, 0)))
    pb_p = jnp.pad(pd_bboxes, ((0, 0), (0, pad), (0, 0)))
    nst = Ap // CH
    xs = (jnp.arange(nst, dtype=jnp.int32) * CH,
          anc_p.reshape(nst, CH, 2),
          sc_p.reshape(B, nst, CH, nc).transpose(1, 0, 2, 3),
          pb_p.reshape(B, nst, CH, D).transpose(1, 0, 2, 3))
    idx = _scan_topk_idx(chunk_metric, B, M, A, topk, xs, mdt)  # [B, M, k]

    # ----- phase B: sparse resolution on the selected anchors ----------------
    S = M * topk
    sel = idx.reshape(B, S)  # global anchor ids (always < A: metric >= 0 at
    #                          real anchors beats 0-valued padding on index)
    ap_sel = anc_points[sel]                                        # [B, S, 2]
    pb_sel = jnp.take_along_axis(pd_bboxes, sel[..., None], axis=1)  # [B, S, D]
    ps_sel = jnp.take_along_axis(pd_scores, sel[..., None], axis=1)  # [B, S, nc]

    in_sel = cand_fn(ap_sel[:, None], gt_bboxes)                    # [B, M, S]
    msk_sel = in_sel & mask_gt[..., None]
    s_gt = jnp.einsum("bmn,bsn->bms", lab_oh, ps_sel.astype(mdt), precision=prec)
    bs_sel = jnp.where(msk_sel, s_gt, jnp.asarray(0.0, mdt))
    ov_sel = jnp.where(msk_sel,
                       overlaps_fn(gt_bboxes[:, :, None, :],
                                   pb_sel[:, None, :, :]).astype(mdt),
                       jnp.asarray(0.0, mdt))
    al_sel = bs_sel**alpha * ov_sel**beta                           # [B, M, S]

    # own-pick activity per column (column s belongs to gt m_col = s // topk);
    # reproduces mask_pos = mask_topk * mask_in_gts * mask_gt at the picks
    # (incl. the k==1 index-0 quirk: mask_gt zeroes invalid rows either way).
    m_col = jnp.repeat(jnp.arange(M, dtype=jnp.int32), topk)        # [S]
    col = jnp.arange(S, dtype=jnp.int32)
    pre = msk_sel[:, m_col, col]                                    # [B, S]

    bi = jnp.arange(B, dtype=jnp.int32)[:, None]
    fg_cnt = jnp.zeros((B, A), jnp.int32).at[bi, sel].add(pre.astype(jnp.int32))
    multi = jnp.take_along_axis(fg_cnt, sel, axis=1) > 1            # [B, S]
    m_star = ov_sel.argmax(axis=1).astype(jnp.int32)                # [B, S]
    # assigned gt per column; M = "inactive" sentinel (tal.py:277-296)
    active_m = jnp.where(multi, m_star,
                         jnp.where(pre, m_col[None], jnp.int32(M)))
    a_col = jnp.minimum(active_m, M - 1)

    tgt = jnp.full((B, A), M, jnp.int32).at[bi, sel].min(active_m)
    fg_mask = tgt < M
    target_gt_idx = jnp.where(fg_mask, tgt, 0)

    # targets: scatter the assigned gt's label/box at each active anchor;
    # inactive anchors keep gt 0's data like the dense argmax-of-zeros fill
    lab_col = jnp.take_along_axis(gt_lab, a_col, axis=1)            # [B, S]
    lab_img = jnp.full((B, A), jnp.iinfo(jnp.int32).max, jnp.int32
                       ).at[bi, sel].min(jnp.where(active_m < M, lab_col,
                                                   jnp.iinfo(jnp.int32).max))
    target_labels = jnp.where(fg_mask, lab_img, gt_lab[:, :1])
    box_col = jnp.take_along_axis(gt_bboxes, a_col[..., None], axis=1)  # [B,S,D]
    box_img = jnp.full((B, A, D), jnp.inf, jnp.float32
                       ).at[bi, sel].min(jnp.where((active_m < M)[..., None],
                                                   box_col, jnp.inf))
    target_bboxes = jnp.where(fg_mask[..., None], box_img, gt_bboxes[:, :1])
    target_scores = jax.nn.one_hot(target_labels, num_classes, dtype=jnp.float32)
    target_scores = target_scores * fg_mask[..., None]

    # normalize (tal.py:117-125): per-gt maxima over its assigned anchors
    act3 = jnp.arange(M, dtype=jnp.int32)[None, :, None] == active_m[:, None, :]
    pos_align = jnp.where(act3, al_sel, jnp.asarray(0.0, mdt)).max(-1)   # [B, M]
    pos_overlap = jnp.where(act3, ov_sel, jnp.asarray(0.0, mdt)).max(-1)
    po_col = jnp.take_along_axis(pos_overlap, a_col, axis=1)
    pa_col = jnp.take_along_axis(pos_align, a_col, axis=1)
    al_col = jnp.take_along_axis(al_sel, a_col[:, None, :], axis=1)[:, 0]
    norm_col = jnp.where(active_m < M,
                         al_col * po_col / (pa_col + eps),
                         jnp.asarray(0.0, mdt))
    norm = jnp.zeros((B, A), mdt).at[bi, sel].max(norm_col)
    target_scores = target_scores * norm.astype(jnp.float32)[..., None]

    return AssignResult(target_labels, target_bboxes, target_scores, fg_mask,
                        target_gt_idx)
