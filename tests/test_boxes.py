"""NMS correctness: the iterated fixed-point NMS must equal sequential greedy
(torchvision.ops.nms semantics, the reference detect path ops.py:181-333)."""

import numpy as np
import jax.numpy as jnp

from quan_ultralytics_tpu.ops.boxes import bbox_iou, nms_axis_aligned


def greedy_nms_ref(boxes: np.ndarray, scores: np.ndarray, thr: float) -> np.ndarray:
    """Sequential greedy NMS (torchvision semantics), O(n^2) numpy oracle."""
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), dtype=bool)
    for i in order:
        ok = True
        for j in np.nonzero(keep)[0]:
            # iou(i, j) — every kept j was processed earlier (score >= ours)
            x1 = max(boxes[i, 0], boxes[j, 0]); y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2]); y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / (a_i + a_j - inter + 1e-7)
            if iou >= thr:
                ok = False
                break
        keep[i] = ok
    return keep


def _random_boxes(n, rng, crowd=30.0):
    ctr = rng.rand(n, 2) * crowd  # small arena -> heavy overlap -> deep chains
    wh = 5.0 + rng.rand(n, 2) * 20.0
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=-1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


def test_nms_matches_sequential_greedy_crowded():
    rng = np.random.RandomState(0)
    for trial in range(8):
        boxes, scores = _random_boxes(64, rng)
        for thr in (0.45, 0.7):
            ref = greedy_nms_ref(boxes, scores, thr)
            got = np.asarray(nms_axis_aligned(jnp.asarray(boxes), jnp.asarray(scores), thr))
            np.testing.assert_array_equal(got, ref, err_msg=f"trial={trial} thr={thr}")


def test_nms_suppression_chain():
    """A score-descending chain a>b>c where a kills b and b kills c but a
    does NOT kill c: greedy keeps {a, c}; one-shot fast-NMS would keep {a}."""
    boxes = np.array([
        [0.0, 0.0, 10.0, 10.0],   # a
        [6.0, 0.0, 16.0, 10.0],   # b: iou(a,b)=4/16=0.25... widen overlap
        [12.0, 0.0, 22.0, 10.0],  # c: overlaps b, not a
    ], dtype=np.float32)
    # make a-b and b-c overlaps exceed thr=0.3: iou(a,b) = 4/16 = 0.25 -> shift
    boxes[1] = [5.0, 0.0, 15.0, 10.0]   # iou(a,b) = 5/15 = 0.333
    boxes[2] = [10.0, 0.0, 20.0, 10.0]  # iou(b,c) = 5/15 = 0.333, iou(a,c)=0
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    keep = np.asarray(nms_axis_aligned(jnp.asarray(boxes), jnp.asarray(scores), 0.3))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_bbox_iou_basic():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 0.0, 15.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(bbox_iou(a[:, None, :], b[None, :, :], xywh=False))[0]
    np.testing.assert_allclose(iou, [1.0, 1.0 / 3.0, 0.0], atol=1e-5)


def test_nms_rotated_bd_domain_matches_probiou_threshold():
    """nms_rotated thresholds in the Bhattacharyya-distance domain
    (_probiou_pairs_over); the keep mask must equal the direct
    probiou-matrix fast-NMS it replaces (monotone-transform equivalence)."""
    from quan_ultralytics_tpu.ops.boxes import batch_probiou, nms_rotated

    rng = np.random.RandomState(7)
    for trial in range(6):
        n = 96
        ctr = rng.rand(n, 2) * 40.0
        wh = 5.0 + rng.rand(n, 2) * 25.0
        ang = (rng.rand(n, 1) - 0.5) * np.pi
        boxes = np.concatenate([ctr, wh, ang], axis=-1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        for thr in (0.3, 0.45, 0.7):
            got = np.asarray(nms_rotated(jnp.asarray(boxes), jnp.asarray(scores), thr))
            # oracle: one-shot fast-NMS on the actual probiou matrix
            order = np.argsort(-scores)
            b = jnp.asarray(boxes[order])
            ious = np.asarray(batch_probiou(b, b))
            upper = np.triu(np.ones((n, n), dtype=bool), k=1)
            suppressed = ((ious >= thr) & upper).any(axis=0)
            ref = np.zeros(n, dtype=bool)
            ref[order] = ~suppressed
            np.testing.assert_array_equal(got, ref, err_msg=f"trial={trial} thr={thr}")
