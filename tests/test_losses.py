"""Assigner + loss tests: behavioral checks and gradient sanity."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from quan_ultralytics_tpu.losses.tal import task_aligned_assigner
from quan_ultralytics_tpu.losses.detect import (
    LossHyp,
    _angle_to_quaternion,
    detection_loss,
    obb_loss,
    quaternion_angular_loss,
)
from quan_ultralytics_tpu.ops.boxes import make_anchors


def test_quaternion_angular_loss_geodesic():
    """2*arccos(|<q1,q2>|) == |dtheta| for z-rotations, incl. double cover."""
    for d in [0.0, 0.3, 1.0, math.pi / 2]:
        q1 = _angle_to_quaternion(jnp.array([[0.0]]))
        q2 = _angle_to_quaternion(jnp.array([[d]]))
        got = float(quaternion_angular_loss(q1, q2)[0])
        assert abs(got - d) < 2e-3, (d, got)
    # double cover: theta and theta + 2*pi are the same rotation
    q1 = _angle_to_quaternion(jnp.array([[0.1]]))
    q2 = _angle_to_quaternion(jnp.array([[0.1 + 2 * math.pi]]))
    assert float(quaternion_angular_loss(q1, q2)[0]) < 2e-3


def _toy_assigner_inputs(rotated=False):
    A_shapes = [(8, 8)]
    anchors, stride_t = make_anchors(A_shapes, [8], 0.5)
    anc_pix = anchors * stride_t
    A = anchors.shape[0]
    nc, M, B = 3, 4, 1
    # one gt box centered at (32, 32) of size 24x24 pixels
    if rotated:
        gt = np.zeros((B, M, 5), np.float32)
        gt[0, 0] = [32, 32, 24, 24, 0.3]
    else:
        gt = np.zeros((B, M, 4), np.float32)
        gt[0, 0] = [20, 20, 44, 44]  # xyxy
    labels = np.zeros((B, M), np.int32)
    labels[0, 0] = 2
    mask = np.zeros((B, M), bool)
    mask[0, 0] = True
    # predictions: boxes exactly on gt near its center anchors
    pd_scores = np.full((B, A, nc), 0.3, np.float32)
    if rotated:
        pd_boxes = np.tile(gt[0, 0], (B, A, 1)).astype(np.float32)
    else:
        pd_boxes = np.tile(gt[0, 0], (B, A, 1)).astype(np.float32)
    return pd_scores, pd_boxes, anc_pix, labels, gt, mask, nc


def test_assigner_axis_aligned_basic():
    pd_scores, pd_boxes, anc, labels, gt, mask, nc = _toy_assigner_inputs()
    res = task_aligned_assigner(
        jnp.asarray(pd_scores), jnp.asarray(pd_boxes), anc,
        jnp.asarray(labels), jnp.asarray(gt), jnp.asarray(mask),
        num_classes=nc,
    )
    fg = np.asarray(res.fg_mask)[0]
    assert fg.sum() > 0, "no anchors assigned"
    # assigned anchors must lie inside the gt box
    pts = np.asarray(anc)
    inside = (pts[:, 0] > 20) & (pts[:, 0] < 44) & (pts[:, 1] > 20) & (pts[:, 1] < 44)
    assert (fg <= inside).all(), "assigned anchor outside gt"
    labs = np.asarray(res.target_labels)[0]
    assert (labs[fg] == 2).all()
    ts = np.asarray(res.target_scores)[0]
    assert ts[fg, 2].max() > 0.5  # normalized by best alignment -> ~iou
    assert ts[~fg].sum() == 0


def test_assigner_rotated_basic():
    pd_scores, pd_boxes, anc, labels, gt, mask, nc = _toy_assigner_inputs(rotated=True)
    res = task_aligned_assigner(
        jnp.asarray(pd_scores), jnp.asarray(pd_boxes), anc,
        jnp.asarray(labels), jnp.asarray(gt), jnp.asarray(mask),
        num_classes=nc, rotated=True,
    )
    fg = np.asarray(res.fg_mask)[0]
    assert fg.sum() > 0
    assert (np.asarray(res.target_labels)[0][fg] == 2).all()


def test_assigner_empty_gt():
    pd_scores, pd_boxes, anc, labels, gt, mask, nc = _toy_assigner_inputs()
    mask[:] = False
    res = task_aligned_assigner(
        jnp.asarray(pd_scores), jnp.asarray(pd_boxes), anc,
        jnp.asarray(labels), jnp.asarray(gt), jnp.asarray(mask),
        num_classes=nc,
    )
    assert np.asarray(res.fg_mask).sum() == 0
    assert np.asarray(res.target_scores).sum() == 0


def _fake_feats(B=2, nc=15, reg_max=16, sizes=((8, 8), (4, 4), (2, 2)), rng=None):
    rng = rng or np.random.default_rng(0)
    return [
        jnp.asarray(rng.normal(size=(B, h, w, 4 * reg_max + nc)).astype(np.float32))
        for h, w in sizes
    ]


def _fake_batch_obb(B=2, M=8):
    rng = np.random.default_rng(1)
    boxes = np.zeros((B, M, 5), np.float32)
    mask = np.zeros((B, M), bool)
    cls = np.zeros((B, M), np.int32)
    for b in range(B):
        n = 3
        boxes[b, :n, :2] = rng.uniform(0.3, 0.7, (n, 2))
        boxes[b, :n, 2:4] = rng.uniform(0.2, 0.4, (n, 2))
        boxes[b, :n, 4] = rng.uniform(-0.5, 1.5, n)
        cls[b, :n] = rng.integers(0, 15, n)
        mask[b, :n] = True
    return {"bboxes": jnp.asarray(boxes), "cls": jnp.asarray(cls), "mask": jnp.asarray(mask)}


def test_detection_loss_finite_and_differentiable():
    feats = _fake_feats()
    batch = _fake_batch_obb()
    batch = {**batch, "bboxes": batch["bboxes"][..., :4]}

    def f(feats):
        total, aux = detection_loss(feats, batch, (8, 16, 32), nc=15)
        return total

    total = f(feats)
    assert np.isfinite(float(total))
    grads = jax.grad(lambda fs: f(fs))(feats)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_obb_loss_finite_and_differentiable():
    nc, reg_max = 15, 16
    feats = _fake_feats(nc=nc)
    rng = np.random.default_rng(3)
    angles = [jnp.asarray(rng.uniform(-0.7, 2.3, (2, h, w, 1)).astype(np.float32))
              for h, w in ((8, 8), (4, 4), (2, 2))]
    batch = _fake_batch_obb()

    def f(feats, angles):
        total, aux = obb_loss((feats, angles), batch, (8, 16, 32), nc=nc)
        return total

    total = f(feats, angles)
    assert np.isfinite(float(total))
    gf, ga = jax.grad(f, argnums=(0, 1))(feats, angles)
    for g in list(gf) + list(ga):
        assert np.isfinite(np.asarray(g)).all()


def test_obb_loss_empty_gt_finite():
    nc = 15
    feats = _fake_feats(nc=nc)
    angles = [jnp.zeros((2, h, w, 1)) for h, w in ((8, 8), (4, 4), (2, 2))]
    batch = _fake_batch_obb()
    batch = {**batch, "mask": jnp.zeros_like(batch["mask"])}
    total, aux = obb_loss((feats, angles), batch, (8, 16, 32), nc=nc)
    assert np.isfinite(float(total))
    g = jax.grad(lambda fs: obb_loss((fs, angles), batch, (8, 16, 32), nc=nc)[0])(feats)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()


def test_select_topk_mask_scatter_matches_onehot_oracle():
    """_select_topk_mask scatters valid_gt with a max combiner; it must equal
    the reference semantics (one_hot(idx).sum with the count>1 drop and the
    invalid-row index-0 collision quirk) for every (valid pattern, k)."""
    from quan_ultralytics_tpu.losses.tal import _exact_topk_idx, _select_topk_mask

    rng = np.random.RandomState(11)
    B, M, A = 2, 5, 700  # A > 4*chunk exercises the chunked top-k path
    metrics = jnp.asarray(rng.rand(B, M, A).astype(np.float32))
    # ties: duplicate a few columns so tie-breaking is exercised
    metrics = metrics.at[..., 100:110].set(metrics[..., 0:10])
    for k in (1, 2, 10):
        for pattern in range(3):
            valid = rng.rand(B, M) > (0.0, 0.5, 1.1)[pattern]  # all/some/none
            valid_gt = jnp.asarray(valid)
            got = np.asarray(_select_topk_mask(metrics, k, valid_gt))
            # oracle: literal reference semantics
            idx = np.asarray(_exact_topk_idx(metrics, k))
            idx = np.where(valid[..., None], idx, 0)
            count = np.zeros((B, M, A), np.int64)
            for b in range(B):
                for m in range(M):
                    np.add.at(count[b, m], idx[b, m], 1)
            ref = np.where(count > 1, 0, count).astype(np.float32)
            np.testing.assert_array_equal(got, ref, err_msg=f"k={k} pattern={pattern}")


def test_assigner_bf16_metric_matches_f32_selection():
    """bf16_metric=True (QUAN_ASSIGNER_BF16): same selection and close
    normalized scores on a well-separated case; outputs stay f32."""
    pd_scores, pd_boxes, anc, labels, gt, mask, nc = _toy_assigner_inputs()
    args = (jnp.asarray(pd_scores), jnp.asarray(pd_boxes), anc,
            jnp.asarray(labels), jnp.asarray(gt), jnp.asarray(mask))
    r32 = task_aligned_assigner(*args, num_classes=nc, bf16_metric=False)
    r16 = task_aligned_assigner(*args, num_classes=nc, bf16_metric=True)
    assert r16.target_scores.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(r16.fg_mask), np.asarray(r32.fg_mask))
    np.testing.assert_array_equal(np.asarray(r16.target_labels)[np.asarray(r32.fg_mask)],
                                  np.asarray(r32.target_labels)[np.asarray(r32.fg_mask)])
    np.testing.assert_allclose(np.asarray(r16.target_scores),
                               np.asarray(r32.target_scores), rtol=0.05, atol=5e-3)

    # rotated path too
    pd_scores, pd_boxes, anc, labels, gt, mask, nc = _toy_assigner_inputs(rotated=True)
    args = (jnp.asarray(pd_scores), jnp.asarray(pd_boxes), anc,
            jnp.asarray(labels), jnp.asarray(gt), jnp.asarray(mask))
    r32 = task_aligned_assigner(*args, num_classes=nc, rotated=True, bf16_metric=False)
    r16 = task_aligned_assigner(*args, num_classes=nc, rotated=True, bf16_metric=True)
    np.testing.assert_array_equal(np.asarray(r16.fg_mask), np.asarray(r32.fg_mask))
    np.testing.assert_allclose(np.asarray(r16.target_scores),
                               np.asarray(r32.target_scores), rtol=0.05, atol=5e-3)


def test_assigner_bf16_rotated_thin_boxes_no_nan():
    """Regression: thin near-parallel rotated boxes made the textbook
    probiou den go negative in bf16 (log -> NaN through the whole
    assignment); the bf16 path now uses the cancellation-free den."""
    from quan_ultralytics_tpu.ops.boxes import probiou

    g = jnp.asarray([[361.3, 459.8, 117.9, 4.54, 0.77]], jnp.float32)
    p = jnp.asarray([[354.5, 461.9, 120.2, 4.76, 0.77]], jnp.float32)
    ref = float(probiou(g, p)[0])
    got = float(probiou(g.astype(jnp.bfloat16), p.astype(jnp.bfloat16))[0])
    assert np.isfinite(got), "bf16 probiou NaN on thin rotated boxes"
    assert abs(got - ref) < 0.15, f"bf16 probiou far off: {got} vs {ref}"

    # bulk: random thin boxes must produce zero NaNs and stay correlated
    rng = np.random.default_rng(3)
    n = 2000
    w = rng.uniform(50, 150, n).astype(np.float32)
    h = rng.uniform(2, 6, n).astype(np.float32)
    ang = rng.uniform(-1.5, 1.5, n).astype(np.float32)
    b1 = np.stack([rng.uniform(100, 900, n), rng.uniform(100, 900, n), w, h, ang], 1)
    b2 = b1 + rng.normal(0, 3, b1.shape).astype(np.float32) * [1, 1, 1, 0.1, 0.01]
    r32 = np.asarray(probiou(jnp.asarray(b1), jnp.asarray(b2)))
    r16 = np.asarray(probiou(jnp.asarray(b1, jnp.bfloat16),
                             jnp.asarray(b2, jnp.bfloat16))).astype(np.float32)
    assert np.isfinite(r16).all(), f"{(~np.isfinite(r16)).sum()} NaNs"
    # thin boxes are input-rounding-limited in bf16 (the covariance terms
    # carry w^2); the contract for bf16 INPUTS is finite + correlated.
    # (The assigner itself no longer feeds probiou bf16 inputs — it keeps
    # the IoU math f32 and casts only the [B,M,A] output.)
    assert np.corrcoef(r16, r32)[0, 1] > 0.6

    # end-to-end: the rotated assigner with bf16 metric gives finite scores
    pd_scores, pd_boxes, anc, labels, gt, mask, nc = _toy_assigner_inputs(rotated=True)
    gt[0, 0] = [32, 32, 40, 2.5, 0.77]  # thin rotated gt
    pd_boxes[:] = gt[0, 0]
    res = task_aligned_assigner(
        jnp.asarray(pd_scores), jnp.asarray(pd_boxes), anc,
        jnp.asarray(labels), jnp.asarray(gt), jnp.asarray(mask),
        num_classes=nc, rotated=True, bf16_metric=True)
    assert np.isfinite(np.asarray(res.target_scores)).all()


# ---------------------------------------------------------------------------
# Sparse assigner (scan top-k + scatter resolution, losses/tal.py:_assigner_
# sparse) must be BITWISE equal to the dense [B, M, A] chain — including
# top-k/argmax tie order and the reference's index-0 quirks.
# ---------------------------------------------------------------------------

def _rand_assigner_case(seed, imgsz, B=3, M=8, nc=7, rotated=False,
                        tie_heavy=False, n_valid=None):
    rng = np.random.default_rng(seed)
    shapes = [(imgsz // s, imgsz // s) for s in (8, 16, 32)]
    anchors, stride_t = make_anchors(shapes, [8, 16, 32], 0.5)
    anc_pix = np.asarray(anchors * stride_t)
    A = anc_pix.shape[0]
    pd_scores = rng.uniform(0, 1, (B, A, nc)).astype(np.float32)
    ctr = rng.uniform(0, imgsz, (B, A, 2)).astype(np.float32)
    wh = rng.uniform(4, imgsz / 2, (B, A, 2)).astype(np.float32)
    if rotated:
        ang = rng.uniform(-1.5, 1.5, (B, A, 1)).astype(np.float32)
        pd_boxes = np.concatenate([ctr, wh, ang], -1)
    else:
        pd_boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1)
    gctr = rng.uniform(imgsz * 0.2, imgsz * 0.8, (B, M, 2)).astype(np.float32)
    gwh = rng.uniform(8, imgsz / 2, (B, M, 2)).astype(np.float32)
    if rotated:
        gang = rng.uniform(-1.5, 1.5, (B, M, 1)).astype(np.float32)
        gt = np.concatenate([gctr, gwh, gang], -1)
    else:
        gt = np.concatenate([gctr - gwh / 2, gctr + gwh / 2], -1)
    if tie_heavy:
        # identical predicted boxes + 2-level scores -> many exact metric
        # ties, exercising the lowest-global-index tie-breaking path
        pd_boxes = np.tile(pd_boxes[:, :1], (1, A, 1))
        pd_scores = np.where(pd_scores > 0.5, 0.5, 0.25).astype(np.float32)
    labels = rng.integers(0, nc, (B, M)).astype(np.int32)
    mask = np.zeros((B, M), bool)
    for b in range(B):
        nv = int(rng.integers(0, M + 1)) if n_valid is None else n_valid
        mask[b, :nv] = True
    return (jnp.asarray(pd_scores), jnp.asarray(pd_boxes),
            jnp.asarray(anc_pix), jnp.asarray(labels), jnp.asarray(gt),
            jnp.asarray(mask))


def _assert_assigner_impls_equal(args, nc=7, **kw):
    from quan_ultralytics_tpu.losses.tal import AssignResult

    d = task_aligned_assigner(*args, num_classes=nc, impl="dense", **kw)
    s = task_aligned_assigner(*args, num_classes=nc, impl="sparse", **kw)
    for name in AssignResult._fields:
        dv, sv = np.asarray(getattr(d, name)), np.asarray(getattr(s, name))
        assert dv.dtype == sv.dtype, (name, dv.dtype, sv.dtype)
        if not np.array_equal(dv, sv):
            bad = np.argwhere(dv != sv)
            raise AssertionError(
                f"{name}: {bad.shape[0]} mismatches, first at {bad[0]}: "
                f"dense={dv[tuple(bad[0])]} sparse={sv[tuple(bad[0])]}")


def test_assigner_sparse_matches_dense_axis_aligned():
    _assert_assigner_impls_equal(_rand_assigner_case(0, 256))


def test_assigner_sparse_matches_dense_rotated():
    _assert_assigner_impls_equal(_rand_assigner_case(1, 128, rotated=True),
                                 rotated=True)


def test_assigner_sparse_matches_dense_bf16_metric():
    _assert_assigner_impls_equal(_rand_assigner_case(2, 256), bf16_metric=True)
    _assert_assigner_impls_equal(_rand_assigner_case(3, 128, rotated=True),
                                 rotated=True, bf16_metric=True)


def test_assigner_sparse_matches_dense_tie_heavy():
    _assert_assigner_impls_equal(_rand_assigner_case(4, 256, tie_heavy=True))
    _assert_assigner_impls_equal(
        _rand_assigner_case(5, 128, rotated=True, tie_heavy=True), rotated=True)


def test_assigner_sparse_matches_dense_edge_cases():
    # empty gt, all-valid gt, topk=1, multi-chunk scan (A=5376 -> CH=768)
    _assert_assigner_impls_equal(_rand_assigner_case(6, 128, n_valid=0))
    _assert_assigner_impls_equal(_rand_assigner_case(7, 128, n_valid=8))
    _assert_assigner_impls_equal(_rand_assigner_case(8, 128), topk=1)
    _assert_assigner_impls_equal(_rand_assigner_case(9, 512, B=2))


def test_obb_loss_sparse_assigner_matches_dense(monkeypatch):
    """End-to-end through obb_loss: value and grads identical."""
    nc = 15
    feats = _fake_feats(nc=nc)
    rng = np.random.default_rng(3)
    angles = [jnp.asarray(rng.uniform(-0.7, 2.3, (2, h, w, 1)).astype(np.float32))
              for h, w in ((8, 8), (4, 4), (2, 2))]
    batch = _fake_batch_obb()

    def f(fs, impl):
        monkeypatch.setenv("QUAN_ASSIGNER_IMPL", impl)
        total, aux = obb_loss((fs, angles), batch, (8, 16, 32), nc=nc)
        return total

    assert np.array_equal(np.asarray(f(feats, "dense")),
                          np.asarray(f(feats, "sparse")))
    gd = jax.grad(lambda fs: f(fs, "dense"))(feats)
    gs = jax.grad(lambda fs: f(fs, "sparse"))(feats)
    for a, b in zip(gd, gs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_iter_topk_matches_lax_topk_bitwise():
    """_iter_topk_idx must equal lax.top_k indices exactly — values, order,
    and tie-breaking (lowest index among equals) — on random, tie-heavy,
    all-zero (invalid-row) and bf16 metrics."""
    import jax
    from quan_ultralytics_tpu.losses.tal import _iter_topk_idx

    rng = np.random.default_rng(11)
    cases = [
        rng.uniform(0, 1, (2, 5, 300)).astype(np.float32),
        np.round(rng.uniform(0, 1, (2, 5, 300)) * 4) / 4,  # heavy ties
        np.zeros((2, 5, 300), np.float32),  # invalid-row pattern
    ]
    cases.append(cases[0].astype(jnp.bfloat16))
    for m in cases:
        m = jnp.asarray(m)
        for k in (1, 10, 13):
            _, want = jax.lax.top_k(m, k)
            got = _iter_topk_idx(m, k)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_assigner_topk_impl_equivalence(monkeypatch):
    """Full assigner output identical under QUAN_TOPK_IMPL=iter vs chunk."""
    from quan_ultralytics_tpu.losses.tal import AssignResult

    args = _rand_assigner_case(12, 256)
    outs = []
    for impl in ("chunk", "iter"):
        monkeypatch.setenv("QUAN_TOPK_IMPL", impl)
        # resolved into a static jit arg, so no cache clearing is needed
        outs.append(task_aligned_assigner(*args, num_classes=7))
    for name in AssignResult._fields:
        np.testing.assert_array_equal(np.asarray(getattr(outs[0], name)),
                                      np.asarray(getattr(outs[1], name)))
