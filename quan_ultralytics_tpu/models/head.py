"""Detection heads: QER extraction, Detect, OBB, Classify.

Reference: ultralytics/nn/modules/head.py. The heads return raw per-level
feature maps (training targets); decoding to boxes is a separate pure
function (`decode_detect` / `decode_obb`) shared by the loss and the
predictor — idiomatic JAX instead of the reference's `self.training`
branching (head.py:137-147).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from quan_ultralytics_tpu.models.conv import Conv, DWConv
from quan_ultralytics_tpu.models.block import dfl
from quan_ultralytics_tpu.ops.boxes import dist2bbox, dist2rbox, make_anchors


class QER(nn.Module):
    """Quaternion-to-Real extraction (reference head.py:26-47): flatten the
    quaternion axis into channels and apply a real 1x1 (or kxk) conv that
    learns the optimal component mixing.

    ``c1`` counts flattened channels (C*4), like the reference.
    """

    c1: int
    c2: int
    k: int = 1
    bias_init_value: Optional[float] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, Q, C = x.shape
        assert Q * C == self.c1, f"QER expects {self.c1} flattened channels, got {Q * C}"
        x_flat = x.reshape(B, H, W, Q * C)
        bias_init = (
            nn.initializers.constant(self.bias_init_value)
            if self.bias_init_value is not None
            else nn.initializers.zeros
        )
        y = nn.Conv(
            self.c2,
            kernel_size=(self.k, self.k),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            bias_init=bias_init,
            name="proj",
        )(x_flat)
        return y  # [B, H, W, c2] — real-valued


class Detect(nn.Module):
    """YOLO detect head (reference head.py:87-260).

    Per level: box branch cv2 = Conv,Conv,QER -> 4*reg_max logits; class
    branch cv3 = (DWConv,Conv)x2,QER -> nc logits. Returns the per-level
    ``[B, H, W, 4*reg_max + nc]`` maps.

    Bias init (reference head.py:221-232): box QER bias = 1.0, cls QER bias =
    log(5 / nc / (640 / stride)^2).
    """

    nc: int
    ch: Tuple[int, ...]  # total quaternion channels per input level
    strides: Tuple[int, ...] = (8, 16, 32)
    reg_max: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        c2 = max(self.ch[0] // 2, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 256))
        outs = []
        for i, x in enumerate(xs):
            b = Conv(self.ch[i], c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            b = Conv(c2, c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            b = QER(c2, 4 * self.reg_max, 1, bias_init_value=1.0, dtype=self.dtype, name=f"cv2_{i}_2")(b)

            c = DWConv(self.ch[i], self.ch[i], 3, dtype=self.dtype, name=f"cv3_{i}_0a")(x, train)
            c = Conv(self.ch[i], c3, 1, dtype=self.dtype, name=f"cv3_{i}_0b")(c, train)
            c = DWConv(c3, c3, 3, dtype=self.dtype, name=f"cv3_{i}_1a")(c, train)
            c = Conv(c3, c3, 1, dtype=self.dtype, name=f"cv3_{i}_1b")(c, train)
            cls_bias = math.log(5 / self.nc / (640 / self.strides[i]) ** 2)
            c = QER(c3, self.nc, 1, bias_init_value=cls_bias, dtype=self.dtype, name=f"cv3_{i}_2")(c)

            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs


class QERPreserve(nn.Module):
    """Quaternion extraction with xavier-initialized learnable mixing
    (reference head.py:50-83). Same computation as QER, different init."""

    c1: int
    c2: int
    k: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, Q, C = x.shape
        assert Q * C == self.c1
        y = nn.Conv(
            self.c2, kernel_size=(self.k, self.k), use_bias=True,
            kernel_init=nn.initializers.xavier_normal(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=jnp.float32, name="mix",
        )(x.reshape(B, H, W, Q * C))
        return y


class HybridDetect(nn.Module):
    """Detect variant with a lighter cls path (reference head.py:287-320):
    quaternion backbone features, earlier QER extraction, narrower channels."""

    nc: int
    ch: Tuple[int, ...]
    strides: Tuple[int, ...] = (8, 16, 32)
    reg_max: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        c2 = max(self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(xs):
            b = Conv(self.ch[i], c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            b = Conv(c2, c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            b = QER(c2, 4 * self.reg_max, 1, bias_init_value=1.0, dtype=self.dtype, name=f"cv2_{i}_2")(b)
            c = Conv(self.ch[i], c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            cls_bias = math.log(5 / self.nc / (640 / self.strides[i]) ** 2)
            c = QER(c3, self.nc, 1, bias_init_value=cls_bias, dtype=self.dtype, name=f"cv3_{i}_1")(c)
            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs


class OBB(nn.Module):
    """Oriented-box head (reference head.py:322-354): Detect + an angle
    branch cv4 = Conv,Conv,QER -> ne theta logits, mapped to
    ``(sigmoid - 0.25) * pi`` in [-pi/4, 3pi/4] (head.py:343)."""

    nc: int
    ch: Tuple[int, ...]
    ne: int = 1
    strides: Tuple[int, ...] = (8, 16, 32)
    reg_max: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        c4 = max(self.ch[0] // 4, self.ne * 4)  # keep quaternion-divisible
        angles = []
        for i, x in enumerate(xs):
            a = Conv(self.ch[i], c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            a = Conv(c4, c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(a, train)
            a = QER(c4, self.ne, 1, dtype=self.dtype, name=f"cv4_{i}_2")(a)
            angles.append(a)  # [B, H, W, ne] raw logits
        feats = Detect(
            self.nc, self.ch, self.strides, self.reg_max, dtype=self.dtype, name="detect"
        )(xs, train)
        # angle transform applied here, like the reference forward (head.py:343)
        angles = [(jax.nn.sigmoid(a.astype(jnp.float32)) - 0.25) * math.pi for a in angles]
        return feats, angles


class Segment(nn.Module):
    """Instance-segmentation head (reference head.py:263-285): Detect + a
    Proto prototype generator on P3 + per-level mask-coefficient branches
    cv4 = Conv,Conv,QER -> nm coefficients. Returns
    ``(feats, mc_levels, proto)`` — proto ``[B, Hp, Wp, nm]`` real-valued,
    mc per level ``[B, H, W, nm]`` raw."""

    nc: int
    ch: Tuple[int, ...]
    nm: int = 32   # mask coefficients
    npr: int = 256  # proto channels (quaternion)
    strides: Tuple[int, ...] = (8, 16, 32)
    reg_max: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        from quan_ultralytics_tpu.models.block import Proto

        proto = Proto(self.ch[0], self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        c4 = max(self.ch[0] // 4, ((self.nm + 3) // 4) * 4)  # quaternion-divisible
        mc = []
        for i, x in enumerate(xs):
            m = Conv(self.ch[i], c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            m = Conv(c4, c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(m, train)
            mc.append(QER(c4, self.nm, 1, dtype=self.dtype, name=f"cv4_{i}_2")(m))
        feats = Detect(self.nc, self.ch, self.strides, self.reg_max,
                       dtype=self.dtype, name="detect")(xs, train)
        return feats, mc, proto


class Pose(nn.Module):
    """Keypoint head (reference head.py:357-392): Detect + per-level cv4 =
    Conv,Conv,QER -> nk*ndim raw keypoint maps. Returns ``(feats,
    kpt_levels)``; decoding to pixel space is `decode_pose` /
    `decode_kpts`."""

    nc: int
    ch: Tuple[int, ...]
    kpt_shape: Tuple[int, int] = (17, 3)
    strides: Tuple[int, ...] = (8, 16, 32)
    reg_max: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, ((nk + 3) // 4) * 4)
        kpts = []
        for i, x in enumerate(xs):
            k = Conv(self.ch[i], c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            k = Conv(c4, c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(k, train)
            kpts.append(QER(c4, nk, 1, dtype=self.dtype, name=f"cv4_{i}_2")(k))
        feats = Detect(self.nc, self.ch, self.strides, self.reg_max,
                       dtype=self.dtype, name="detect")(xs, train)
        return feats, kpts


def flatten_levels(feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """[B, H, W, C] per level -> [B, sum(H*W), C]."""
    B = feats[0].shape[0]
    return jnp.concatenate([f.reshape(B, -1, f.shape[-1]) for f in feats], axis=1)


def decode_detect(
    feats: Sequence[jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    reg_max: int = 16,
) -> jnp.ndarray:
    """Inference decode (reference head.py:191-219): DFL -> dist2bbox ->
    scale by strides, sigmoid class scores. Returns ``[B, A, 4 + nc]`` with
    xywh boxes in input-pixel units."""
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_t = make_anchors(shapes, strides, 0.5)
    x = flatten_levels(feats)
    box_logits, cls = x[..., : 4 * reg_max], x[..., 4 * reg_max :]
    dist = dfl(box_logits, reg_max)
    boxes = dist2bbox(dist, anchors[None], xywh=True) * stride_t[None]
    return jnp.concatenate([boxes, jax.nn.sigmoid(cls.astype(jnp.float32))], axis=-1)


def decode_obb(
    feats: Sequence[jnp.ndarray],
    angles: Sequence[jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    reg_max: int = 16,
) -> jnp.ndarray:
    """OBB inference decode (reference head.py:338-354): rotated dist decode
    with the predicted angle. Returns ``[B, A, 4 + nc + 1]`` =
    (xywh in pixels, class scores, angle in radians)."""
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    anchors, stride_t = make_anchors(shapes, strides, 0.5)
    x = flatten_levels(feats)
    ang = flatten_levels(angles)  # [B, A, ne]
    box_logits, cls = x[..., : 4 * reg_max], x[..., 4 * reg_max :]
    dist = dfl(box_logits, reg_max)
    boxes = dist2rbox(dist, ang, anchors[None]) * stride_t[None]
    return jnp.concatenate([boxes, jax.nn.sigmoid(cls.astype(jnp.float32)), ang], axis=-1)


def decode_segment(
    feats: Sequence[jnp.ndarray],
    mc: Sequence[jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    reg_max: int = 16,
) -> jnp.ndarray:
    """Segment decode (reference head.py:276-285): detect decode with the
    mask coefficients appended. Returns ``[B, A, 4 + nc + nm]``; combine with
    the proto via ``masks = sigmoid(mc @ proto)`` after NMS."""
    det = decode_detect(feats, strides, nc, reg_max)
    return jnp.concatenate([det, flatten_levels(mc)], axis=-1)


def decode_kpts(
    kpts: Sequence[jnp.ndarray],
    strides: Sequence[int],
    kpt_shape: Tuple[int, int],
) -> jnp.ndarray:
    """Keypoint decode (reference head.py:379-392 kpts_decode):
    xy = (raw * 2 + (anchor - 0.5)) * stride; visibility sigmoid.
    Returns ``[B, A, nk, ndim]`` in input-pixel units."""
    shapes = [(k.shape[1], k.shape[2]) for k in kpts]
    anchors, stride_t = make_anchors(shapes, strides, 0.5)
    x = flatten_levels(kpts)  # [B, A, nk*ndim]
    B, A, _ = x.shape
    nk, ndim = kpt_shape
    y = x.reshape(B, A, nk, ndim).astype(jnp.float32)
    xy = (y[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * stride_t[None, :, None, :]
    if ndim == 3:
        return jnp.concatenate([xy, jax.nn.sigmoid(y[..., 2:3])], axis=-1)
    return xy


def decode_pose(
    feats: Sequence[jnp.ndarray],
    kpts: Sequence[jnp.ndarray],
    strides: Sequence[int],
    nc: int,
    kpt_shape: Tuple[int, int] = (17, 3),
    reg_max: int = 16,
) -> jnp.ndarray:
    """Pose decode (reference head.py:369-377): detect decode with the
    decoded keypoints flattened on. Returns ``[B, A, 4 + nc + nk*ndim]``."""
    det = decode_detect(feats, strides, nc, reg_max)
    k = decode_kpts(kpts, strides, kpt_shape)
    B, A = k.shape[:2]
    return jnp.concatenate([det, k.reshape(B, A, -1)], axis=-1)


class Classify(nn.Module):
    """Classification head: Conv -> global pool -> linear over flattened
    quaternion features. (The reference Classify head, head.py:409-431,
    applies real pooling to a 5-D tensor and is effectively broken; this is
    the working equivalent — YOLO-cls parity lives in the classification
    stack, see quan_ultralytics_tpu/classification.)"""

    c1: int
    c2: int  # num classes
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = 1280
        x = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="conv")(x, train)
        x = x.mean(axis=(1, 2))  # [B, 4, C]
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.c2, param_dtype=jnp.float32, dtype=self.dtype, name="linear")(x)
