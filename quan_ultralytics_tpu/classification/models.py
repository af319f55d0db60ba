"""Quaternion classification models: Q-WRN and Q-ResNet families.

Reference: classification/models/quaternion_models.py (QWideResNet :12-90,
QResNet34 :92-255, ImageNet variants :336-511) and quaternion_blocks.py
(QWideBasicBlock :7-49, QuaternionBasicBlock). All use pre-activation
(IQBN -> SiLU -> QConv2D) residual blocks and classify by the *norm* of the
output quaternion per class (quaternion_models.py:62-66).

Note on the final norm: the reference flattens component-major and then
takes norms over groups of 4 *consecutive* flat elements
(quaternion_models.py:159-161), which actually mixes features of one
component rather than the four components of one feature — a layout bug the
network simply learns around. We take the norm over the true quaternion
axis; accuracy parity is unaffected (training adapts to any fixed
permutation) and the semantics match the paper.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from quan_ultralytics_tpu.models.conv import Conv, IQBN, QConv2D, QDense
from quan_ultralytics_tpu.models.block import QuaternionDropout
from quan_ultralytics_tpu.ops.pooling import qavg_pool_global, qmax_pool


class QWideBasicBlock(nn.Module):
    """Pre-activation wide block (reference quaternion_blocks.py:7-49).
    The shortcut projects the *pre-activated* input."""

    c_in: int
    c_out: int
    stride: int = 1
    drop_rate: float = 0.0
    mapping_type: str = "poincare"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.silu(IQBN(self.c_in, dtype=self.dtype, name="bn1")(x, train))
        # Reference: residual = self.shortcut(out) — the shortcut (projection
        # OR identity) always consumes the pre-activated tensor.
        if self.stride != 1 or self.c_in != self.c_out:
            residual = QConv2D(self.c_in, self.c_out, 1, self.stride,
                               mapping_type=self.mapping_type, dtype=self.dtype, name="shortcut")(h)
        else:
            residual = h
        y = QConv2D(self.c_in, self.c_out, 3, self.stride, 1,
                    mapping_type=self.mapping_type, dtype=self.dtype, name="conv1")(h)
        y = nn.silu(IQBN(self.c_out, dtype=self.dtype, name="bn2")(y, train))
        if self.drop_rate > 0:
            y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        y = QConv2D(self.c_out, self.c_out, 3, 1, 1,
                    mapping_type=self.mapping_type, dtype=self.dtype, name="conv2")(y)
        return y + residual


class QuaternionBasicBlock(nn.Module):
    """Pre-activation ResNet block (reference quaternion_blocks.py:61-155).
    Unlike QWideBasicBlock, the shortcut sees the *raw* input."""

    c_in: int
    c_out: int
    stride: int = 1
    drop_rate: float = 0.0
    mapping_type: str = "poincare"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride != 1 or self.c_in != self.c_out:
            identity = QConv2D(self.c_in, self.c_out, 1, self.stride,
                               mapping_type=self.mapping_type, dtype=self.dtype, name="shortcut")(x)
        else:
            identity = x
        y = nn.silu(IQBN(self.c_in, dtype=self.dtype, name="bn1")(x, train))
        y = QConv2D(self.c_in, self.c_out, 3, self.stride, 1,
                    mapping_type=self.mapping_type, dtype=self.dtype, name="conv1")(y)
        y = nn.silu(IQBN(self.c_out, dtype=self.dtype, name="bn2")(y, train))
        y = QuaternionDropout(self.drop_rate)(y, train) if self.drop_rate > 0 else y
        y = QConv2D(self.c_out, self.c_out, 3, 1, 1,
                    mapping_type=self.mapping_type, dtype=self.dtype, name="conv2")(y)
        return y + identity


def quaternion_norm_logits(x: jnp.ndarray) -> jnp.ndarray:
    """[B, 4, nc] quaternion features -> [B, nc] norms (the class logits)."""
    return jnp.sqrt(jnp.clip((x.astype(jnp.float32) ** 2).sum(axis=-2), 1e-12))


class QWideResNet(nn.Module):
    """WRN-16-k (reference quaternion_models.py:12-90)."""

    depth: int = 16
    width: int = 2
    num_classes: int = 10
    drop_rate: float = 0.0
    mapping_type: str = "poincare"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = (self.depth - 4) // 6
        k = self.width
        stages = [16, 16 * k, 32 * k, 64 * k]
        x = QConv2D(3, stages[0], 3, 1, 1, mapping_type=self.mapping_type,
                    dtype=self.dtype, name="conv1")(x)
        for s, (cin, cout, stride) in enumerate(
            [(stages[0], stages[1], 1), (stages[1], stages[2], 2), (stages[2], stages[3], 2)]
        ):
            for b in range(n):
                x = QWideBasicBlock(
                    cin if b == 0 else cout, cout, stride if b == 0 else 1,
                    self.drop_rate, self.mapping_type, self.dtype,
                    name=f"stage{s + 1}_block{b}",
                )(x, train)
        x = nn.silu(IQBN(stages[3], dtype=self.dtype, name="bn")(x, train))
        x = qavg_pool_global(x, keepdims=False)  # [B, 4, C]
        x = QDense(stages[3], self.num_classes * 4, mapping_type=self.mapping_type,
                   dtype=self.dtype, name="classifier")(x)
        return quaternion_norm_logits(x)


class QResNetCIFAR(nn.Module):
    """CIFAR Q-ResNet-18/34 (reference quaternion_models.py:92-255):
    16-wide stem, 3 stages, 2-layer QDense head."""

    blocks: Sequence[int] = (3, 4, 6)  # qrn34; qrn18 uses (2, 2, 2)
    num_classes: int = 10
    drop_rate: float = 0.0
    base_width: int = 16
    mapping_type: str = "poincare"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bw = self.base_width
        x = QConv2D(3, bw, 3, 1, 1, mapping_type=self.mapping_type, dtype=self.dtype, name="stem_conv")(x)
        x = nn.silu(IQBN(bw, dtype=self.dtype, name="stem_bn")(x, train))
        widths = [bw, bw * 2, bw * 4]
        cin = bw
        for s, (w, nb) in enumerate(zip(widths, self.blocks)):
            stride = 1 if s == 0 else 2
            for b in range(nb):
                x = QuaternionBasicBlock(
                    cin if b == 0 else w, w, stride if b == 0 else 1,
                    self.drop_rate, self.mapping_type, self.dtype,
                    name=f"stage{s + 1}_block{b}",
                )(x, train)
            cin = w
        x = qavg_pool_global(x, keepdims=False)
        x = QDense(widths[-1], 256, mapping_type=self.mapping_type, dtype=self.dtype, name="fc1")(x)
        x = nn.silu(x)
        x = QDense(256, self.num_classes * 4, mapping_type=self.mapping_type, dtype=self.dtype, name="fc2")(x)
        return quaternion_norm_logits(x)


class QResNetImageNet(nn.Module):
    """ImageNet Q-ResNet-34 (reference quaternion_models.py:173-255):
    7x7/2 stem + maxpool, 4 stages [3,4,6,3], dropout + QDense head."""

    blocks: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    drop_rate: float = 0.1
    base_width: int = 64
    mapping_type: str = "poincare"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bw = self.base_width
        x = QConv2D(3, bw, 7, 2, 3, mapping_type=self.mapping_type, dtype=self.dtype, name="stem_conv")(x)
        x = nn.silu(IQBN(bw, dtype=self.dtype, name="stem_bn")(x, train))
        x = qmax_pool(x, 3, 2, 1)
        widths = [bw, bw * 2, bw * 4, bw * 8]
        cin = bw
        for s, (w, nb) in enumerate(zip(widths, self.blocks)):
            stride = 1 if s == 0 else 2
            for b in range(nb):
                x = QuaternionBasicBlock(
                    cin if b == 0 else w, w, stride if b == 0 else 1,
                    self.drop_rate, self.mapping_type, self.dtype,
                    name=f"stage{s + 1}_block{b}",
                )(x, train)
            cin = w
        x = qavg_pool_global(x, keepdims=False)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = QDense(widths[-1], self.num_classes * 4, mapping_type=self.mapping_type,
                   dtype=self.dtype, name="classifier")(x)
        return quaternion_norm_logits(x)


class QWideResNetImageNet(nn.Module):
    """ImageNet WRN-50-k (reference quaternion_models.py:256-313): 64-wide
    7x7/2 stem + maxpool, then QWideBasicBlock stages [3,4,6,3] at widths
    64*k*2^s (the reference reuses the pre-activated-shortcut wide block, NOT
    the raw-shortcut QuaternionBasicBlock), dropout + QDense head."""

    width_factor: int = 2
    num_classes: int = 1000
    drop_rate: float = 0.2
    mapping_type: str = "poincare"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bw = 64
        blocks = (3, 4, 6, 3)
        widths = [bw * self.width_factor * (2 ** i) for i in range(4)]
        x = QConv2D(3, bw, 7, 2, 3, mapping_type=self.mapping_type,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.silu(IQBN(bw, dtype=self.dtype, name="stem_bn")(x, train))
        x = qmax_pool(x, 3, 2, 1)
        cin = bw
        for s, (w, nb) in enumerate(zip(widths, blocks)):
            stride = 1 if s == 0 else 2
            for b in range(nb):
                x = QWideBasicBlock(
                    cin if b == 0 else w, w, stride if b == 0 else 1,
                    self.drop_rate, self.mapping_type, self.dtype,
                    name=f"stage{s + 1}_block{b}",
                )(x, train)
            cin = w
        x = qavg_pool_global(x, keepdims=False)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = QDense(widths[-1], self.num_classes * 4, mapping_type=self.mapping_type,
                   dtype=self.dtype, name="classifier")(x)
        return quaternion_norm_logits(x)


class QWRN16ImageNet(nn.Module):
    """ImageNet WRN-16 (reference QWRN16_4I, quaternion_models.py:512-569):
    64-wide 7x7/2 stem + maxpool, THREE wide stages of n=2 blocks at widths
    64*k*(1,2,4) (the reference sets width_factor=2 internally despite the
    '16_4' name), dropout + QDense head."""

    width_factor: int = 2
    num_classes: int = 1000
    drop_rate: float = 0.2
    mapping_type: str = "poincare"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bw, k = 64, self.width_factor
        widths = [bw * k, bw * 2 * k, bw * 4 * k]
        x = QConv2D(3, bw, 7, 2, 3, mapping_type=self.mapping_type,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.silu(IQBN(bw, dtype=self.dtype, name="stem_bn")(x, train))
        x = qmax_pool(x, 3, 2, 1)
        cin = bw
        for s, (w, stride) in enumerate(zip(widths, (1, 2, 2))):
            for b in range(2):
                x = QWideBasicBlock(
                    cin if b == 0 else w, w, stride if b == 0 else 1,
                    self.drop_rate, self.mapping_type, self.dtype,
                    name=f"stage{s + 1}_block{b}",
                )(x, train)
            cin = w
        x = qavg_pool_global(x, keepdims=False)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = QDense(widths[-1], self.num_classes * 4, mapping_type=self.mapping_type,
                   dtype=self.dtype, name="classifier")(x)
        return quaternion_norm_logits(x)


MODEL_FACTORIES: Dict[str, Callable[..., nn.Module]] = {
    # reference CLI names (classification.py:43-291)
    "qwrn16_2": lambda nc, drop, mt, dtype=None: QWideResNet(16, 2, nc, drop, mt, dtype),
    "qwrn16_4": lambda nc, drop, mt, dtype=None: QWideResNet(16, 4, nc, drop, mt, dtype),
    "qwrn16_8": lambda nc, drop, mt, dtype=None: QWideResNet(16, 8, nc, drop, mt, dtype),
    "qrn18": lambda nc, drop, mt, dtype=None: QResNetCIFAR((2, 2, 2), nc, drop, 16, mt, dtype),
    "qrn34": lambda nc, drop, mt, dtype=None: QResNetCIFAR((3, 4, 6), nc, drop, 16, mt, dtype),
    "qrn34_imagenet": lambda nc, drop, mt, dtype=None: QResNetImageNet((3, 4, 6, 3), nc, drop, 64, mt, dtype),
    "qrn18_i": lambda nc, drop, mt, dtype=None: QResNetImageNet((2, 2, 2, 2), nc, drop, 64, mt, dtype),
    "qwrn50_2": lambda nc, drop, mt, dtype=None: QWideResNetImageNet(2, nc, drop, mt, dtype),
    "qwrn16_4i": lambda nc, drop, mt, dtype=None: QWRN16ImageNet(2, nc, drop, mt, dtype),
}


def create_model(name: str, num_classes: int, drop_rate: float = 0.0,
                 mapping_type: str = "poincare", dtype: Any = None) -> nn.Module:
    if name not in MODEL_FACTORIES:
        raise ValueError(f"unknown model {name!r}; choose from {sorted(MODEL_FACTORIES)}")
    return MODEL_FACTORIES[name](num_classes, drop_rate, mapping_type, dtype)
