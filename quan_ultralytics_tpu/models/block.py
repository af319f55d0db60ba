"""Quaternion network blocks for the QUAN-YOLO11 graph.

All channel arguments are in total quaternion-channel space (multiples of 4).
Every ``Conv`` here is QConv2D+IQBN+SiLU, so the graph is quaternion-by-
construction (reference: ultralytics/nn/modules/block.py).
Concatenation along the per-component channel axis C (our last axis) is
equivalent to the reference's dim-1 concat on BCHWQ.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from quan_ultralytics_tpu.models.conv import Conv, DWConv, QConv2D, IQBN
from quan_ultralytics_tpu.ops.pooling import qmax_pool, qupsample


def qconcat(xs, axis: int = -1):
    """Channel concat of BHWQC tensors (reference Concat, conv.py:1139-1149)."""
    return jnp.concatenate(xs, axis=axis)


class QuaternionDropout(nn.Module):
    """Drops whole quaternions: one Bernoulli mask [B,H,W,1,C] broadcast over
    the component axis (reference block.py:135-154)."""

    p: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if not train or self.p == 0.0:
            return x
        rng = self.make_rng("dropout")
        B, H, W, Q, C = x.shape
        keep = jax.random.bernoulli(rng, 1.0 - self.p, (B, H, W, 1, C))
        # NOTE: the reference does NOT rescale by 1/(1-p) (block.py:153).
        return x * keep.astype(x.dtype)


class Bottleneck(nn.Module):
    """Standard bottleneck (reference block.py:447-461)."""

    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Any = None
    packed: bool = False  # deep-packed activations (see QConv2D.packed)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pk = "both" if self.packed else None
        c_ = int(self.c2 * self.e)
        y = Conv(self.c1, c_, self.k[0], 1, dtype=self.dtype, packed=pk, name="cv1")(x, train)
        y = Conv(c_, self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, packed=pk, name="cv2")(y, train)
        return x + y if (self.shortcut and self.c1 == self.c2) else y


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference block.py:362-377)."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: int = 3  # bottleneck kernel (C3k customization, block.py:888-897)
    bottleneck_e: float = 1.0
    dtype: Any = None
    packed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pk = "both" if self.packed else None
        c_ = int(self.c2 * self.e)
        a = Conv(self.c1, c_, 1, 1, dtype=self.dtype, packed=pk, name="cv1")(x, train)
        b = Conv(self.c1, c_, 1, 1, dtype=self.dtype, packed=pk, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(
                c_, c_, self.shortcut, self.g, k=(self.k, self.k), e=self.bottleneck_e,
                dtype=self.dtype, packed=self.packed, name=f"m{i}",
            )(a, train)
        return Conv(2 * c_, self.c2, 1, dtype=self.dtype, packed=pk,
                    name="cv3")(qconcat([a, b]), train)


def C3k(c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3, dtype=None, packed=False, name=None):
    """C3 with custom bottleneck kernel size (reference block.py:888-897)."""
    return C3(c1, c2, n, shortcut, g, e, k=k, bottleneck_e=1.0, dtype=dtype,
              packed=packed, name=name)


class C3k2(nn.Module):
    """Faster CSP bottleneck, YOLO11's workhorse (reference block.py:876-885,
    inheriting the C2f split/extend/concat topology block.py:337-360)."""

    c1: int
    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Any = None
    packed: bool = False  # deep-packed activations: split/concat slice the
    # channel-major packed axis (4 phase entries per channel)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pk = "both" if self.packed else None
        c = int(self.c2 * self.e)  # hidden width in total quaternion channels
        y = Conv(self.c1, 2 * c, 1, 1, dtype=self.dtype, packed=pk, name="cv1")(x, train)
        cpc = (c // 4) * (4 if self.packed else 1)  # slice the per-component channel axis
        ys = [y[..., :cpc], y[..., cpc:]]
        for i in range(self.n):
            if self.c3k:
                m = C3k(c, c, 2, self.shortcut, self.g, dtype=self.dtype,
                        packed=self.packed, name=f"m{i}")
            else:
                m = Bottleneck(c, c, self.shortcut, self.g, k=(3, 3), e=0.5, dtype=self.dtype,
                               packed=self.packed, name=f"m{i}")
            ys.append(m(ys[-1], train))
        return Conv((2 + self.n) * c, self.c2, 1, dtype=self.dtype, packed=pk,
                    name="cv2")(qconcat(ys), train)


class Proto(nn.Module):
    """Mask prototype generator for segmentation (reference block.py:156-174).

    Quaternion adaptation: the reference composes its quaternion Conv with a
    real ConvTranspose2d, which cannot consume the 5-D quaternion tensors its
    own Conv emits (broken upstream, like the v10 path). Working TPU design:
    quaternion convs + nearest upsample (the alternative the reference left
    in its own comment, block.py:168) + QER extraction to real-valued
    prototype masks.
    """

    c1: int
    c_: int = 256  # protos (total quaternion channels)
    c2: int = 32   # real-valued mask channels out

    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from quan_ultralytics_tpu.models.head import QER

        y = Conv(self.c1, self.c_, 3, dtype=self.dtype, name="cv1")(x, train)
        y = qupsample(y, 2, "nearest")
        y = Conv(self.c_, self.c_, 3, dtype=self.dtype, name="cv2")(y, train)
        return QER(self.c_, self.c2, 1, dtype=self.dtype, name="cv3")(y)  # [B, 2H, 2W, c2]


class QSPPF(nn.Module):
    """Quaternion SPPF (reference block.py:270-303): 1x1 reduce, three chained
    k=5 stride-1 max pools, concat, 1x1 expand. (The reference also builds an
    unused multi-scale pool list, block.py:278-282 — intentionally omitted.)"""

    c1: int
    c2: int
    k: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c_ = self.c1 // 2
        y = [Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)]
        for _ in range(3):
            y.append(qmax_pool(y[-1], self.k, 1, self.k // 2))
        return Conv(c_ * 4, self.c2, 1, 1, dtype=self.dtype, name="cv2")(qconcat(y), train)


class QAttention(nn.Module):
    """Per-component multi-head attention (reference block.py:1485-1546).

    qkv/proj are 1x1 quaternion convs; positional encoding is a 3x3
    depth-wise quaternion conv; softmax(QK^T * scale) runs independently per
    quaternion component and head. At P5 (the only site), N = H*W tokens fit
    a single MXU pass — no sequence parallelism needed.
    (The reference defines an IQLN `norm` but never calls it; omitted.)
    """

    dim: int  # total channels
    num_heads: int = 8
    attn_ratio: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, Q, C = x.shape
        N = H * W
        head_dim = C // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        nh_kd = key_dim * self.num_heads
        h_per_comp = C + nh_kd * 2

        qkv = QConv2D(self.dim, h_per_comp * 4, 1, use_bias=False, dtype=self.dtype, name="qkv")(x)
        # [B, H, W, 4, h] -> split along per-component channels.
        q = qkv[..., :nh_kd]
        k = qkv[..., nh_kd : 2 * nh_kd]
        v = qkv[..., 2 * nh_kd :]

        def heads(t, d):
            # [B, H, W, 4, heads*d] -> [B, 4, heads, N, d]
            return t.reshape(B, N, Q, self.num_heads, d).transpose(0, 2, 3, 1, 4)

        qh, kh, vh = heads(q, key_dim), heads(k, key_dim), heads(v, head_dim)
        import os

        from quan_ultralytics_tpu.ops.pallas import qattn

        if (qattn.supports(N)
                and os.environ.get("QUAN_FUSED_ATTN", "0") == "1"
                and (not train or os.environ.get("QUAN_FUSED_ATTN_TRAIN", "1") == "1")):
            # training default ON: the flash backward (custom VJP) measured
            # b8 83.7->91.7, and with the loss fixes b24 reaches 129.8 img/s
            # @1024 (r3_results.jsonl trainattn); set _TRAIN=0 to fall back
            # flash-style Pallas kernel: the [B,4,H,N,N] score matrix never
            # hits HBM (tens of ms of traffic at 1024px b96 — see qattn.py)
            o = qattn.qattention_fused(qh, kh, vh, key_dim ** -0.5)
        else:
            prec = jax.lax.Precision.HIGHEST
            attn = jnp.einsum("bqhnd,bqhmd->bqhnm", qh, kh, precision=prec) * (key_dim ** -0.5)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
            o = jnp.einsum("bqhnm,bqhmd->bqhnd", attn, vh, precision=prec)
        o = o.transpose(0, 3, 1, 2, 4).reshape(B, H, W, Q, C)

        o = o + QConv2D(self.dim, self.dim, 3, p=1, g=self.dim // 4, use_bias=False,
                        dtype=self.dtype, name="pe")(o)
        return QConv2D(self.dim, self.dim, 1, use_bias=False, dtype=self.dtype, name="proj")(o)


class QPSABlock(nn.Module):
    """Attention + FFN block with residuals (reference block.py:1382-1407)."""

    c: int
    attn_ratio: float = 1.0
    num_heads: int = 8
    shortcut: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        a = QAttention(self.c, self.num_heads, self.attn_ratio, dtype=self.dtype, name="attn")(x, train)
        x = x + a if self.shortcut else a
        f = Conv(self.c, self.c * 2, 1, dtype=self.dtype, name="ffn0")(x, train)
        f = Conv(self.c * 2, self.c, 1, act=False, dtype=self.dtype, name="ffn1")(f, train)
        return x + f if self.shortcut else f


class QC2PSA(nn.Module):
    """C2-style split with PSA attention branch (reference block.py:1548-1593)."""

    c1: int
    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = int(self.c1 * self.e)
        y = Conv(self.c1, 2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        cpc = c // 4  # per-component hidden channels
        a, b = y[..., :cpc], y[..., cpc:]
        for i in range(self.n):
            b = QPSABlock(
                c, attn_ratio=0.5, num_heads=max(1, c // 16), dtype=self.dtype, name=f"m{i}"
            )(b, train)
        return Conv(2 * c, self.c2, 1, dtype=self.dtype, name="cv2")(qconcat([a, b]), train)


class C2f(nn.Module):
    """Classic C2f (reference block.py:337-360) — C3k2's parent topology with
    (3,3)-(3,3) e=1.0 bottlenecks; provided for YAML compatibility."""

    c1: int
    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = int(self.c2 * self.e)
        y = Conv(self.c1, 2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        cpc = c // 4
        ys = [y[..., :cpc], y[..., cpc:]]
        for i in range(self.n):
            ys.append(Bottleneck(c, c, self.shortcut, self.g, k=(3, 3), e=1.0,
                                 dtype=self.dtype, name=f"m{i}")(ys[-1], train))
        return Conv((2 + self.n) * c, self.c2, 1, dtype=self.dtype, name="cv2")(qconcat(ys), train)


class QPSA(nn.Module):
    """Standalone PSA block (reference block.py:1410-1483): reduce, split,
    attention+FFN on one branch, concat, expand."""

    c1: int
    c2: int
    e: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = (int(self.c1 * self.e) // 4) * 4
        y = Conv(self.c1, 2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        cpc = c // 4
        a, b = y[..., :cpc], y[..., cpc:]
        a = QAttention(c, num_heads=max(c // 16, 1), attn_ratio=1.0,
                       dtype=self.dtype, name="attn")(a, train)
        f = Conv(c, c * 2, 1, dtype=self.dtype, name="ffn0")(a, train)
        a = Conv(c * 2, c, 1, act=False, dtype=self.dtype, name="ffn1")(f, train)
        return Conv(2 * c, self.c2, 1, dtype=self.dtype, name="cv2")(qconcat([a, b]), train)


def dfl(x: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Distribution Focal Loss integral (reference block.py:64-83).

    Args:
      x: ``[B, A, 4 * reg_max]`` raw distances-distribution logits (the
        reference's frozen arange conv == expectation over softmax bins).
    Returns:
      ``[B, A, 4]`` expected distances.
    """
    B, A, _ = x.shape
    p = jax.nn.softmax(x.reshape(B, A, 4, reg_max).astype(jnp.float32), axis=-1)
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    return p @ proj
