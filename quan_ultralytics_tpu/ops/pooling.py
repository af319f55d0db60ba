"""Quaternion-aware spatial pooling / resizing on BHWQC tensors.

Reference semantics: per-component 2D pooling that leaves the quaternion
axis intact (ultralytics/nn/modules/block.py:85-133 QuaternionMaxPool /
QuaternionAdaptiveAvgPool2d, conv.py:1218-1246 QUpsample). Because our
layout keeps Q and C as trailing axes, a single `lax.reduce_window` over the
spatial dims covers all four components at once — no per-component loop.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
from jax import lax

IntOr2 = Union[int, Tuple[int, int]]


def _pair(v: IntOr2) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


def qmax_pool(x: jnp.ndarray, kernel: IntOr2, stride: IntOr2 = None, padding: IntOr2 = 0) -> jnp.ndarray:
    """Max pool over H, W of a [B, H, W, 4, C] tensor."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    ph, pw = _pair(padding)
    # NOTE: init must be a python scalar literal — an array init makes
    # lax.reduce_window bind the generic (non-differentiable) primitive
    # instead of reduce_window_max.
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, kh, kw, 1, 1),
        window_strides=(1, sh, sw, 1, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0), (0, 0)),
    )


def qavg_pool_global(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """Global average pool over H, W (adaptive avg pool to 1x1)."""
    return x.mean(axis=(1, 2), keepdims=keepdims)


def qavg_pool(x: jnp.ndarray, kernel: IntOr2, stride: IntOr2 = None, padding: IntOr2 = 0) -> jnp.ndarray:
    """Average pool over H, W of a [B, H, W, 4, C] tensor (count includes pad)."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    ph, pw = _pair(padding)
    summed = lax.reduce_window(
        x,
        0.0 if jnp.issubdtype(x.dtype, jnp.floating) else 0,
        lax.add,
        window_dimensions=(1, kh, kw, 1, 1),
        window_strides=(1, sh, sw, 1, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0), (0, 0)),
    )
    return summed / (kh * kw)


def qupsample(x: jnp.ndarray, scale: int = 2, mode: str = "nearest") -> jnp.ndarray:
    """Upsample H, W by an integer factor; quaternion axis untouched.

    Reference: conv.py:1218-1246 (QUpsample) — one interpolation over the
    flattened component-channel axis. Nearest is a cheap reshape-broadcast
    (XLA lowers it to a copy); bilinear uses jax.image.resize semantics
    matching torch's align_corners=False.
    """
    B, H, W, Q, C = x.shape
    if mode == "nearest":
        y = jnp.broadcast_to(x[:, :, None, :, None, :, :], (B, H, scale, W, scale, Q, C))
        return y.reshape(B, H * scale, W * scale, Q, C)
    if mode == "bilinear":
        import jax.image

        return jax.image.resize(x, (B, H * scale, W * scale, Q, C), method="bilinear")
    raise ValueError(f"unsupported upsample mode {mode!r}")
