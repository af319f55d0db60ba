"""RGB -> quaternion input mappings.

Reference semantics: ultralytics/nn/modules/conv.py:378-408 (QConv2D
_rgb_to_quaternion) and the near-identical classification copy
classification/quaternion/qconv.py:514-545. The first quaternion layer of
every model maps a 3-channel RGB image to a single quaternion channel.

Our input layout is NHWC ``[B, H, W, 3]``; output is BHWQC ``[B, H, W, 4, 1]``.
"""

from __future__ import annotations

import jax.numpy as jnp

MAPPING_TYPES = ("poincare", "hamilton", "luminance", "mean_brightness", "raw_normalized")


def rgb_to_quaternion(x: jnp.ndarray, mapping_type: str = "poincare") -> jnp.ndarray:
    """Map RGB ``[B, H, W, 3]`` to one quaternion channel ``[B, H, W, 4, 1]``.

    Mappings (matching reference conv.py:378-408):
      * ``poincare`` (default): inverse-stereographic map onto the unit
        3-sphere / Poincare ball: with ``n = |x|^2``, real part
        ``(1 - n) / (1 + n)`` and vector part ``2x / (1 + n)``. Produces unit
        quaternions for inputs in the ball.
      * ``hamilton``: pure quaternion, real part 0, vector = RGB.
      * ``luminance``: Rec.601 luma real part + batch-min-max-normalized RGB.
      * ``mean_brightness``: channel mean real part + raw RGB vector.
      * ``raw_normalized``: mean of normalized RGB as real part + normalized RGB.

    Note the ``min()`` / ``max()`` in the normalized variants are *global*
    scalar reductions over the whole batch tensor, exactly like the reference.
    """
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    if mapping_type == "poincare":
        norm_sq = jnp.sum(x * x, axis=-1)
        denom = 1.0 + norm_sq
        real = (1.0 - norm_sq) / denom
        vec = 2.0 * x / denom[..., None]
        q = jnp.stack([real, vec[..., 0], vec[..., 1], vec[..., 2]], axis=-1)
    elif mapping_type == "hamilton":
        q = jnp.stack([jnp.zeros_like(r), r, g, b], axis=-1)
    elif mapping_type == "luminance":
        luma = 0.299 * r + 0.587 * g + 0.114 * b
        xn = _global_minmax_normalize(x)
        q = jnp.stack([luma, xn[..., 0], xn[..., 1], xn[..., 2]], axis=-1)
    elif mapping_type == "mean_brightness":
        mean = x.mean(axis=-1)
        q = jnp.stack([mean, r, g, b], axis=-1)
    elif mapping_type == "raw_normalized":
        xn = _global_minmax_normalize(x)
        q = jnp.stack([xn.mean(axis=-1), xn[..., 0], xn[..., 1], xn[..., 2]], axis=-1)
    else:
        raise ValueError(f"unknown mapping_type {mapping_type!r}; choose from {MAPPING_TYPES}")
    return q[..., None]  # [B, H, W, 4, 1]


def _global_minmax_normalize(x: jnp.ndarray) -> jnp.ndarray:
    lo, hi = x.min(), x.max()
    return (x - lo) / (hi - lo)
