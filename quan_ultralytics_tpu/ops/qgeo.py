"""Riemannian (Poincare-ball) quaternion ops — the geoopt variant.

Reference: classification/quaternion/qconv_geoopt.py (experimental, not on
the main path). That file uses the geoopt library's PoincareBall manifold;
here the ball operations are implemented directly (no external dependency,
fully jittable): Mobius addition, exponential/log maps at the origin, and a
tangent-space quaternion conv:

    y = expmap0( qconv( logmap0(x) ) )

which is the standard "hyperbolic layer" construction (HNN, Ganea et al.)
the geoopt version approximates.
"""

from __future__ import annotations

import jax.numpy as jnp

from quan_ultralytics_tpu.ops.qconv import qconv2d


def _sq_norm(x, axis=-1, keepdims=True):
    return jnp.sum(x * x, axis=axis, keepdims=keepdims)


def mobius_add(x: jnp.ndarray, y: jnp.ndarray, c: float = 1.0, eps: float = 1e-7) -> jnp.ndarray:
    """Mobius addition on the c-ball (gyrovector sum)."""
    x2 = _sq_norm(x)
    y2 = _sq_norm(y)
    xy = jnp.sum(x * y, axis=-1, keepdims=True)
    num = (1 + 2 * c * xy + c * y2) * x + (1 - c * x2) * y
    den = 1 + 2 * c * xy + c**2 * x2 * y2
    return num / jnp.maximum(den, eps)


def expmap0(v: jnp.ndarray, c: float = 1.0, eps: float = 1e-7) -> jnp.ndarray:
    """Exponential map at the origin: tangent vector -> ball point."""
    sqrt_c = c ** 0.5
    n = jnp.sqrt(jnp.maximum(_sq_norm(v), eps))
    return jnp.tanh(sqrt_c * n) * v / (sqrt_c * n)


def logmap0(x: jnp.ndarray, c: float = 1.0, eps: float = 1e-7) -> jnp.ndarray:
    """Log map at the origin: ball point -> tangent vector."""
    sqrt_c = c ** 0.5
    n = jnp.sqrt(jnp.clip(_sq_norm(x), eps, (1 - eps) / c))
    return jnp.arctanh(sqrt_c * n) * x / (sqrt_c * n)


def poincare_qconv2d(x: jnp.ndarray, w: jnp.ndarray, bias=None, *, c: float = 1.0,
                     stride=1, padding=0, dilation=1, groups=1) -> jnp.ndarray:
    """Hyperbolic quaternion conv: treat each quaternion (the size-4 axis) as
    a point on the Poincare ball, map to the tangent space at the origin,
    run the standard separable qconv, and map back.

    x: [B, H, W, 4, C] with per-position quaternions inside the unit ball
    (the poincare RGB mapping produces exactly this).
    """
    # ball axis is the quaternion axis: move it last for the vector ops
    xb = jnp.moveaxis(x, -2, -1)  # [B, H, W, C, 4]
    v = logmap0(xb, c)
    v = jnp.moveaxis(v, -1, -2)  # back to [B, H, W, 4, C]
    y = qconv2d(v, w, bias, stride=stride, padding=padding, dilation=dilation, groups=groups)
    yb = jnp.moveaxis(y, -2, -1)
    # scale into the ball before expmap for numerical sanity
    out = expmap0(yb, c)
    return jnp.moveaxis(out, -1, -2)
