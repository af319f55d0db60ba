"""Standalone quaternion loss prototypes (API parity).

Reference utils/loss.py:19-255 defines two standalone criteria that are NOT
wired into training (the trainable path is v8OBBLoss): `QuaternionOBBLoss`
(geodesic angle + optional temporal smoothness across frames, loss.py:63-89)
and `QuaternionYOLOLoss`. Provided here as documented, jittable functions so
downstream users of those classes have equivalents.
"""

from __future__ import annotations

import jax.numpy as jnp

from quan_ultralytics_tpu.losses.detect import _angle_to_quaternion, quaternion_angular_loss


def quaternion_obb_loss(pred_angles: jnp.ndarray, target_angles: jnp.ndarray,
                        weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Geodesic orientation loss between angle sets (loss.py:19-61)."""
    qp = _angle_to_quaternion(pred_angles[..., None])
    qt = _angle_to_quaternion(target_angles[..., None])
    d = quaternion_angular_loss(qp, qt)
    if weights is not None:
        return (d * weights).sum() / jnp.maximum(weights.sum(), 1.0)
    return d.mean()


def temporal_smoothness_loss(angles_t: jnp.ndarray, angles_tm1: jnp.ndarray) -> jnp.ndarray:
    """Penalize frame-to-frame orientation jumps (loss.py:63-89): mean
    geodesic distance between consecutive-frame quaternions."""
    qt = _angle_to_quaternion(angles_t[..., None])
    qp = _angle_to_quaternion(angles_tm1[..., None])
    return quaternion_angular_loss(qt, qp).mean()
