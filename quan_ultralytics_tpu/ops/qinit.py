"""Quaternion-aware weight initialization.

Reference: classification/quaternion/init.py:8-240 (QInit): weight
quaternions drawn with chi(4)-distributed magnitude (scaled by the He/Glorot
criterion) and a uniformly random unit 3-axis, i.e. w = |w|(cos(t) +
sin(t)(u_i i + u_j j + u_k k)). Available as an alternative to the default
scaled kaiming_uniform (which the reference main path uses,
conv.py:232-256).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def quaternion_chi_init(criterion: str = "he"):
    """Initializer for [4, kh, kw, cin, cout] quaternion conv weights."""

    def init(key, shape, dtype=jnp.float32):
        assert shape[0] == 4
        fan_in = shape[1] * shape[2] * shape[3]
        fan_out = shape[1] * shape[2] * shape[4]
        if criterion == "he":
            sigma = 1.0 / math.sqrt(2.0 * fan_in)
        else:  # glorot
            sigma = 1.0 / math.sqrt(fan_in + fan_out)
        k_mag, k_axis, k_phase = jax.random.split(key, 3)
        comp_shape = shape[1:]
        # chi with 4 dof: norm of 4 gaussians
        g = jax.random.normal(k_mag, (4, *comp_shape), dtype)
        magnitude = jnp.sqrt(jnp.sum(g * g, axis=0)) * sigma
        # random unit 3-vector axis
        v = jax.random.normal(k_axis, (3, *comp_shape), dtype)
        v = v / jnp.maximum(jnp.sqrt(jnp.sum(v * v, axis=0)), 1e-12)
        phase = jax.random.uniform(k_phase, comp_shape, dtype, -math.pi, math.pi)
        w_r = magnitude * jnp.cos(phase)
        s = magnitude * jnp.sin(phase)
        return jnp.stack([w_r, s * v[0], s * v[1], s * v[2]])

    return init
