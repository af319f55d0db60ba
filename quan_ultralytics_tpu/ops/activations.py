"""Quaternion activation functions.

Reference: ultralytics/nn/modules/activation.py:24-127 and
classification/quaternion/qactivation.py. Two families:

  * split-type: the real activation applied per component (QSiLU, QReLU,
    QTanh, QSigmoid, QLeakyReLU, QHardTanh) — on our BHWQC layout these are
    just the elementwise op (broadcast covers all components), provided for
    API parity;
  * norm-aware: QREReLU rescales the whole quaternion by the ratio
    ReLU'd-norm / norm, preserving phase (qactivation.py QREReLU).

The main models use plain SiLU elementwise (the reference applies nn.SiLU()
to the 5-D tensor), which equals QSiLU here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def qsilu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def qrelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(x)


def qtanh(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.tanh(x)


def qsigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(x)


def qleaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope)


def qhardtanh(x: jnp.ndarray, min_val: float = -1.0, max_val: float = 1.0) -> jnp.ndarray:
    return jnp.clip(x, min_val, max_val)


def qprelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Parametric ReLU with a learnable per-channel (or scalar) slope."""
    return jnp.where(x >= 0, x, alpha * x)


def qrerelu(x: jnp.ndarray, axis: int = -2, eps: float = 1e-8) -> jnp.ndarray:
    """Norm-rectifying activation: scale each quaternion by
    relu(|q| - threshold-free)/|q| — keeps the phase, rectifies magnitude.

    Matches the classification stack's QREReLU semantics: components shrink
    together, zero quaternions stay zero."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)
    scale = jax.nn.relu(norm) / (norm + eps)
    return x * scale


ACTIVATIONS = {
    "silu": qsilu,
    "relu": qrelu,
    "tanh": qtanh,
    "sigmoid": qsigmoid,
    "leaky_relu": qleaky_relu,
    "hardtanh": qhardtanh,
    "rerelu": qrerelu,
}
