"""Fused 1x1 quaternion conv Pallas kernel: matmul + mixing + BN + SiLU.

A 1x1 separable quaternion conv over BHWQC is, per component d:
    s_d[p, o] = x_d[p, i] @ w_d[i, o]          (p = flattened B*H*W pixels)
followed by the constant mixing y = M @ s, an optional per-(q, o) affine
(IQBN folded for inference), and SiLU.

Kernel strategy: grid over (pixel tiles, output-channel tiles). Each program
loads an x tile [TP, 4, Ci] and the four weight blocks [4, Ci, TO], issues 4
MXU matmuls (bf16 in, fp32 accum), applies the Hadamard-like mixing and the
affine + SiLU in registers, and writes [TP, 4, TO]. This mirrors the
reference fused CUDA kernel (quaternion_ops_optimized.cu:422-467) but tiled
for the 128x128 MXU instead of one-thread-per-pixel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, shift_ref, o_ref, *, apply_affine: bool, apply_silu: bool):
    # x_ref: [TP, 4, Ci], w_ref: [4, Ci, TO], scale/shift: [4, TO], o_ref: [TP, 4, TO]
    s = []
    for d in range(4):
        s.append(
            jnp.dot(x_ref[:, d, :], w_ref[d], preferred_element_type=jnp.float32)
        )  # [TP, TO] fp32
    sr, si, sj, sk = s
    yr = sr + si + sj + sk
    yi = sr - si - sj + sk
    yj = sr + si - sj - sk
    yk = sr - si + sj - sk
    ys = [yr, yi, yj, yk]
    out = []
    for q in range(4):
        v = ys[q]
        if apply_affine:
            v = v * scale_ref[q][None, :] + shift_ref[q][None, :]
        if apply_silu:
            v = v * jax.nn.sigmoid(v)
        out.append(v)
    o_ref[:, :, :] = jnp.stack(out, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_p", "block_o", "apply_silu"))
def qconv1x1_fused(
    x: jnp.ndarray,           # [B, H, W, 4, Ci]
    w: jnp.ndarray,           # [4, 1, 1, Ci, Co] or [4, Ci, Co]
    scale: Optional[jnp.ndarray] = None,   # [4, Co] folded IQBN gamma/sqrt(var+eps)
    shift: Optional[jnp.ndarray] = None,   # [4, Co] folded beta - gamma*mu/sqrt(var+eps)
    *,
    block_p: int = 256,
    block_o: int = 128,
    apply_silu: bool = True,
) -> jnp.ndarray:
    B, H, W, Q, Ci = x.shape
    if w.ndim == 5:
        w = w.reshape(4, Ci, -1)
    Co = w.shape[-1]
    P = B * H * W
    apply_affine = scale is not None

    # Pad to tile multiples (static shapes).
    P_pad = -(-P // block_p) * block_p
    Co_pad = -(-Co // block_o) * block_o
    xf = x.reshape(P, Q, Ci)
    if P_pad != P:
        xf = jnp.pad(xf, ((0, P_pad - P), (0, 0), (0, 0)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, Co_pad - Co))) if Co_pad != Co else w
    if apply_affine:
        sc = jnp.pad(scale, ((0, 0), (0, Co_pad - Co))) if Co_pad != Co else scale
        sh = jnp.pad(shift, ((0, 0), (0, Co_pad - Co))) if Co_pad != Co else shift
    else:
        sc = jnp.ones((4, Co_pad), jnp.float32)
        sh = jnp.zeros((4, Co_pad), jnp.float32)

    grid = (P_pad // block_p, Co_pad // block_o)
    out = pl.pallas_call(
        functools.partial(_kernel, apply_affine=apply_affine, apply_silu=apply_silu),
        out_shape=jax.ShapeDtypeStruct((P_pad, 4, Co_pad), x.dtype),
        grid=grid,
        interpret=jax.default_backend() == "cpu",  # CPU tests run the interpreter
        in_specs=[
            pl.BlockSpec((block_p, 4, Ci), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Ci, block_o), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block_o), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block_o), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_p, 4, block_o), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * P_pad * 4 * Ci * Co_pad + 16 * P_pad * Co_pad,
            bytes_accessed=P_pad * 4 * Ci * x.dtype.itemsize + 4 * Ci * Co_pad * 4 + P_pad * 4 * Co_pad * x.dtype.itemsize,
            transcendentals=P_pad * Co_pad * 4 if apply_silu else 0,
        ),
    )(xf, wp.astype(x.dtype), sc, sh)
    return out[:P, :, :Co].reshape(B, H, W, 4, Co)


def fold_iqbn(gamma: jnp.ndarray, beta: jnp.ndarray, mean: jnp.ndarray,
              var: jnp.ndarray, eps: float = 1e-5):
    """IQBN eval affine -> (scale, shift) pair for the fused kernel."""
    inv = gamma * jax.lax.rsqrt(var + eps)
    return inv, beta - mean * inv
