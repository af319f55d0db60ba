"""Fused 1x1 quaternion conv Pallas kernel: matmul + mixing + BN + SiLU.

A 1x1 separable quaternion conv over BHWQC is, per component d:
    s_d[p, o] = x_d[p, i] @ w_d[i, o]          (p = flattened B*H*W pixels)
followed by the constant mixing y = M @ s, an optional per-(q, o) affine
(IQBN folded for inference), and SiLU.

Kernel strategy: grid over pixel tiles; each program loads an x tile
[TP, 4*Ci] (q-major channel flattening, the same layout `ops/qconv.qconv2d`
feeds XLA), the full per-component weights [4, Ci, Co], slices the four
component blocks, issues 4 MXU matmuls (bf16 in, fp32 accum), applies the
Hadamard-like mixing and the affine + SiLU in registers, and writes
[TP, 4*Co] q-major. This mirrors the reference fused CUDA kernel
(quaternion_ops_optimized.cu:422-467) but tiled for the 128x128 MXU instead
of one-thread-per-pixel.

Layout note: all refs are rank-2 (or leading-4 rank-3 for the weights) with
tile-legal trailing dims — an earlier [TP, 4, Ci] blocking put 4 in the
sublane dimension (min tile is (8, 128) for f32) and failed Mosaic
compilation on real TPUs (HTTP 500 tpu_compile_helper via the axon remote
compiler). The affine rows are padded 4 -> 8 sublanes for the same reason.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, shift_ref, o_ref, *,
            ci: int, co: int, apply_affine: bool, apply_silu: bool):
    # x_ref: [TP, 4*ci] q-major; w_ref: [4, ci, co]; scale/shift: [8, co]
    # (rows 0-3 real); o_ref: [TP, 4*co] q-major
    s = []
    for d in range(4):
        s.append(jnp.dot(x_ref[:, d * ci:(d + 1) * ci], w_ref[d],
                         preferred_element_type=jnp.float32))  # [TP, co] fp32
    sr, si, sj, sk = s
    ys = [sr + si + sj + sk,
          sr - si - sj + sk,
          sr + si - sj - sk,
          sr - si + sj - sk]
    for q in range(4):
        v = ys[q]
        if apply_affine:
            v = v * scale_ref[q][None, :] + shift_ref[q][None, :]
        if apply_silu:
            v = v * jax.nn.sigmoid(v)
        o_ref[:, q * co:(q + 1) * co] = v.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_p", "apply_silu"))
def qconv1x1_fused(
    x: jnp.ndarray,           # [B, H, W, 4, Ci]
    w: jnp.ndarray,           # [4, 1, 1, Ci, Co] or [4, Ci, Co]
    scale: Optional[jnp.ndarray] = None,   # [4, Co] folded IQBN gamma/sqrt(var+eps)
    shift: Optional[jnp.ndarray] = None,   # [4, Co] folded beta - gamma*mu/sqrt(var+eps)
    *,
    block_p: int = 256,
    apply_silu: bool = True,
) -> jnp.ndarray:
    B, H, W, Q, Ci = x.shape
    if w.ndim == 5:
        w = w.reshape(4, Ci, -1)
    Co = w.shape[-1]
    P = B * H * W
    apply_affine = scale is not None

    P_pad = -(-P // block_p) * block_p
    xf = x.reshape(P, Q * Ci)
    if P_pad != P:
        xf = jnp.pad(xf, ((0, P_pad - P), (0, 0)))
    if apply_affine:
        sc = jnp.pad(scale.astype(jnp.float32), ((0, 4), (0, 0)))  # 4 -> 8 sublanes
        sh = jnp.pad(shift.astype(jnp.float32), ((0, 4), (0, 0)))
    else:
        sc = jnp.ones((8, Co), jnp.float32)
        sh = jnp.zeros((8, Co), jnp.float32)

    grid = (P_pad // block_p,)
    out = pl.pallas_call(
        functools.partial(_kernel, ci=Ci, co=Co,
                          apply_affine=apply_affine, apply_silu=apply_silu),
        out_shape=jax.ShapeDtypeStruct((P_pad, 4 * Co), x.dtype),
        grid=grid,
        interpret=jax.default_backend() == "cpu",  # CPU tests run the interpreter
        in_specs=[
            pl.BlockSpec((block_p, 4 * Ci), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, Ci, Co), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Co), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_p, 4 * Co), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * P_pad * 4 * Ci * Co + 16 * P_pad * Co,
            bytes_accessed=(P_pad * 4 * Ci * x.dtype.itemsize
                            + 4 * Ci * Co * 4 + P_pad * 4 * Co * x.dtype.itemsize),
            transcendentals=P_pad * Co * 4 if apply_silu else 0,
        ),
    )(xf, w.astype(x.dtype), sc, sh)
    return out[:P].reshape(B, H, W, 4, Co)


def fold_iqbn(gamma: jnp.ndarray, beta: jnp.ndarray, mean: jnp.ndarray,
              var: jnp.ndarray, eps: float = 1e-5):
    """IQBN eval affine -> (scale, shift) pair for the fused kernel."""
    inv = gamma * jax.lax.rsqrt(var + eps)
    return inv, beta - mean * inv
