"""Fused per-component attention Pallas kernel (flash-style, no N^2 in HBM).

QAttention (models/block.py, reference block.py:1485-1546) runs softmax
(Q K^T * scale) V independently per (batch, quaternion component, head). The
XLA path materializes the [B, 4, H, N, N] score matrix: at 1024px (P5 grid
32x32 -> N=1024) and batch 96 that is 6.4 GB bf16 + a 12.9 GB fp32 softmax
round-trip — tens of ms of pure HBM traffic for ~39 GFLOP of compute.

This kernel grids over (B*4*H) and keeps each [N, N] score block entirely in
VMEM: one MXU pass for Q K^T (fp32 accumulation), row softmax in fp32, cast
to the value dtype (matching the XLA path's `.astype(x.dtype)` before the AV
product), one MXU pass for P V. HBM traffic collapses to the O(N*d) q/k/v/o
tensors.

Layout (see qconv_fused.py for the Mosaic rules learned on this backend):
rank-3 refs with a leading singleton block dim; N rides the sublanes
(multiple of 8), head dims ride the lanes (padded by Mosaic; they are tiny).
Non-multiple-of-128 N is supported by padding (masked key columns softmax
to zero) but the auto-dispatch gate (`supports`) takes exact multiples
only — the padded path measured slower than XLA's materialized attention
at 640px/N=400 (see `supports`). VMEM bound: 2 fp32 [N, N] buffers = 8 MB
at N=1024; padded N <= 2048.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


_NEG = -1e30  # finite -inf stand-in: exp(_NEG - m) == 0 without NaN risk
_LOG2E = math.log2(math.e)   # exp(x) == exp2(x * log2(e)); fold into scale
_LN2 = math.log(2.0)


def _masked_exp_rows(s2, n_valid):
    """exp2 row-softmax numerator + reciprocal row sum.

    ``s2`` is the score matrix already in the log2 domain (the caller folds
    ``log2(e)`` into the softmax scale), so one native exp2 per element
    replaces exp's internal x*log2e multiply. Returns the UNNORMALIZED
    ``e = exp2(s2 - rowmax)`` and ``r = 1/rowsum(e)`` — callers fold ``r``
    into an [N, d]-shaped operand instead of normalizing the [N, N] matrix,
    which saves a full VPU pass over N^2 elements (the kernel is
    softmax/VPU-bound at dk=2: 15.4 ms/iter of the b128 profile)."""
    n = s2.shape[-1]
    if n_valid < n:
        col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
        s2 = jnp.where(col < n_valid, s2, _NEG)
    m = jnp.max(s2, axis=-1, keepdims=True)
    e = jnp.exp2(s2 - m)
    r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)  # [N, 1]
    return e, r


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    # fold softmax scale AND log2(e) into the [N, dk] operand — scaling the
    # [N, N] score matrix instead costs a full extra VPU pass
    q = q_ref[0] * (scale * _LOG2E)  # [N, dk]
    k = k_ref[0]  # [N, dk]
    v = v_ref[0]  # [N, dv]
    s2 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, N] fp32, log2 domain
    e, r = _masked_exp_rows(s2, n_valid)
    o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o * r).astype(o_ref.dtype)  # normalize on [N, dv], not [N, N]


def supports(n: int) -> bool:
    """Shape gate: tile-multiple N that fits a full softmax row in VMEM.

    Padded non-multiple N works (see qattention_fused) but MEASURED SLOWER
    than the XLA materialized path at 640px (N=400->512: 1649 vs 1797 img/s
    b128, 1138 vs 1226 b64 — the 1.64x padded compute plus kernel overhead
    loses at small score tensors), so the auto-dispatch takes exact
    multiples only; the padded path remains for direct callers."""
    return n % 128 == 0 and 128 <= n <= 2048


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale: float, n_valid: int):
    """Flash-style backward: recompute P in VMEM (no stored N^2 residual).

    With S = scale * Q K^T, P = softmax(S), O = P V and cotangent dO:
      dV = P^T dO
      dP = dO V^T
      dS = P o (dP - rowsum(dP o P))       [softmax VJP]
      dQ = scale * dS K,  dK = scale * dS^T Q

    Padded-N correctness: masked key columns give P[:, pad] = 0, so dV and
    dK rows at pad vanish; padded query rows carry dO = 0 (the output slice's
    VJP zero-pads), so their dS row is 0.
    """
    # All [N, N] work stays UNNORMALIZED (e = softmax numerator); the row
    # reciprocal r folds into [N, d]-shaped operands instead — with P = r∘E:
    #   dV = P^T dO            = E^T (r∘dO)
    #   dP = dO V^T            (bf16 MXU inputs, f32 accumulation: bf16
    #                           products are exact in f32, so this matches
    #                           the cast-to-f32 matmul it replaces)
    #   dS = P o (dP - rowsum(dP o P)) = r ∘ [E o (dP - r*rowsum(dP o E))]
    #   dQ = scale * dS K  = r ∘ (U Ks)          with U = E o (...)
    #   dK = scale * dS^T Q = U^T (r*ln2 ∘ Qs2)  (Qs2 carries scale*log2e)
    q2 = q_ref[0] * (scale * _LOG2E)  # [N, dk], log2-domain scores (see fwd)
    ks = k_ref[0] * scale
    v = v_ref[0]
    do = do_ref[0]
    s2 = jax.lax.dot_general(
        q2, k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    e, r = _masked_exp_rows(s2, n_valid)                # [N, N] f32, [N, 1]
    eb = e.astype(v.dtype)
    dor = (do.astype(jnp.float32) * r).astype(do.dtype)  # [N, dv]
    dv = jax.lax.dot_general(
        eb, dor, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [N, dv]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [N, N]
    rse = jnp.sum(dp * e, axis=-1, keepdims=True)       # rowsum(dP o E)
    u = (e * (dp - r * rse)).astype(q2.dtype)           # [N, N]
    dq = jnp.dot(u, ks, preferred_element_type=jnp.float32) * r
    # keep both dK operands in the activation dtype: r is f32, so the
    # unparenthesized fold promoted the [N, dk] operand to f32 and made a
    # mixed bf16 x f32 contraction (unverified on the Mosaic backend, and
    # it defeats u's explicit bf16 MXU cast)
    dk = jax.lax.dot_general(
        u, (q2 * (r * _LN2)).astype(q2.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _spec(n, d):
    return pl.BlockSpec((1, n, d), lambda i: (i, 0, 0))


def _fwd_call(q, k, v, scale, n_valid):
    G, N, dk = q.shape
    dv = v.shape[-1]
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_valid=n_valid),
        grid=(G,),
        in_specs=[_spec(N, dk), _spec(N, dk), _spec(N, dv)],
        out_specs=_spec(N, dv),
        out_shape=jax.ShapeDtypeStruct((G, N, dv), v.dtype),
        interpret=jax.default_backend() == "cpu",  # CPU tests run the interpreter
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attn(q, k, v, scale, n_valid):
    return _fwd_call(q, k, v, scale, n_valid)


def _attn_fwd(q, k, v, scale, n_valid):
    return _fwd_call(q, k, v, scale, n_valid), (q, k, v)


def _attn_bwd(scale, n_valid, res, do):
    q, k, v = res
    G, N, dk = q.shape
    dv = v.shape[-1]
    dq, dk_, dv_ = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, n_valid=n_valid),
        grid=(G,),
        in_specs=[_spec(N, dk), _spec(N, dk), _spec(N, dv), _spec(N, dv)],
        out_specs=[_spec(N, dk), _spec(N, dk), _spec(N, dv)],
        out_shape=[
            jax.ShapeDtypeStruct((G, N, dk), q.dtype),
            jax.ShapeDtypeStruct((G, N, dk), k.dtype),
            jax.ShapeDtypeStruct((G, N, dv), v.dtype),
        ],
        interpret=jax.default_backend() == "cpu",
    )(q, k, v, do)
    return dq, dk_, dv_


_attn.defvjp(_attn_fwd, _attn_bwd)


@functools.partial(jax.jit, static_argnames=("scale",))
def qattention_fused(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     scale: float) -> jnp.ndarray:
    """softmax(q @ k^T * scale) @ v per (batch, component, head).

    q, k: ``[B, Q4, H, N, dk]``; v: ``[B, Q4, H, N, dv]``.
    Returns ``[B, Q4, H, N, dv]`` in v.dtype. Differentiable: the custom VJP
    recomputes P per block in VMEM (flash backward — no N^2 residual).
    """
    B, Qc, H, N, dk = q.shape
    dv = v.shape[-1]
    # feasibility (not the dispatch gate `supports`, which also excludes
    # padded shapes that measured slower than XLA): padded N must fit VMEM
    assert 1 <= N and -(-N // 128) * 128 <= 2048, f"N={N}: padded N > 2048"
    G = B * Qc * H
    qf = q.reshape(G, N, dk)
    kf = k.reshape(G, N, dk)
    vf = v.reshape(G, N, dv)
    Np = -(-N // 128) * 128
    if Np != N:
        # pad to a tile-legal N; masked key columns get P = 0 in-kernel, and
        # padded query rows are sliced off below (their cotangents zero-pad
        # through the slice VJP, keeping the custom backward exact)
        pad = ((0, 0), (0, Np - N), (0, 0))
        qf, kf, vf = (jnp.pad(t, pad) for t in (qf, kf, vf))
    out = _attn(qf, kf, vf, scale, N)
    return out[:, :N].reshape(B, Qc, H, N, dv)
