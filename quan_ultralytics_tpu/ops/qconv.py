"""Separable quaternion convolution as MXU-friendly XLA primitives.

Semantics (ground truth = reference CUDA kernel
ultralytics/nn/cuda/quaternion_ops.cu:42-181 `qconv_forward_kernel_hamilton`):

    s_d  = conv2d(x_d, w_d)            # 4 independent per-component convs
    y    = M @ s  (+ bias_r on every component)

where ``M`` is the Zhou-separable mixing matrix (see ops/mixing.py). The real
bias is added to ``s_r`` *before* mixing (quaternion_ops.cu:87); since
``M[:, 0] == 1`` this equals adding ``bias_r`` to all four mixed outputs,
which is how we implement it (one fused add).

TPU realisation: instead of 4 separate convs (reference) or a CUDA
direct-conv kernel, we flatten the component axis into channels
(component-major) and issue ONE `lax.conv_general_dilated` with
``feature_group_count = 4 * groups``, so XLA tiles all four component convs
onto the MXU in a single op, then apply the constant 4x4 mixing as fused
elementwise adds. Accumulation is fp32 (`preferred_element_type`), matching
the CUDA kernel's fp32 accumulators (quaternion_ops.cu:71).

Gradients: the reference backward kernels (quaternion_ops.cu:184-470) apply
``M.T`` to the cotangent then standard conv-transpose / correlation — which
is exactly the mathematical VJP of the forward above, so plain JAX autodiff
reproduces them. The only reference deviation is the bias gradient: the CUDA
kernel sums only the real cotangent (quaternion_ops.cu:491-501), which is
inconsistent with its own forward (where bias reaches all four outputs). We
use the exact gradient; all detection-path convs are bias-free
(Conv wraps QConv2D with bias=False, conv.py:796) so this only affects the
classification stack's stem/blocks, where it is a strict correctness fix.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from quan_ultralytics_tpu.ops.mixing import mix_components

IntOr2 = Union[int, Tuple[int, int], Sequence[int]]


def _pair(v: IntOr2) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def autopad(k: IntOr2, p: Optional[IntOr2] = None, d: IntOr2 = 1) -> Tuple[int, int]:
    """'same'-style padding rule, matching reference conv.py:62-68."""
    kh, kw = _pair(k)
    dh, dw = _pair(d)
    if dh > 1:
        kh = dh * (kh - 1) + 1
    if dw > 1:
        kw = dw * (kw - 1) + 1
    if p is None:
        return (kh // 2, kw // 2)
    return _pair(p)


def qconv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: IntOr2 = 1,
    padding: IntOr2 = 0,
    dilation: IntOr2 = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Separable quaternion conv on BHWQC tensors.

    Args:
      x: input ``[B, H, W, 4, C_in]`` (per-component channels).
      w: weights ``[4, kH, kW, C_in // groups, C_out]`` — component axis
        leading, per-component HWIO. (Reference shape per component:
        ``[C_out, C_in/g, kH, kW]``, conv.py:134-142.)
      bias: optional real bias ``[C_out]`` (reference ``bias_r``).
      groups: grouped conv *within* each component (reference DWConv uses
        ``gcd(c1//4, c2//4)``, conv.py:918-923).

    Returns:
      ``[B, H_out, W_out, 4, C_out]`` in ``x.dtype``.
    """
    assert x.ndim == 5 and x.shape[3] == 4, f"expected BHWQC input, got {x.shape}"
    assert w.ndim == 5 and w.shape[0] == 4, f"expected [4,kH,kW,Cin/g,Cout] weights, got {w.shape}"
    B, H, W, _, cin = x.shape
    _, kh, kw, cin_pg, cout = w.shape
    assert cin_pg * groups == cin, f"cin {cin} != groups {groups} * {cin_pg}"

    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)

    # Flatten component axis into channels (component-major: [d, ci]).
    x_flat = x.reshape(B, H, W, 4 * cin)
    # Kernel HWIO with O ordered [d, j, co] to match XLA's grouped-conv
    # contract (output o consumes input block o // (O / fgc)).
    kernel = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(kh, kw, cin_pg, 4 * cout)

    # dtype policy: output dtype == input dtype. For bf16 inputs the TPU MXU
    # accumulates fp32 internally (matching the CUDA kernel's fp32
    # accumulators, quaternion_ops.cu:71); requesting an f32 output via
    # preferred_element_type would break conv autodiff under mixed dtypes.
    # HIGHEST precision stops XLA from splitting f32 operands into bf16
    # passes — the fast path feeds bf16 activations explicitly.
    s = lax.conv_general_dilated(
        x_flat,
        kernel.astype(x_flat.dtype),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=4 * groups,
        precision=lax.Precision.HIGHEST,
    )
    Ho, Wo = s.shape[1], s.shape[2]
    s = s.reshape(B, Ho, Wo, 4, cout)
    y = mix_components(s, axis=-2)
    if bias is not None:
        y = y + bias.astype(y.dtype)  # broadcasts over all 4 components (M[:,0] == 1)
    return y.astype(x.dtype)


def qconv2d_phase0(x: jnp.ndarray, w: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                   groups: int = 1) -> jnp.ndarray:
    """Stem layer-0 phase-composite qconv (see ops/stem.py): a k=3,s=2,p=1
    separable qconv producing its output space-to-depth packed — one
    k=5,s=4 conv, no narrow intermediate ever hits HBM.

    x: [B, H, W, 4, cin]; w: [4, 3, 3, cin/g, cout].
    Returns [B, H/4, W/4, 4, 4*cout] (per-component channels phase-major).
    """
    from quan_ultralytics_tpu.ops.stem import expand_w_l0

    B, H, W, _, cin = x.shape
    _, kh, kw, cin_pg, cout = w.shape
    assert kh == 3 and kw == 3
    w5 = jnp.stack([expand_w_l0(w[d]) for d in range(4)])  # [4,5,5,cin_pg,4cout]
    x_flat = x.reshape(B, H, W, 4 * cin)
    kernel = jnp.transpose(w5, (1, 2, 3, 0, 4)).reshape(5, 5, cin_pg, 4 * 4 * cout)
    s = lax.conv_general_dilated(
        x_flat, kernel.astype(x_flat.dtype), window_strides=(4, 4),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=4 * groups,
        precision=lax.Precision.HIGHEST,
    )
    Ho, Wo = s.shape[1], s.shape[2]
    y = mix_components(s.reshape(B, Ho, Wo, 4, 4 * cout), axis=-2)
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return y.astype(x.dtype)


def qconv2d_phase0_packed(x_packed: jnp.ndarray, w: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Stem layer-0 qconv on an r=4 space-to-depth-packed input (see
    ops/stem.py s2d4_rgb_mapped): k=2,s=1 conv over 16*cin-wide channels —
    the narrow 1024-grid input never exists on device, only the 256-grid
    64-channel packing. Output matches `qconv2d_phase0` (r=2 packed).

    x_packed: [B, H/4, W/4, 4, 16*cin]; w: [4, 3, 3, cin, cout].
    Returns [B, H/4, W/4, 4, 4*cout].
    """
    from quan_ultralytics_tpu.ops.stem import expand_w_l0_s2d4

    B, Hp, Wp, _, cin16 = x_packed.shape
    _, kh, kw, cin, cout = w.shape
    assert kh == 3 and cin16 == 16 * cin
    w2 = jnp.stack([expand_w_l0_s2d4(w[d]) for d in range(4)])  # [4,2,2,16cin,4cout]
    x_flat = x_packed.reshape(B, Hp, Wp, 4 * cin16)
    kernel = jnp.transpose(w2, (1, 2, 3, 0, 4)).reshape(2, 2, 16 * cin, 4 * 4 * cout)
    s = lax.conv_general_dilated(
        x_flat, kernel.astype(x_flat.dtype), window_strides=(1, 1),
        padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=4,
        precision=lax.Precision.HIGHEST,
    )
    y = mix_components(s.reshape(B, Hp, Wp, 4, 4 * cout), axis=-2)
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return y.astype(x_packed.dtype)


def qconv2d_phase1(x: jnp.ndarray, w: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                   groups: int = 1) -> jnp.ndarray:
    """Stem layer-1 phase-composite qconv: a k=3,s=2,p=1 separable qconv
    consuming the phase-packed layout from `qconv2d_phase0` — one k=2,s=1
    conv with top-left padding, producing the ORIGINAL (unpacked) output.

    x: [B, H', W', 4, 4*cin] phase-packed; w: [4, 3, 3, cin/g, cout].
    Returns [B, H', W', 4, cout].
    """
    from quan_ultralytics_tpu.ops.stem import expand_w_l1

    B, H, W, _, cin4 = x.shape
    _, kh, kw, cin_pg, cout = w.shape
    assert kh == 3 and kw == 3 and cin4 == 4 * cin_pg * groups
    w2 = jnp.stack([expand_w_l1(w[d]) for d in range(4)])  # [4,2,2,4cin_pg,cout]
    x_flat = x.reshape(B, H, W, 4 * cin4)
    kernel = jnp.transpose(w2, (1, 2, 3, 0, 4)).reshape(2, 2, 4 * cin_pg, 4 * cout)
    s = lax.conv_general_dilated(
        x_flat, kernel.astype(x_flat.dtype), window_strides=(1, 1),
        padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=4 * groups,
        precision=lax.Precision.HIGHEST,
    )
    y = mix_components(s.reshape(B, H, W, 4, cout), axis=-2)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def qconv2d_packed(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: IntOr2 = 1,
    padding: IntOr2 = 0,
    ri: int = 2,
    ro: int = 2,
    impl: str = "folded",
    act_absmax: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Separable qconv on space-to-depth phase-packed activations.

    The deep-packed stem (ops/stem.py expand_w_packed) keeps layers 0-3 of
    the 1024px graph entirely on the 256/128 grids: narrow early activations
    never exist lane-padded in HBM and no pack/unpack layout flips
    materialize between layers (the round-2 profile showed ~12 ms/iter of
    such copies at the 256-grid).

    Args:
      x: ``[B, Hc, Wc, 4, C_in * ri * ri]`` channel-major packed input
        (``ri == 1`` means unpacked).
      w: unpacked per-component weights ``[4, kh, kw, C_in, C_out]`` — the
        same params as the plain path; rearranged at apply time.
      impl: 'folded' (mixing folded into one dense conv — full MXU lanes,
        4x FLOPs) or 'grouped' (fgc=4, essential FLOPs).

    Returns: ``[B, Ho, Wo, 4, C_out * ro * ro]`` channel-major packed.
    """
    from quan_ultralytics_tpu.ops.mixing import MIX_MATRIX
    from quan_ultralytics_tpu.ops.stem import expand_w_packed

    B, Hc, Wc, q4, cin_p = x.shape
    assert q4 == 4
    _, kh, kw, cin, cout = w.shape
    assert cin_p == cin * ri * ri, f"packed cin {cin_p} != {cin}*{ri}^2"
    sh, _ = _pair(stride)
    ph, pw = _pair(padding)

    wks = [expand_w_packed(w[d], sh, ph, ri, ro) for d in range(4)]
    wk = jnp.stack([k for k, _, _ in wks])  # [4, KH, KW, cin*ri^2, cout*ro^2]
    pl, S = wks[0][1], wks[0][2]
    KH, KW = wk.shape[1], wk.shape[2]
    # output size on the packed grid must cover the original conv's output
    Jout_h = ((Hc * ri + 2 * ph - kh) // sh + 1) // ro
    Jout_w = ((Wc * ri + 2 * pw - kw) // sh + 1) // ro
    pr_h = S * (Jout_h - 1) + KH - 1 - pl - (Hc - 1)
    pr_w = S * (Jout_w - 1) + KW - 1 - pl - (Wc - 1)

    x_flat = x.reshape(B, Hc, Wc, 4 * cin_p)
    if impl in ("folded", "int8"):
        mix = jnp.asarray(MIX_MATRIX).astype(wk.dtype)
        # K[(d, ci_p) -> (q, co_p)] = M[q, d] * wk[d, ..., ci_p, co_p]
        kernel = jnp.einsum("qd,dhwio->hwdiqo", mix, wk,
                            precision=lax.Precision.HIGHEST)
        kernel = kernel.reshape(KH, KW, 4 * cin_p, 4 * cout * ro * ro)
        fgc = 1
    else:
        kernel = jnp.transpose(wk, (1, 2, 3, 0, 4)).reshape(KH, KW, cin_p, 4 * cout * ro * ro)
        fgc = 4
    if impl == "int8":
        # PTQ variant of the folded packed conv (see qconv2d_int8): the
        # expanded kernel is mostly structural zeros, which symmetric
        # per-out-channel absmax quantization represents exactly
        eps = 1e-8
        amax = (jnp.max(jnp.abs(x_flat.astype(jnp.float32)))
                if act_absmax is None else act_absmax.astype(jnp.float32))
        sx = amax / 127.0 + eps
        xq = jnp.clip(jnp.round(x_flat.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        kf = kernel.astype(jnp.float32)
        swt = (jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0) + eps
        wq = jnp.clip(jnp.round(kf / swt), -127, 127).astype(jnp.int8)
        acc = lax.conv_general_dilated(
            xq, wq,
            window_strides=(S, S),
            padding=((pl, pr_h), (pl, pr_w)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        s = acc.astype(jnp.float32) * (sx * swt)
    else:
        s = lax.conv_general_dilated(
            x_flat,
            kernel.astype(x_flat.dtype),
            window_strides=(S, S),
            padding=((pl, pr_h), (pl, pr_w)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=fgc,
            precision=lax.Precision.HIGHEST,
        )
    y = s.reshape(B, s.shape[1], s.shape[2], 4, cout * ro * ro)
    if impl not in ("folded", "int8"):  # mixing already folded into the kernel
        y = mix_components(y, axis=-2)
    if bias is not None:
        y = y + jnp.repeat(bias, ro * ro).astype(y.dtype)
    return y.astype(x.dtype)


def fold_dense_kernel(w: jnp.ndarray, mix: jnp.ndarray) -> jnp.ndarray:
    """Fold the mixing matrix into a dense HWIO kernel (inference option).

    ``K[(d,ci) -> (q,co)] = M[q,d] * w[d,ci,co]`` turns qconv into a single
    ungrouped conv with 4x the essential FLOPs but perfect MXU occupancy —
    profitable for narrow layers where grouped convs underutilise the 128-lane
    MXU. Only valid for groups == 1.
    """
    _, kh, kw, cin, cout = w.shape
    k = jnp.einsum("qd,dhwio->hwdiqo", mix.astype(w.dtype), w, precision=lax.Precision.HIGHEST)
    return k.reshape(kh, kw, 4 * cin, 4 * cout)


def qconv2d_folded(
    x: jnp.ndarray,
    dense_kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: IntOr2 = 1,
    padding: IntOr2 = 0,
    dilation: IntOr2 = 1,
) -> jnp.ndarray:
    """qconv via a pre-folded dense kernel (see `fold_dense_kernel`)."""
    B, H, W, _, cin = x.shape
    kh, kw, cin4, cout4 = dense_kernel.shape
    assert cin4 == 4 * cin
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    y = lax.conv_general_dilated(
        x.reshape(B, H, W, 4 * cin),
        dense_kernel.astype(x.dtype),
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    y = y.astype(x.dtype).reshape(B, y.shape[1], y.shape[2], 4, cout4 // 4)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def qconv2d_int8(
    x: jnp.ndarray,
    dense_kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    stride: IntOr2 = 1,
    padding: IntOr2 = 0,
    dilation: IntOr2 = 1,
    eps: float = 1e-8,
    act_absmax: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Opt-in int8 qconv: the folded dense kernel quantized per output
    channel, activations quantized per tensor, s8 x s8 -> s32 on the MXU,
    dequantized in the epilogue.

    v5e's int8 MXU peak is 2x its bf16 peak; the conv bucket is the largest
    remaining slice of the inference profile (~41 ms of 140 at b128@1024),
    so this is the serving-throughput lever. The quantization recipe is the
    standard PTQ one (symmetric absmax; per-channel weights so narrow
    channels don't share scale with wide ones).

    ``act_absmax``: calibrated |x| max (scalar) — the static-scale path.
    Without it the scale is computed dynamically per call, which costs an
    extra full read of x (the reduction can't fuse with the quantize pass);
    measured 767.7 vs bf16's 917.1 img/s @1024 b128, i.e. dynamic quant
    eats the whole s8 MXU win. Calibrate with ops/quant.calibrate_int8.
    Ship as the QUAN_QCONV_IMPL=int8 opt-in, never the default.
    """
    B, H, W, _, cin = x.shape
    kh, kw, cin4, cout4 = dense_kernel.shape
    assert cin4 == 4 * cin
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    xf = x.reshape(B, H, W, 4 * cin)
    amax = (jnp.max(jnp.abs(xf.astype(jnp.float32))) if act_absmax is None
            else act_absmax.astype(jnp.float32))
    sx = amax / 127.0 + eps
    xq = jnp.clip(jnp.round(xf.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    kf = dense_kernel.astype(jnp.float32)
    swt = (jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0) + eps  # [4*cout]
    wq = jnp.clip(jnp.round(kf / swt), -127, 127).astype(jnp.int8)
    acc = lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * swt)  # dequant epilogue (fused)
    y = y.reshape(B, y.shape[1], y.shape[2], 4, cout4 // 4)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def qdense(x: jnp.ndarray, w: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Quaternion dense layer with the FULL Hamilton product.

    Reference: classification/quaternion/qconv.py:878-998 (QDense). Four
    shared real linears (w_r, w_i, w_j, w_k) are applied to every input
    component and the 16 products combine with Hamilton signs:

        out_r = r_r - i_i - j_j - k_k
        out_i = r_i + i_r + j_k - k_j
        out_j = r_j - i_k + j_r + k_i
        out_k = r_k + i_j - j_i + k_r

    where ``a_b = linear_b(x_a)``.

    Args:
      x: ``[..., 4, F_in]``.
      w: ``[4, F_in, F_out]`` (component order r, i, j, k).
      bias: optional ``[4, F_out]`` — the reference's four per-linear biases
        ``b_d``, added to every ``a_d = linear_d(x_a)`` and therefore combined
        through the same Hamilton signs as the products (e.g. the real output
        picks up ``b_r - b_i - b_j - b_k``).

    Returns: ``[..., 4, F_out]``.
    """
    # p[a, d] = linear_d(x_a): [..., 4(a), 4(d), F_out]
    p = jnp.einsum("...af,dfo->...ado", x, w.astype(x.dtype), precision=lax.Precision.HIGHEST)
    if bias is not None:
        p = p + bias.astype(p.dtype)  # [d, F_out] broadcasts over the 'a' axis
    r_r, r_i, r_j, r_k = p[..., 0, 0, :], p[..., 0, 1, :], p[..., 0, 2, :], p[..., 0, 3, :]
    i_r, i_i, i_j, i_k = p[..., 1, 0, :], p[..., 1, 1, :], p[..., 1, 2, :], p[..., 1, 3, :]
    j_r, j_i, j_j, j_k = p[..., 2, 0, :], p[..., 2, 1, :], p[..., 2, 2, :], p[..., 2, 3, :]
    k_r, k_i, k_j, k_k = p[..., 3, 0, :], p[..., 3, 1, :], p[..., 3, 2, :], p[..., 3, 3, :]
    out_r = r_r - i_i - j_j - k_k
    out_i = r_i + i_r + j_k - k_j
    out_j = r_j - i_k + j_r + k_i
    out_k = r_k + i_j - j_i + k_r
    return jnp.stack([out_r, out_i, out_j, out_k], axis=-2)
