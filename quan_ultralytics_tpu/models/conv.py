"""Quaternion convolution / normalization flax modules.

Channel conventions match the reference: all public channel counts are in
*total* quaternion-channel space (multiples of 4; internally C_total // 4
per-component channels), and an input channel count of 3 marks the RGB first
layer which applies the RGB->quaternion mapping
(reference: ultralytics/nn/modules/conv.py:109-126).

Activation layout is BHWQC ``[B, H, W, 4, C]`` (see package docstring).
"""

from __future__ import annotations

import contextlib
import contextvars
import math
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from quan_ultralytics_tpu.ops.mappings import rgb_to_quaternion
from quan_ultralytics_tpu.ops.qconv import autopad, qconv2d, qconv2d_phase0, qconv2d_phase1, qdense
from quan_ultralytics_tpu.ops.pooling import qupsample

IntOr2 = Union[int, Tuple[int, int]]

# Per-(mapping, component) init scale factors, reference conv.py:237-245.
SCALE_FACTORS = {
    "luminance": (1.0, 1.0, 1.0, 1.0),
    "mean_brightness": (1.0, 0.75, 0.75, 0.75),
    "raw_normalized": (1.0, 1.0, 1.0, 1.0),
    "hamilton": (1.0, 1.0, 1.0, 1.0),
    "poincare": (1.0, 1.0, 1.0, 1.0),
}
_DEFAULT_SCALES = (0.5, 0.5, 0.5, 0.5)


def qconv_kaiming_uniform(mapping_type: str = "poincare"):
    """Per-component scaled kaiming_uniform, reference conv.py:232-256.

    torch.nn.init.kaiming_uniform_(w, a=sqrt(5)*scale) with
    fan_in = C_in_per_group * kH * kW:
    bound = sqrt(3) * sqrt(2 / (1 + a^2)) / sqrt(fan_in).
    """
    scales = SCALE_FACTORS.get(mapping_type, _DEFAULT_SCALES)

    def init(key, shape, dtype=jnp.float32):
        # shape: [4, kH, kW, C_in_per_group, C_out]
        assert shape[0] == 4
        fan_in = shape[1] * shape[2] * shape[3]
        keys = jax.random.split(key, 4)
        comps = []
        for i, s in enumerate(scales):
            a = math.sqrt(5.0) * s
            bound = math.sqrt(3.0) * math.sqrt(2.0 / (1.0 + a * a)) / math.sqrt(max(fan_in, 1))
            comps.append(jax.random.uniform(keys[i], shape[1:], dtype, -bound, bound))
        return jnp.stack(comps)

    return init


def qconv_bias_uniform(mapping_type: str = "poincare"):
    """Real-bias init, reference conv.py:253-256: U(-b, b), b = scale_r/sqrt(fan_in)."""
    scales = SCALE_FACTORS.get(mapping_type, _DEFAULT_SCALES)

    def init(key, shape, dtype=jnp.float32, fan_in: int = 1):
        bound = scales[0] / math.sqrt(max(fan_in, 1))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# Trace-scoped "this is a training graph" marker: trainer.loss_fn runs under
# jax trace, so flipping this around the model apply scopes conv-impl
# defaults (fold threshold) to the TRAIN graph only — validator/predictor
# traces see the inference defaults. A ContextVar (not module-global mutable
# state): concurrent traces in other threads and re-entrant uses each see
# their own value, and the token reset restores the caller's state even on
# exceptions — impl selection can never leak across test/apply boundaries.
_TRAIN_GRAPH = contextvars.ContextVar("quan_train_graph", default=False)


@contextlib.contextmanager
def train_graph():
    """Mark the enclosed (traced) model apply as a training graph."""
    token = _TRAIN_GRAPH.set(True)
    try:
        yield
    finally:
        _TRAIN_GRAPH.reset(token)


class QConv2D(nn.Module):
    """Separable quaternion 2D convolution (reference conv.py:70-499).

    ``c1 == 3`` selects the RGB first layer: the input ``[B, H, W, 3]`` is
    mapped to one quaternion channel before the conv (conv.py:118-123).
    """

    c1: int
    c2: int
    k: IntOr2 = 1
    s: IntOr2 = 1
    p: Optional[IntOr2] = None  # None -> autopad ('same' for stride 1)
    g: int = 1
    d: IntOr2 = 1
    use_bias: bool = True
    mapping_type: str = "poincare"
    dtype: Any = None  # compute dtype; params stay float32
    impl: Optional[str] = None  # grouped | folded | auto — MXU mapping choice:
    # 'grouped' = one fgc=4g conv (1/4 the FLOPs of dense); 'folded' = mixing
    # folded into a dense kernel (4x FLOPs but full 128-lane occupancy —
    # wins on narrow layers); 'auto' = folded when C_out/4 < fold threshold
    # (32 for inference traces, 128 — i.e. everything — inside
    # `train_graph()`; $QUAN_QCONV_FOLD_MAX overrides both). Default impl
    # comes from $QUAN_QCONV_IMPL (benchmark knob), else 'grouped'.
    stem_mode: Optional[str] = None  # phase_out | phase_in — phase-composite
    # stem convs (ops/stem.py): identical math with space-to-depth-packed
    # intermediates so narrow stem activations never hit HBM lane-padded.
    # Requires k=3, s=2. Params are UNCHANGED (rearranged at apply time).
    packed: Optional[str] = None  # in | out | both — deep phase packing
    # (ops/stem.py expand_w_packed, channel-major r=2): activations stay
    # space-to-depth packed ACROSS layers 0-3 so the narrow-grid layout
    # flips of the two-layer stem path never materialize. 'out' on the RGB
    # first layer consumes an r=4 packing of the input. Params UNCHANGED.

    def _int8_act_absmax(self, x):
        """Resolve the int8 activation scale: running-max calibration when
        the 'quant' collection is mutable (ops/quant.calibrate_int8), the
        stored static scale when calibrated, dynamic per-call otherwise.
        Never created at init so uncalibrated checkpoints stay unchanged."""
        if self.is_initializing():
            return None
        if self.is_mutable_collection("quant"):
            v = self.variable("quant", "act_absmax",
                              lambda: jnp.zeros((), jnp.float32))
            v.value = jnp.maximum(v.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
            return None  # calibration passes still run dynamic
        if self.has_variable("quant", "act_absmax"):
            return self.get_variable("quant", "act_absmax")
        return None

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_weights: bool = False):
        if return_weights:
            # param-only mode for fused dispatch (models/conv.py Conv): declare
            # the exact same params and hand them to the caller's kernel
            assert self.c1 != 3 and self.c1 % 4 == 0 and self.c2 % 4 == 0
            kh, kw = (self.k, self.k) if isinstance(self.k, int) else self.k
            cin, cout = self.c1 // 4, self.c2 // 4
            w = self.param("w", qconv_kaiming_uniform(self.mapping_type),
                           (4, kh, kw, cin // self.g, cout), jnp.float32)
            b = None
            if self.use_bias:
                fan_in = kh * kw * (cin // self.g)
                b = self.param(
                    "b",
                    lambda key, shape, dtype=jnp.float32: qconv_bias_uniform(self.mapping_type)(
                        key, shape, dtype, fan_in=fan_in
                    ),
                    (cout,),
                    jnp.float32,
                )
            return w, b
        first = self.c1 == 3
        packed_first = first and (self.stem_mode == "phase_out" or self.packed == "out")
        if first:
            # run the RGB->quaternion mapping in the compute dtype: it is
            # pure elementwise math at FULL input resolution, and f32 there
            # costs ~10 ms/iter of HBM traffic @1024 b16 (profiled). The
            # reference's AMP autocast runs the same mapping in fp16.
            in_dtype = self.dtype or x.dtype
            x = x.astype(in_dtype)
        pending_map = None  # set on the RGB layer when the mapping should be
        # checkpointed TOGETHER with the conv (QUAN_STEM_REMAT=1): wrapping
        # only the mapping still stores its output (it is the conv's saved
        # input for the wgrad) and the stored copy's layout flip
        # (copy.9443 + fusion.2272, ~4.7 ms/step b24 @1024) survives — the
        # whole map+conv must sit inside one jax.checkpoint so the backward
        # recomputes the mapped tensor inside the conv VJP.
        # MEASURED NEGATIVE (r5 stemremat v2, b24 @1024): 146.3 vs 166.3
        # img/s — checkpointing the conv recomputes its full forward (MXU +
        # its own layout copies) in the backward, far costlier than the
        # 4.7 ms copy pair it removes. Stays opt-in for memory-pressed
        # configs; identity-tested (tests/test_stem.py remat test).
        if packed_first:
            import os as _os

            assert x.ndim == 4 and x.shape[-1] == 3
            remat = _os.environ.get("QUAN_STEM_REMAT") == "1"
            if self.packed == "out" and _os.environ.get("QUAN_STEM_L0") == "fine":
                # A/B alternative: no input pre-pack — layer 0 consumes the
                # mapped fine grid directly as the (ri=1, ro=2) instance of
                # expand_w_packed (a k=5, s=4 conv; ~2.6x fewer FLOPs than
                # the pre-packed k=2 form and no pack transpose, but the
                # narrow fine-grid input is XLA's to lay out)
                map_fn, map_ri = (lambda t: rgb_to_quaternion(t, self.mapping_type)), 1
            else:
                # mapping + r=4 space-to-depth fused: the narrow 1024-grid
                # input never materializes (see ops/stem.py)
                from quan_ultralytics_tpu.ops.stem import s2d4_rgb_mapped

                map_fn, map_ri = (lambda t: s2d4_rgb_mapped(t, self.mapping_type)), 4
            if remat and self.packed == "out":
                pending_map = (map_fn, map_ri)  # fused into the conv below
            else:
                # phase_out stem (non-packed) consumes x before the packed
                # call site; map here (remat wrap not plumbed for that path)
                x = map_fn(x)
            cin = 1
        elif first:
            import os as _os

            assert x.ndim == 4 and x.shape[-1] == 3, f"RGB first layer expects NHWC, got {x.shape}"
            map_fn = lambda t: rgb_to_quaternion(t, self.mapping_type)
            x = (jax.checkpoint(map_fn)(x)
                 if _os.environ.get("QUAN_STEM_REMAT") == "1" else map_fn(x))
            cin = 1
        else:
            assert self.c1 % 4 == 0, f"c1={self.c1} must be a multiple of 4"
            cin = self.c1 // 4
            want = 4 * cin if (self.stem_mode == "phase_in" or self.packed in ("in", "both")) else cin
            assert x.shape[-1] == want and x.shape[-2] == 4, f"expected [...,4,{want}], got {x.shape}"
        assert self.c2 % 4 == 0, f"c2={self.c2} must be a multiple of 4"
        cout = self.c2 // 4
        assert cin % self.g == 0

        kh, kw = (self.k, self.k) if isinstance(self.k, int) else self.k
        pad = autopad(self.k, self.p, self.d)

        w = self.param(
            "w",
            qconv_kaiming_uniform(self.mapping_type),
            (4, kh, kw, cin // self.g, cout),
            jnp.float32,
        )
        b = None
        if self.use_bias:
            fan_in = kh * kw * (cin // self.g)
            b = self.param(
                "b",
                lambda key, shape, dtype=jnp.float32: qconv_bias_uniform(self.mapping_type)(
                    key, shape, dtype, fan_in=fan_in
                ),
                (cout,),
                jnp.float32,
            )
        dtype = self.dtype or x.dtype
        if self.packed is not None:
            import os

            from quan_ultralytics_tpu.ops.qconv import qconv2d_packed

            assert self.g == 1 and self.d in (1, (1, 1)), "packed conv: g=1, d=1 only"
            # expand_w_packed builds the width tap map from the HEIGHT
            # stride/pad — non-square would be silently wrong
            sh_, sw_ = (self.s, self.s) if isinstance(self.s, int) else self.s
            assert sh_ == sw_ and pad[0] == pad[1], \
                "packed conv: square stride/padding only"
            ri, ro = {"in": (2, 1), "out": (1, 2), "both": (2, 2)}[self.packed]
            if packed_first:
                # cin=1 on the RGB layer, so the packed channel count tells
                # the input packing: 16 = r=4 pre-pack (s2d4_rgb_mapped),
                # 1 = unpacked fine grid (QUAN_STEM_L0=fine)
                ri = (pending_map[1] if pending_map is not None
                      else {16: 4, 1: 1}[x.shape[-1]])
            # QUAN_QCONV_IMPL=int8 extends to the packed stem unless
            # QUAN_PACKED_IMPL explicitly overrides
            packed_impl = os.environ.get(
                "QUAN_PACKED_IMPL",
                "int8" if os.environ.get("QUAN_QCONV_IMPL") == "int8" else "folded")
            if (packed_impl == "int8"
                    and self.c2 < int(os.environ.get("QUAN_INT8_MIN_C", "0"))):
                packed_impl = "folded"  # narrow stem layers stay bf16 under
                #                         the mixed-precision int8 gate
            if pending_map is not None and packed_impl != "int8":
                map_fn = pending_map[0]

                def mapped_conv(rgb, w_, b_):
                    return qconv2d_packed(map_fn(rgb).astype(dtype), w_, b_,
                                          stride=self.s, padding=pad,
                                          ri=ri, ro=ro, impl=packed_impl)

                return jax.checkpoint(mapped_conv)(x, w, b)
            if pending_map is not None:  # int8 calibration path: no remat
                x = pending_map[0](x)
            return qconv2d_packed(
                x.astype(dtype), w, b,
                stride=self.s, padding=pad, ri=ri, ro=ro,
                impl=packed_impl,
                act_absmax=(self._int8_act_absmax(x)
                            if packed_impl == "int8" else None),
            )
        if self.stem_mode == "phase_out":
            assert (kh, kw) == (3, 3) and self.s in (2, (2, 2))
            if packed_first:
                from quan_ultralytics_tpu.ops.qconv import qconv2d_phase0_packed

                return qconv2d_phase0_packed(x.astype(dtype), w, b)
            return qconv2d_phase0(x.astype(dtype), w, b, groups=self.g)
        if self.stem_mode == "phase_in":
            assert (kh, kw) == (3, 3) and self.s in (2, (2, 2))
            return qconv2d_phase1(x.astype(dtype), w, b, groups=self.g)
        import os

        impl = self.impl or os.environ.get("QUAN_QCONV_IMPL", "grouped")
        if impl == "auto":
            # fold (dense-kernel) narrow layers: 4x essential FLOPs but full
            # 128-lane MXU occupancy; threshold tunable for on-chip sweeps.
            # The best threshold is MODE-dependent (r4 trainfold A/B): the
            # backward's layout flips at folded/grouped boundaries cost more
            # than dense FLOPs, so training folds everything (fold_max=128:
            # 156.4 vs 140.5 img/s b24@1024) while inference keeps 32
            # (32 > 64 > 16, r3 fold A/B). Trainer scopes the train default
            # via `train_graph()` during its loss trace.
            fold_max = int(os.environ.get(
                "QUAN_QCONV_FOLD_MAX", "128" if _TRAIN_GRAPH.get() else "32"))
            impl = "folded" if (cout < fold_max and self.g == 1) else "grouped"
        if impl == "int8" and self.c2 < int(os.environ.get("QUAN_INT8_MIN_C", "0")):
            # mixed-precision serving: int8 only where the conv is wide
            # enough for the s8 MXU 2x to beat the per-layer quant/dequant
            # passes; narrow layers stay bf16-folded (r4 i8c: uniform int8
            # 864 vs bf16 985 img/s — the narrow layers are where the
            # overhead exceeds the win)
            impl = "folded"
        if impl == "int8" and self.g == 1:
            # opt-in PTQ serving path (see ops/qconv.py qconv2d_int8):
            # quantize the mixing-folded dense kernel per out channel,
            # activations dynamically per tensor — s8 MXU is 2x bf16 peak
            from quan_ultralytics_tpu.ops.mixing import MIX_MATRIX
            from quan_ultralytics_tpu.ops.qconv import fold_dense_kernel, qconv2d_int8

            dk = fold_dense_kernel(w, jnp.asarray(MIX_MATRIX))
            return qconv2d_int8(x.astype(dtype), dk, b, stride=self.s,
                                padding=pad, dilation=self.d,
                                act_absmax=self._int8_act_absmax(x))
        if impl == "folded" and self.g == 1:
            from quan_ultralytics_tpu.ops.mixing import MIX_MATRIX
            from quan_ultralytics_tpu.ops.qconv import fold_dense_kernel, qconv2d_folded

            dk = fold_dense_kernel(w, jnp.asarray(MIX_MATRIX))
            return qconv2d_folded(x.astype(dtype), dk, b, stride=self.s,
                                  padding=pad, dilation=self.d)
        return qconv2d(
            x.astype(dtype),
            w,
            b,
            stride=self.s,
            padding=pad,
            dilation=self.d,
            groups=self.g,
        )


class IQBN(nn.Module):
    """Independent Quaternion Batch Norm (reference conv.py:501-571).

    Separate statistics and affine per (component, channel): gamma/beta and
    running stats are shaped ``[4, C]``. Batch statistics are taken over
    (B, H, W); in train mode the variance gets the reference's extra 1e-8
    (conv.py:557) before both the running update and the normalisation.

    Under `pjit` data parallelism the batch reduction spans the *global*
    batch (XLA inserts the cross-replica collectives), i.e. synced BN. The
    reference computes per-GPU statistics; global stats are a strict quality
    improvement and identical in the single-chip case.
    """

    c: int  # total channels (4 * per-component)
    eps: float = 1e-5
    momentum: float = 0.1
    dtype: Any = None
    phase_packed: bool = False  # input is space-to-depth packed [..., 4, 4*C]
    # (stem path, ops/stem.py): stats reduce over the phase axis too, which
    # reproduces the unpacked statistics EXACTLY (phases partition positions)
    packed_cmajor: bool = False  # same, but channel-major (c, a, b) packing
    # (deep-packed stem, expand_w_packed): affine repeats per channel

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, return_affine: bool = False):
        assert self.c % 4 == 0
        C = self.c // 4
        gamma = self.param("gamma", nn.initializers.ones, (4, C), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (4, C), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((4, C), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((4, C), jnp.float32))
        if return_affine:
            # param-only mode for fused eval dispatch (Conv): declare the same
            # params/stats and return them for an external folded kernel
            return gamma, beta, ra_mean.value, ra_var.value
        want = 4 * C if (self.phase_packed or self.packed_cmajor) else C
        assert x.shape[-1] == want and x.shape[-2] == 4, f"expected [...,4,{want}], got {x.shape}"

        if train:
            xf = x.astype(jnp.float32)
            if self.phase_packed or self.packed_cmajor:
                B, H, W, Q, _ = xf.shape
                shp = (B, H, W, Q, C, 4) if self.packed_cmajor else (B, H, W, Q, 4, C)
                red = (0, 1, 2, 5) if self.packed_cmajor else (0, 1, 2, 4)
                xp = xf.reshape(shp)
                mean = xp.mean(axis=red)
                var = xp.var(axis=red) + 1e-8
            else:
                mean = xf.mean(axis=(0, 1, 2))
                var = xf.var(axis=(0, 1, 2)) + 1e-8
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * var
        else:
            mean, var = ra_mean.value, ra_var.value

        dtype = self.dtype or x.dtype
        scale = (gamma * jax.lax.rsqrt(var + self.eps)).astype(dtype)
        shift = (beta - gamma * mean * jax.lax.rsqrt(var + self.eps)).astype(dtype)
        if self.phase_packed:
            scale = jnp.tile(scale, (1, 4))
            shift = jnp.tile(shift, (1, 4))
        elif self.packed_cmajor:
            scale = jnp.repeat(scale, 4, axis=-1)
            shift = jnp.repeat(shift, 4, axis=-1)
        return x.astype(dtype) * scale + shift


class IQLN(nn.Module):
    """Quaternion layer norm over (H, W, C) per component (conv.py:588-611)."""

    c: int  # total channels
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = self.c // 4
        weight = self.param("weight", nn.initializers.ones, (4, C), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (4, C), jnp.float32)
        xf = x.astype(jnp.float32)
        # Reference normalizes over (C, H, W) keeping batch and Q separate.
        mean = xf.mean(axis=(1, 2, 4), keepdims=True)
        var = xf.var(axis=(1, 2, 4), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * weight + bias).astype(x.dtype)


class Conv(nn.Module):
    """QConv2D + IQBN + SiLU — the universal block (reference conv.py:788-813).

    The whole YOLO graph is quaternion-by-construction because every "Conv"
    in the YAML resolves to this.
    """

    c1: int
    c2: int
    k: IntOr2 = 1
    s: IntOr2 = 1
    p: Optional[IntOr2] = None
    g: int = 1
    d: IntOr2 = 1
    act: bool = True
    mapping_type: str = "poincare"
    dtype: Any = None
    stem_mode: Optional[str] = None  # see QConv2D.stem_mode
    packed: Optional[str] = None  # see QConv2D.packed (deep phase packing)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        import os

        k1 = (self.k in (1, (1, 1)) and self.s in (1, (1, 1))
              and self.p in (None, 0, (0, 0)))  # qconv1x1_fused has no stride/pad
        if (not train and k1 and self.g == 1 and self.stem_mode is None
                and self.packed is None
                and self.c1 != 3 and os.environ.get("QUAN_FUSED_1X1") == "1"):
            # single fused Pallas kernel: 4 MXU matmuls + mixing + folded
            # IQBN + SiLU, reading BHWQC directly (the TPU analog of the
            # reference's fused CUDA kernel, quaternion_ops_optimized.cu:422)
            from quan_ultralytics_tpu.ops.pallas.qconv_fused import fold_iqbn, qconv1x1_fused

            w, _ = QConv2D(
                self.c1, self.c2, self.k, self.s, self.p, self.g, self.d,
                use_bias=False, mapping_type=self.mapping_type, dtype=self.dtype,
                name="conv",
            )(x, return_weights=True)
            gamma, beta, mean, var = IQBN(self.c2, dtype=self.dtype, name="bn")(
                None, return_affine=True
            )
            scale, shift = fold_iqbn(gamma, beta, mean, var)
            dtype = self.dtype or x.dtype
            return qconv1x1_fused(x.astype(dtype), w, scale, shift,
                                  apply_silu=self.act)
        x = QConv2D(
            self.c1, self.c2, self.k, self.s, self.p, self.g, self.d,
            use_bias=False, mapping_type=self.mapping_type, dtype=self.dtype,
            stem_mode=self.stem_mode, packed=self.packed, name="conv",
        )(x)
        x = IQBN(self.c2, dtype=self.dtype,
                 phase_packed=self.stem_mode == "phase_out",
                 packed_cmajor=self.packed in ("out", "both"), name="bn")(x, train=train)
        return nn.silu(x) if self.act else x


def DWConv(c1: int, c2: int, k: IntOr2 = 1, s: IntOr2 = 1, d: IntOr2 = 1, act: bool = True, **kw) -> Conv:
    """Depth-wise quaternion conv: groups = gcd(c1//4, c2//4) (conv.py:918-923)."""
    return Conv(c1, c2, k, s, g=math.gcd(c1 // 4, c2 // 4), d=d, act=act, **kw)


class QUpsample(nn.Module):
    """Nearest/bilinear upsample over BHWQC (reference conv.py:1218-1246)."""

    scale: int = 2
    mode: str = "nearest"

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return qupsample(x, self.scale, self.mode)


class QDense(nn.Module):
    """Quaternion dense layer with full Hamilton product.

    Reference: classification/quaternion/qconv.py:878-998. Input/output are
    ``[..., 4, F]`` (the reference flattens to component-major 1D and splits
    into quarters; keeping the axes explicit is equivalent).
    """

    f_in: int  # total input features (multiple of 4)
    f_out: int
    use_bias: bool = True
    mapping_type: str = "poincare"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.f_in % 4 == 0 and self.f_out % 4 == 0
        fi, fo = self.f_in // 4, self.f_out // 4
        assert x.shape[-1] == fi and x.shape[-2] == 4, f"expected [...,4,{fi}], got {x.shape}"
        scales = SCALE_FACTORS.get(self.mapping_type, _DEFAULT_SCALES)

        def w_init(key, shape, dtype=jnp.float32):
            keys = jax.random.split(key, 4)
            comps = []
            for i, s in enumerate(scales):
                a = math.sqrt(5.0) * s
                bound = math.sqrt(3.0) * math.sqrt(2.0 / (1.0 + a * a)) / math.sqrt(fi)
                comps.append(jax.random.uniform(keys[i], shape[1:], dtype, -bound, bound))
            return jnp.stack(comps)

        w = self.param("w", w_init, (4, fi, fo), jnp.float32)
        b = None
        if self.use_bias:
            def b_init(key, shape, dtype=jnp.float32):
                keys = jax.random.split(key, 4)
                rows = []
                for i, s in enumerate(scales):
                    bound = s / math.sqrt(fi)
                    rows.append(jax.random.uniform(keys[i], shape[1:], dtype, -bound, bound))
                return jnp.stack(rows)

            b = self.param("b", b_init, (4, fo), jnp.float32)
        dtype = self.dtype or x.dtype
        return qdense(x.astype(dtype), w, b)
