"""Post-training int8 quantization: activation-range calibration.

The QUAN_QCONV_IMPL=int8 serving path (ops/qconv.py:qconv2d_int8) quantizes
the mixing-folded conv kernels per out channel and activations per tensor.
With no calibrated ranges it falls back to DYNAMIC activation scales — a
full extra |x|-max read per conv layer, measured to cost more than the s8
MXU saves (767.7 vs 917.1 img/s @1024 b128, scripts/r3_results.jsonl i8).

`calibrate_int8` runs representative batches through the model collecting a
running per-layer |x| max into a flax 'quant' collection; serving applies
with that collection use STATIC scales (no per-call reduction). This is the
TPU equivalent of the reference's fused int8 inference intent
(quaternion_ops_optimized.cu:422) with the standard PTQ absmax recipe.

Usage:
    os.environ["QUAN_QCONV_IMPL"] = "int8"
    variables = calibrate_int8(model, variables, batches)   # few batches
    out = model.module.apply(variables, img, train=False)   # static scales
"""

from __future__ import annotations

import os
from typing import Iterable

import jax.numpy as jnp


def calibrate_int8(model, variables, batches: Iterable, impl: str = "int8"):
    """Collect per-conv-layer activation absmax over ``batches``.

    Args:
      model: a DetectionModel (or any wrapper exposing ``.module``).
      variables: its variables (params + batch_stats).
      batches: iterable of input image arrays ``[B, H, W, 3]`` —
        representative data; a handful of batches is standard for absmax PTQ.
      impl: value QUAN_QCONV_IMPL is pinned to while tracing (the int8
        branches must be the ones executing for their scales to exist).

    Returns variables with a ``quant`` collection holding one scalar
    ``act_absmax`` per quantized conv. Apply with these variables (and the
    same impl) to serve with static scales.
    """
    import jax

    saved = os.environ.get("QUAN_QCONV_IMPL")
    os.environ["QUAN_QCONV_IMPL"] = impl
    try:
        # jit the calibration pass: an eager apply dispatches per-op (and on
        # the tunneled TPU each dispatch is a remote round-trip). Two
        # compiles total: without and with the 'quant' collection.
        fwd = jax.jit(lambda vin, img: model.module.apply(
            vin, img, train=False, mutable=["quant"])[1]["quant"])
        quant = {}
        for img in batches:
            vin = {**variables, "quant": quant} if quant else dict(variables)
            quant = jax.device_get(fwd(vin, jnp.asarray(img)))
        if not quant:
            raise ValueError(
                "calibration collected no scales — no batches, or no conv "
                f"took the int8 path under impl={impl!r}")
        return {**variables, "quant": quant}
    finally:
        if saved is None:
            os.environ.pop("QUAN_QCONV_IMPL", None)
        else:
            os.environ["QUAN_QCONV_IMPL"] = saved
