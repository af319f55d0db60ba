"""Functional quaternion ops (pure JAX; Pallas kernels under ops/pallas)."""

from quan_ultralytics_tpu.ops.mixing import MIX_MATRIX, mix_components
from quan_ultralytics_tpu.ops.mappings import rgb_to_quaternion
from quan_ultralytics_tpu.ops.qconv import qconv2d, qconv2d_folded

__all__ = [
    "MIX_MATRIX",
    "mix_components",
    "rgb_to_quaternion",
    "qconv2d",
    "qconv2d_folded",
]
