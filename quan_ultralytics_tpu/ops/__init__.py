"""Functional quaternion ops (pure JAX; Pallas kernels under ops/pallas)."""

from quan_ultralytics_tpu.ops.mixing import MIX_MATRIX, mix_components
from quan_ultralytics_tpu.ops.mappings import rgb_to_quaternion
from quan_ultralytics_tpu.ops.qconv import (
    autopad, fold_dense_kernel, qconv2d, qconv2d_folded, qdense,
)
from quan_ultralytics_tpu.ops.pooling import qavg_pool, qavg_pool_global, qmax_pool, qupsample
from quan_ultralytics_tpu.ops.activations import ACTIVATIONS, qrerelu, qsilu
from quan_ultralytics_tpu.ops.qinit import quaternion_chi_init

__all__ = [
    "MIX_MATRIX", "mix_components", "rgb_to_quaternion",
    "qconv2d", "qconv2d_folded", "fold_dense_kernel", "qdense", "autopad",
    "qmax_pool", "qavg_pool", "qavg_pool_global", "qupsample",
    "ACTIVATIONS", "qsilu", "qrerelu", "quaternion_chi_init",
]
