"""Pallas TPU kernels for the hot quaternion ops.

TPU replacements for the reference CUDA extension
(ultralytics/nn/cuda/quaternion_ops*.cu):

  * `qconv1x1_fused`: 1x1 quaternion conv as a blocked MXU matmul with the
    4x4 mixing, IQBN affine, and SiLU fused in-register — the analog of the
    reference's fused inference kernel `qconv_bn_silu_fused_kernel`
    (quaternion_ops_optimized.cu:422-467).

KxK convs stay on `lax.conv_general_dilated` (XLA's TPU conv emitter), with
the mixing/BN/SiLU epilogue fused by XLA; Pallas wins on the 1x1-dominated
CSP blocks where the op is a pure matmul.
"""

from quan_ultralytics_tpu.ops.pallas.qconv_fused import qconv1x1_fused

__all__ = ["qconv1x1_fused"]
