"""QUAN-TPU: a TPU-native quaternion vision framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
bryceag11/QUAN_ultralytics (Quaternion Approximation Networks, IROS 2025):
quaternion convolutions (Zhou-separable mixing), independent quaternion
batch-norm, Poincare RGB->quaternion input mappings, QUAN-YOLO11 detection /
oriented-bounding-box models with the quaternion angular (SO(3) geodesic)
loss, and the Q-WRN / Q-ResNet classification family.

Everything on the compute path is jittable JAX; parallelism is expressed with
`jax.sharding` over device meshes instead of DDP/NCCL; the hot quaternion
convolution maps onto the MXU as a single grouped convolution followed by a
constant 4x4 component-mixing contraction (optionally as a fused Pallas
kernel).

Canonical activation layout is ``[B, H, W, 4, C]`` ("BHWQC"): NHWC-flavored
so the flattened (4*C) channel axis maps onto TPU lanes, quaternion component
axis explicit, component-major when flattened. The reference's BCHWQ layout
(ultralytics/nn/modules/conv.py:433) is converted at the API boundary only.
"""

__version__ = "0.1.0"

from quan_ultralytics_tpu.ops.mixing import MIX_MATRIX, mix_components  # noqa: F401
