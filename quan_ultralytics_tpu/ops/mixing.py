"""The canonical quaternion component-mixing matrix.

The QUAN separable quaternion convolution is ``y = M @ s`` where
``s_d = conv2d(x_d, w_d)`` is an independent per-component real convolution
and ``M`` is the constant "Zhou separable (CORRECTED)" sign matrix used by the
reference CUDA kernels (reference: ultralytics/nn/cuda/quaternion_ops.cu:152-155,
quaternion_ops_optimized.cu:169-172, quaternion_ops_head.cu:37-40, and the
classification PyTorch path classification/quaternion/qconv.py):

    y_r =  s_r + s_i + s_j + s_k
    y_i =  s_r - s_i - s_j + s_k
    y_j =  s_r + s_i - s_j - s_k
    y_k =  s_r - s_i + s_j - s_k

Note: the reference's *ultralytics* PyTorch fallback (conv.py:487-496) uses a
different sign convention that disagrees with its own CUDA kernels; the
published results ran on CUDA, so the CUDA matrix above is ground truth.

``M`` is a scaled orthogonal (Hadamard-like) matrix: ``M @ M.T == 4*I``.
Because the reference backward kernels ("Correct Left Conj separable",
quaternion_ops.cu:278-281 and :395-398) are exactly ``M.T`` applied to the
output cotangent, JAX autodiff of this forward reproduces the reference
input/weight gradients bit-for-bit in exact arithmetic. (The lone exception
is the reference bias gradient, which sums only the real cotangent component,
quaternion_ops.cu:491-501 — inconsistent with its own forward, where the real
bias feeds all four outputs through ``M[:, 0] == 1``. We use the
mathematically exact gradient; see ops/qconv.py.)
"""

import numpy as np
import jax.numpy as jnp

# Rows: output component (r, i, j, k). Columns: per-component conv sum s_d.
MIX_MATRIX = np.array(
    [
        [1.0, 1.0, 1.0, 1.0],
        [1.0, -1.0, -1.0, 1.0],
        [1.0, 1.0, -1.0, -1.0],
        [1.0, -1.0, 1.0, -1.0],
    ],
    dtype=np.float32,
)


def mix_components(s: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Apply the 4x4 mixing matrix along the quaternion component axis.

    Written as four slice-adds (not a dot) so XLA fuses it into the
    surrounding elementwise epilogue instead of emitting a tiny matmul.

    Args:
      s: array with a size-4 component axis at ``axis`` (default: the
        canonical BHWQC layout's Q axis).
    """
    sr, si, sj, sk = (jnp.take(s, q, axis=axis) for q in range(4))
    yr = sr + si + sj + sk
    yi = sr - si - sj + sk
    yj = sr + si - sj - sk
    yk = sr - si + sj - sk
    return jnp.stack([yr, yi, yj, yk], axis=axis if axis >= 0 else s.ndim + axis)
