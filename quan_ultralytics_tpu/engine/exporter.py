"""Export: StableHLO / saved-params formats.

Analog of reference engine/exporter.py (:185-1500). The reference's 17
CUDA-era formats (TensorRT, CoreML, TFLite, ...) don't map to TPU serving;
the TPU-native export surface is:

  * ``stablehlo``: serialized StableHLO of the jitted forward+decode —
    portable into any XLA/PJRT runtime (the TPU analog of ONNX).
  * ``params``: pickled variables pytree + model yaml (reload with
    `YOLO(ckpt)`).

Both always export the *fused* inference graph (IQBN folded — the fusion the
reference left disabled, tasks.py:210-217, is free here since XLA fuses the
affine into the conv epilogue).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp

from quan_ultralytics_tpu.models.tasks import DetectionModel


def export_stablehlo(model: DetectionModel, variables, imgsz: int = 640,
                     batch: int = 1, path: str = "model.stablehlo") -> str:
    """Serialize the inference computation (forward + decode) as StableHLO."""

    def forward(img):
        out = model.module.apply(variables, img, train=False)
        return model.decode(out)

    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    lowered = jax.jit(forward).lower(x)
    text = lowered.as_text(dialect="stablehlo")
    Path(path).write_text(text)
    return path


def export_params(model: DetectionModel, variables, model_yaml: str,
                  names=None, path: str = "model.pkl") -> str:
    payload = {
        "model_yaml": model_yaml,
        "nc": model.nc,
        "names": names,
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
    }
    Path(path).write_bytes(pickle.dumps(payload))
    return path
