"""Predictor: image(s) -> Results (boxes/obb + conf + cls).

Analog of reference engine/predictor.py (BasePredictor.stream_inference
:222-306): letterbox preprocess on host, one jitted forward+decode+NMS on
device, box rescale back to the original image on host.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from quan_ultralytics_tpu.data.augment import letterbox
from quan_ultralytics_tpu.models.tasks import DetectionModel
from quan_ultralytics_tpu.ops.boxes import non_max_suppression, regularize_rboxes


@dataclass
class Results:
    """Minimal Results analog (reference engine/results.py:187, OBB :1596)."""

    orig_shape: tuple
    boxes: np.ndarray      # detect: [n, 6] xyxy+conf+cls; obb: [n, 7] xywhr+conf+cls
    names: Optional[List[str]] = None
    task: str = "detect"

    @property
    def xyxy(self):
        return self.boxes[:, :4] if self.task == "detect" else None

    @property
    def xywhr(self):
        return self.boxes[:, :5] if self.task == "obb" else None

    @property
    def conf(self):
        return self.boxes[:, -2]

    @property
    def cls(self):
        return self.boxes[:, -1]

    def __len__(self):
        return self.boxes.shape[0]


class Predictor:
    def __init__(self, model: DetectionModel, imgsz: int = 640,
                 conf: float = 0.25, iou: float = 0.45, max_det: int = 300,
                 names: Optional[List[str]] = None):
        self.model = model
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.names = names
        rotated = model.task == "obb"

        @jax.jit
        def infer(variables, img):
            # u8 input: normalize on device (4x less host->device traffic)
            if img.dtype == jnp.uint8:
                img = img.astype(jnp.float32) / 255.0
            out = model.module.apply(variables, img, train=False)
            pred = model.decode(out)
            return non_max_suppression(pred, conf_thres=self.conf, iou_thres=self.iou,
                                       max_det=self.max_det, nc=model.nc, rotated=rotated)

        self._infer = infer

    def __call__(self, variables, images: Union[np.ndarray, Sequence[np.ndarray], str, Path]) -> List[Results]:
        if isinstance(images, (str, Path)):
            from quan_ultralytics_tpu.data.loaders import load_source

            images = list(load_source(images))
        elif isinstance(images, np.ndarray) and images.ndim == 3:
            images = [images]

        from quan_ultralytics_tpu.data.native import letterbox_native

        batch, meta = [], []
        for im in images:
            h0, w0 = im.shape[:2]
            native = letterbox_native(im, self.imgsz)
            if native is not None:  # fused C++ letterbox+normalize hot path
                lbf, r, (dw, dh) = native
                batch.append(lbf)
            else:
                lb, r, (dw, dh) = letterbox(im, self.imgsz)
                batch.append(lb.astype(np.float32) / 255.0)
            meta.append((h0, w0, r, dw, dh))
        x = jnp.asarray(np.stack(batch))
        det, ok = self._infer(variables, x)
        det, ok = np.asarray(det), np.asarray(ok)

        results = []
        rotated = self.model.task == "obb"
        for b, (h0, w0, r, dw, dh) in enumerate(meta):
            d = det[b][ok[b]]
            if rotated:
                boxes = d.copy()  # xywhr, conf, cls
                boxes[:, 0] = (boxes[:, 0] - dw) / r
                boxes[:, 1] = (boxes[:, 1] - dh) / r
                boxes[:, 2] /= r
                boxes[:, 3] /= r
                if len(boxes):
                    boxes[:, :5] = np.asarray(regularize_rboxes(jnp.asarray(boxes[:, :5])))
            else:
                boxes = d.copy()  # xyxy, conf, cls
                boxes[:, [0, 2]] = np.clip((boxes[:, [0, 2]] - dw) / r, 0, w0)
                boxes[:, [1, 3]] = np.clip((boxes[:, [1, 3]] - dh) / r, 0, h0)
            results.append(Results((h0, w0), boxes, self.names, self.model.task))
        return results
