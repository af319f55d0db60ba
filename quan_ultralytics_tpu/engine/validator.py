"""Validator: run the (EMA) model over a val split and compute mAP.

Analog of reference engine/validator.py (BaseValidator :107) +
models/yolo/obb/val.py (OBBValidator) / detect/val.py. The device side
(forward + decode + fixed-shape NMS) is one jitted function; matching and AP
accumulate on host (tiny work).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from quan_ultralytics_tpu.data.build import build_dataloader
from quan_ultralytics_tpu.data.dataset import YOLODataset
from quan_ultralytics_tpu.models.tasks import DetectionModel
from quan_ultralytics_tpu.ops.boxes import non_max_suppression, xywh2xyxy
from quan_ultralytics_tpu.utils.metrics import DetMetrics


class Validator:
    def __init__(self, model: DetectionModel, imgsz: int = 640,
                 conf: float = 0.001, iou: float = 0.7, max_det: int = 300):
        self.model = model
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        rotated = model.task == "obb"

        @jax.jit
        def infer(variables, img):
            out = model.module.apply(variables, img, train=False)
            pred = model.decode(out)
            return non_max_suppression(
                pred, conf_thres=self.conf, iou_thres=self.iou,
                max_det=self.max_det, nc=model.nc, rotated=rotated,
            )

        self._infer = infer

    def __call__(self, variables, ds: YOLODataset, batch_size: int = 8,
                 max_labels: int = 256, save_json: Optional[str] = None) -> Dict[str, float]:
        """Run validation; optionally dump COCO-format detections json
        (reference detect/val.py pred_to_json / save_json)."""
        rotated = self.model.task == "obb"
        metrics = DetMetrics(nc=self.model.nc, rotated=rotated)
        json_dets = [] if save_json else None
        image_idx = 0
        for batch in build_dataloader(ds, batch_size, self.imgsz, hyp=None,
                                      max_labels=max_labels, augment=False,
                                      shuffle=False, drop_last=False):
            det, ok = self._infer(variables, jnp.asarray(batch["img"]))
            det, ok = np.asarray(det), np.asarray(ok)
            for b in range(det.shape[0]):
                keep = ok[b]
                if rotated:
                    pred_boxes = det[b, keep, :5]          # xywhr pixels
                    conf, cls = det[b, keep, 5], det[b, keep, 6]
                    gmask = batch["mask"][b]
                    gb = batch["bboxes"][b][gmask].copy()  # normalized xywhr
                    gb[:, :4] *= self.imgsz
                    gt_boxes = gb
                else:
                    pred_boxes = det[b, keep, :4]          # xyxy pixels
                    conf, cls = det[b, keep, 4], det[b, keep, 5]
                    gmask = batch["mask"][b]
                    gb = batch["bboxes"][b][gmask] * self.imgsz
                    gt_boxes = np.asarray(xywh2xyxy(jnp.asarray(gb)))
                gt_cls = batch["cls"][b][gmask].astype(np.float32)
                metrics.update(pred_boxes, conf, cls.astype(np.float32), gt_boxes, gt_cls)
                if json_dets is not None:
                    for bi in range(len(pred_boxes)):
                        if rotated:
                            x, y, w, h, r = pred_boxes[bi][:5]
                            box = [float(x - w / 2), float(y - h / 2), float(w), float(h)]
                            extra = {"angle": float(r)}
                        else:
                            x1, y1, x2, y2 = pred_boxes[bi][:4]
                            box = [float(x1), float(y1), float(x2 - x1), float(y2 - y1)]
                            extra = {}
                        json_dets.append({
                            "image_id": image_idx + b,
                            "category_id": int(cls[bi]),
                            "bbox": [round(v, 3) for v in box],
                            "score": round(float(conf[bi]), 5),
                            **extra,
                        })
            image_idx += det.shape[0]
        if json_dets is not None:
            import json as _json
            from pathlib import Path

            Path(save_json).write_text(_json.dumps(json_dets))
        return metrics.compute()
