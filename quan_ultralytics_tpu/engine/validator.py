"""Validator: run the (EMA) model over a val split and compute mAP.

Analog of reference engine/validator.py (BaseValidator :107) +
models/yolo/obb/val.py (OBBValidator) / detect/val.py. The device side
(forward + decode + fixed-shape NMS) is one jitted function; matching and AP
accumulate on host (tiny work).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from quan_ultralytics_tpu.data.build import build_dataloader
from quan_ultralytics_tpu.data.dataset import YOLODataset
from quan_ultralytics_tpu.models.tasks import DetectionModel
from quan_ultralytics_tpu.ops.boxes import (
    non_max_suppression, scale_boxes, scale_rboxes, xywh2xyxy,
)
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
                 max_labels: int = 256, save_json: Optional[str] = None,
                 save_submission: Optional[str] = None, rect: bool = False) -> Dict[str, float]:
        """Run validation. Optional outputs:

        save_json: COCO-format detections in SOURCE-image coordinates
          (reference detect/val.py pred_to_json / save_json + scale_boxes).
        save_submission: DOTA Task1 directory — per-patch predictions are
          mapped back to patch-pixel coordinates, merged across patches via
          the ``{stem}__{x}_{y}`` naming, cross-patch rotated NMS applied,
          and Task1_{class}.txt files written (reference obb/val.py
          pred_to_json/eval_json via engine/dota_eval.DOTASubmission).
        """
        rotated = self.model.task == "obb"
        metrics = DetMetrics(nc=self.model.nc, rotated=rotated)
        json_dets = [] if save_json else None
        submission = None
        if save_submission:
            assert rotated, "DOTA submissions are an OBB-task output"
            from quan_ultralytics_tpu.engine.dota_eval import DOTASubmission

            submission = DOTASubmission(ds.names)
        image_idx = 0
        for batch in build_dataloader(ds, batch_size, self.imgsz, hyp=None,
                                      max_labels=max_labels, augment=False,
                                      shuffle=False, drop_last=False, with_meta=True,
                                      rect=rect):
            det, ok = self._infer(variables, jnp.asarray(batch["img"]))
            det, ok = np.asarray(det), np.asarray(ok)
            Hb, Wb = batch["img"].shape[1:3]  # == (imgsz, imgsz) unless rect
            # the tail batch pads by repeating indices; don't double-count
            n_real = len(set(batch["im_files"]))
            for b in range(min(det.shape[0], n_real)):
                keep = ok[b]
                ratio_pad = batch["ratio_pad"][b]  # (r, dw, dh)
                ori_shape = batch["ori_shape"][b]  # (h0, w0)
                if rotated:
                    pred_boxes = det[b, keep, :5]          # xywhr letterbox px
                    conf, cls = det[b, keep, 5], det[b, keep, 6]
                    gmask = batch["mask"][b]
                    gb = batch["bboxes"][b][gmask].copy()  # normalized xywhr
                    gb[:, :4] *= Hb  # OBB batches are square (rect asserts)
                    gt_boxes = gb
                    src_boxes = scale_rboxes(pred_boxes, ratio_pad)
                else:
                    pred_boxes = det[b, keep, :4]          # xyxy letterbox px
                    conf, cls = det[b, keep, 4], det[b, keep, 5]
                    gmask = batch["mask"][b]
                    gb = batch["bboxes"][b][gmask] * [Wb, Hb, Wb, Hb]
                    gt_boxes = np.asarray(xywh2xyxy(jnp.asarray(gb)))
                    src_boxes = scale_boxes(pred_boxes, ratio_pad, ori_shape)
                gt_cls = batch["cls"][b][gmask].astype(np.float32)
                metrics.update(pred_boxes, conf, cls.astype(np.float32), gt_boxes, gt_cls)
                stem = Path(batch["im_files"][b]).stem
                if submission is not None:
                    submission.add_patch(stem, src_boxes, conf, cls)
                if json_dets is not None:
                    for bi in range(len(src_boxes)):
                        if rotated:
                            x, y, w, h, r = src_boxes[bi][:5]
                            box = [float(x - w / 2), float(y - h / 2), float(w), float(h)]
                            extra = {"angle": float(r)}
                        else:
                            x1, y1, x2, y2 = src_boxes[bi][:4]
                            box = [float(x1), float(y1), float(x2 - x1), float(y2 - y1)]
                            extra = {}
                        json_dets.append({
                            "image_id": stem,
                            "category_id": int(cls[bi]),
                            "bbox": [round(v, 3) for v in box],
                            "score": round(float(conf[bi]), 5),
                            **extra,
                        })
            image_idx += det.shape[0]
        if json_dets is not None:
            import json as _json

            Path(save_json).write_text(_json.dumps(json_dets))
        if submission is not None:
            submission.write(save_submission)
        return metrics.compute()
