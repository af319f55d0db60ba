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
                 conf: float = 0.001, iou: float = 0.7, max_det: int = 300,
                 mesh=None):
        self.model = model
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        # optional jax.sharding.Mesh: shard each eval batch over the data
        # axis (params replicated); GSPMD partitions forward+decode+NMS with
        # no code changes — the TPU-native analog of the reference's
        # multi-GPU val. tests/test_mesh.py asserts sharded == single-device.
        self.mesh = mesh
        rotated = model.task == "obb"
        if model.task == "segment":
            self.extra_dim = model.specs[-1].args[1]  # nm
        elif model.task == "pose":
            ks = model.specs[-1].args[1]
            self.kpt_shape = (int(ks[0]), int(ks[1]))
            self.extra_dim = self.kpt_shape[0] * self.kpt_shape[1]
        else:
            self.extra_dim = 0

        @jax.jit
        def infer(variables, img):
            if img.dtype == jnp.uint8:  # loader ships uint8; normalize on device
                img = img.astype(jnp.float32) / 255.0
            out = model.module.apply(variables, img, train=False)
            pred = model.decode(out)
            det, ok = non_max_suppression(
                pred, conf_thres=self.conf, iou_thres=self.iou,
                max_det=self.max_det, nc=model.nc, rotated=rotated,
                extra_dim=self.extra_dim,
            )
            proto = out[2] if model.task == "segment" else jnp.zeros((img.shape[0], 1, 1, 1))
            return det, ok, proto

        self._infer = infer

    def __call__(self, variables, ds: YOLODataset, batch_size: int = 8,
                 max_labels: int = 256, save_json: Optional[str] = None,
                 save_submission: Optional[str] = None, rect: bool = False,
                 mask_native: bool = False,
                 save_dir: Optional[str] = None) -> Dict[str, float]:
        """Run validation. Optional outputs:

        save_dir: write the reference's val artifacts there (utils/metrics.py
          :397-520): PR/F1/P/R curve PNGs, confusion_matrix(_normalized).png,
          and the per-class AP table as per_class.txt.

        save_json: COCO-format detections in SOURCE-image coordinates
          (reference detect/val.py pred_to_json / save_json + scale_boxes).
        save_submission: DOTA Task1 directory — per-patch predictions are
          mapped back to patch-pixel coordinates, merged across patches via
          the ``{stem}__{x}_{y}`` naming, cross-patch rotated NMS applied,
          and Task1_{class}.txt files written (reference obb/val.py
          pred_to_json/eval_json via engine/dota_eval.DOTASubmission).
        mask_native: segment only — evaluate masks at network-input
          resolution (sigmoid at proto res, bilinear upsample, crop at full
          res, threshold 0.5; GT rasterized from the letterboxed polygons)
          instead of the default proto-resolution eval. Mirrors reference
          ops.process_mask_native vs process_mask (segment/val.py).
        """
        rotated = self.model.task == "obb"
        task = self.model.task
        metrics = DetMetrics(nc=self.model.nc, rotated=rotated)
        from quan_ultralytics_tpu.utils.metrics import ConfusionMatrix

        # per-run confusion matrix, printed/persisted by callers (reference
        # BaseValidator builds one per __call__, validator.py:124)
        self.confusion = ConfusionMatrix(nc=self.model.nc)
        # second metric head: mask mAP (segment) / OKS mAP (pose), reference
        # SegmentMetrics/PoseMetrics (utils/metrics.py)
        metrics2 = DetMetrics(nc=self.model.nc) if task in ("segment", "pose") else None
        json_dets = [] if save_json else None
        submission = None
        if save_submission:
            assert rotated, "DOTA submissions are an OBB-task output"
            from quan_ultralytics_tpu.engine.dota_eval import DOTASubmission

            submission = DOTASubmission(ds.names)
        if self.mesh is not None:
            from quan_ultralytics_tpu.parallel.mesh import replicate

            variables = replicate(self.mesh, variables)
        for batch in build_dataloader(ds, batch_size, self.imgsz, hyp=None,
                                      max_labels=max_labels, augment=False,
                                      shuffle=False, drop_last=False, with_meta=True,
                                      rect=rect):
            img = jnp.asarray(batch["img"])
            if self.mesh is not None:
                from quan_ultralytics_tpu.parallel.mesh import shard_batch

                img = shard_batch(self.mesh, img)
            det, ok, proto = self._infer(variables, img)
            det, ok, proto = np.asarray(det), np.asarray(ok), np.asarray(proto)
            Hb, Wb = batch["img"].shape[1:3]  # == (imgsz, imgsz) unless rect
            # the tail batch pads by repeating indices; the loader marks the
            # real count explicitly (a path-set dedup would wrongly drop
            # legitimate duplicate dataset entries)
            n_real = int(batch.get("n_real", det.shape[0]))
            for b in range(min(det.shape[0], n_real)):
                keep = ok[b]
                extras = None
                if self.extra_dim:
                    extras = det[b, keep, det.shape[2] - self.extra_dim:]
                    det_b = det[:, :, : det.shape[2] - self.extra_dim]
                else:
                    det_b = det
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
                    pred_boxes = det_b[b, keep, :4]        # xyxy letterbox px
                    conf, cls = det_b[b, keep, 4], det_b[b, keep, 5]
                    gmask = batch["mask"][b]
                    gb = batch["bboxes"][b][gmask] * [Wb, Hb, Wb, Hb]
                    gt_boxes = np.asarray(xywh2xyxy(jnp.asarray(gb)))
                    src_boxes = scale_boxes(pred_boxes, ratio_pad, ori_shape)
                gt_cls = batch["cls"][b][gmask].astype(np.float32)
                metrics.update(pred_boxes, conf, cls.astype(np.float32), gt_boxes, gt_cls)
                self.confusion.process_batch(pred_boxes, conf, cls, gt_boxes, gt_cls,
                                             rotated=rotated)
                if metrics2 is not None and task == "segment":
                    # mask mAP (reference segment/val.py _process_batch
                    # masks=True). Default: proto resolution with downsampled
                    # GT (reference process_mask). mask_native: input
                    # resolution (reference process_mask_native).
                    from quan_ultralytics_tpu.utils.metrics import mask_iou_np

                    pb = proto[b]                              # [Hp, Wp, nm]
                    Hp, Wp = pb.shape[:2]
                    prob = 1.0 / (1.0 + np.exp(-(extras @ pb.reshape(-1, pb.shape[-1]).T)))
                    prob = prob.reshape(-1, Hp, Wp)
                    if mask_native and "polys" in batch:
                        import cv2

                        # sigmoid at proto res -> bilinear upsample -> crop
                        # at full res -> threshold (ops.process_mask_native)
                        Hm, Wm, sx, sy = Hb, Wb, 1.0, 1.0
                        pm = (np.stack([cv2.resize(m, (Wb, Hb),
                                                   interpolation=cv2.INTER_LINEAR)
                                        for m in prob])
                              if len(prob) else prob.reshape(0, Hb, Wb))
                        n_gt = int(gmask.sum())
                        gtm = np.zeros((n_gt, Hb, Wb), np.float32)
                        for j, poly in enumerate(batch["polys"][b][:n_gt]):
                            cv2.fillPoly(gtm[j], [poly.astype(np.int32)], 1.0)
                        gtm = gtm > 0.5
                    else:
                        Hm, Wm, sx, sy = Hp, Wp, Wp / Wb, Hp / Hb
                        pm = prob
                        gtm = batch["masks"][b][gmask] > 0.5
                    # crop each pred mask to its box (mask scale)
                    yy = np.arange(Hm)[None, :, None]
                    xx = np.arange(Wm)[None, None, :]
                    bx = pred_boxes
                    inside = ((xx >= bx[:, 0, None, None] * sx) & (xx < bx[:, 2, None, None] * sx)
                              & (yy >= bx[:, 1, None, None] * sy) & (yy < bx[:, 3, None, None] * sy))
                    pm = (pm > 0.5) & inside
                    iou_m = mask_iou_np(gtm, pm) if len(gtm) and len(pm) else None
                    metrics2.update(pred_boxes, conf, cls.astype(np.float32),
                                    gt_boxes, gt_cls, iou=iou_m)
                elif metrics2 is not None and task == "pose":
                    from quan_ultralytics_tpu.utils.metrics import kpt_oks_np

                    nk, ndim = self.kpt_shape
                    pk = extras.reshape(-1, nk, ndim)
                    gk = batch["keypoints"][b][gmask].astype(np.float32).copy()
                    gk[..., 0] *= Wb
                    gk[..., 1] *= Hb
                    area = np.maximum((gt_boxes[:, 2] - gt_boxes[:, 0])
                                      * (gt_boxes[:, 3] - gt_boxes[:, 1]), 1.0) * 0.53
                    oks = kpt_oks_np(gk, area, pk) if len(gk) and len(pk) else None
                    metrics2.update(pred_boxes, conf, cls.astype(np.float32),
                                    gt_boxes, gt_cls, iou=oks)
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
        if json_dets is not None:
            import json as _json

            Path(save_json).write_text(_json.dumps(json_dets))
        if submission is not None:
            submission.write(save_submission)
        out = metrics.compute()
        if metrics2 is not None:
            suffix = "(M)" if task == "segment" else "(P)"
            out.update({f"{k}{suffix}": v for k, v in metrics2.compute().items()
                        if k.startswith("mAP")})
        self.metrics = metrics  # per-class table/plots accessible to callers
        if save_dir is not None:
            d = Path(save_dir)
            d.mkdir(parents=True, exist_ok=True)
            names = getattr(ds, "names", None)
            metrics.plot(d, names)
            self.confusion.plot(d, names, normalize=False)
            self.confusion.plot(d, names, normalize=True)
            (d / "per_class.txt").write_text(metrics.per_class_table(names) + "\n")
        return out
