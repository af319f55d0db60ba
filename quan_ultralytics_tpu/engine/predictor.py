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
    """Results analog (reference engine/results.py:187, OBB :1596,
    Masks :1305, Keypoints :1417) with the user-facing surface:
    plot / verbose / save_txt / summary / tojson."""

    orig_shape: tuple
    boxes: np.ndarray      # detect/segment/pose: [n, 6] xyxy+conf+cls;
                           # obb: [n, 7] xywhr+conf+cls
    names: Optional[List[str]] = None
    task: str = "detect"
    masks: Optional[np.ndarray] = None      # segment: [n, h0, w0] bool
    keypoints: Optional[np.ndarray] = None  # pose: [n, nk, 3] orig-px + vis
    orig_img: Optional[np.ndarray] = None   # RGB source frame (for plot())

    @property
    def xyxy(self):
        return self.boxes[:, :4] if self.task != "obb" else None

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

    def _name(self, c: int) -> str:
        return self.names[c] if self.names and c < len(self.names) else str(c)

    def _corners(self) -> np.ndarray:
        """OBB corner form [n, 4, 2] (reference results.py OBB.xyxyxyxy)."""
        from quan_ultralytics_tpu.ops.boxes import xywhr2xyxyxyxy

        return np.asarray(xywhr2xyxyxyxy(jnp.asarray(self.boxes[:, :5])))

    def plot(self, filename: Optional[str] = None) -> np.ndarray:
        """Annotate detections (+ masks/keypoints) on the source image;
        optionally save to ``filename`` (reference results.py:484)."""
        from quan_ultralytics_tpu.utils.plotting import Annotator

        if self.orig_img is None:
            raise ValueError("Results.plot needs orig_img (predict stores it)")
        im = self.orig_img.copy()
        if self.masks is not None and len(self.masks):
            for i, mk in enumerate(self.masks):
                color = np.array([(37 * (i + 1)) % 255, (97 * (i + 1)) % 255,
                                  (173 * (i + 1)) % 255], np.uint8)
                im[mk] = (0.6 * im[mk] + 0.4 * color).astype(np.uint8)
        ann = Annotator(im, self.names)
        for row in self.boxes:
            c = int(row[-1])
            label = f"{self._name(c)} {row[-2]:.2f}"
            (ann.obb_label if self.task == "obb" else ann.box_label)(
                row[:5] if self.task == "obb" else row[:4], label, c)
        if self.keypoints is not None:
            import cv2

            for k in self.keypoints:
                for x, y, v in k:
                    if v > 0.5:
                        cv2.circle(ann.im, (int(x), int(y)), 3, (0, 255, 0), -1)
        out = ann.result()
        if filename:
            import cv2

            cv2.imwrite(str(filename), cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
        return out

    def verbose(self) -> str:
        """Per-class count string, '4 persons, 1 bus, ' style
        (reference results.py:599 Results.verbose)."""
        if not len(self):
            return "(no detections), "
        counts: Dict[int, int] = {}
        for c in self.cls.astype(int):
            counts[c] = counts.get(c, 0) + 1
        return "".join(f"{n} {self._name(c)}{'s' * (n > 1)}, "
                       for c, n in sorted(counts.items()))

    def save_txt(self, txt_file: Union[str, Path], save_conf: bool = False) -> None:
        """Reference label format (results.py:620 Results.save_txt):
        detect/segment/pose 'cls xc yc w h [conf]' normalized; OBB
        'cls x1 y1 ... x4 y4 [conf]' normalized corners; pose appends
        'x y vis' per keypoint."""
        h0, w0 = self.orig_shape
        lines = []
        corners = self._corners() if self.task == "obb" else None
        for i, row in enumerate(self.boxes):
            c, conf = int(row[-1]), float(row[-2])
            if self.task == "obb":
                vals = (corners[i] / np.array([w0, h0])).reshape(-1).tolist()
            else:
                x1, y1, x2, y2 = row[:4]
                vals = [(x1 + x2) / 2 / w0, (y1 + y2) / 2 / h0,
                        (x2 - x1) / w0, (y2 - y1) / h0]
            if self.keypoints is not None:
                k = self.keypoints[i].copy().astype(np.float64)
                k[:, 0] /= w0
                k[:, 1] /= h0
                vals += k.reshape(-1).tolist()
            if save_conf:
                vals.append(conf)
            lines.append(" ".join([str(c)] + [f"{v:.6g}" for v in vals]))
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        with open(txt_file, "a") as fh:
            fh.write("\n".join(lines) + ("\n" if lines else ""))

    def summary(self, decimals: int = 5) -> List[Dict]:
        """List-of-dicts form (reference results.py:700 Results.summary)."""
        out = []
        corners = self._corners() if self.task == "obb" else None
        for i, row in enumerate(self.boxes):
            c = int(row[-1])
            item: Dict = {"name": self._name(c), "class": c,
                          "confidence": round(float(row[-2]), decimals)}
            if self.task == "obb":
                item["box"] = {k: round(float(v), decimals) for k, v in zip(
                    ("x1", "y1", "x2", "y2", "x3", "y3", "x4", "y4"),
                    corners[i].reshape(-1))}
            else:
                item["box"] = {k: round(float(v), decimals)
                               for k, v in zip(("x1", "y1", "x2", "y2"), row[:4])}
            if self.keypoints is not None:
                k = self.keypoints[i]
                item["keypoints"] = {
                    "x": [round(float(v), decimals) for v in k[:, 0]],
                    "y": [round(float(v), decimals) for v in k[:, 1]],
                    "visible": [round(float(v), decimals) for v in k[:, 2]],
                }
            out.append(item)
        return out

    def tojson(self, decimals: int = 5) -> str:
        """JSON string of summary() (reference results.py:735 Results.to_json)."""
        import json

        return json.dumps(self.summary(decimals=decimals), indent=2)


class Predictor:
    def __init__(self, model: DetectionModel, imgsz: int = 640,
                 conf: float = 0.25, iou: float = 0.45, max_det: int = 300,
                 names: Optional[List[str]] = None, mesh=None):
        self.model = model
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.names = names
        # optional jax.sharding.Mesh: shard the frame batch over the data
        # axis for multi-chip batch prediction (see engine/validator.py)
        self.mesh = mesh
        rotated = model.task == "obb"
        # per-anchor payload columns riding through NMS (reference ops.py nm=)
        if model.task == "segment":
            self.extra_dim = model.specs[-1].args[1]  # nm
        elif model.task == "pose":
            ks = model.specs[-1].args[1]
            self.kpt_shape = (int(ks[0]), int(ks[1]))
            self.extra_dim = self.kpt_shape[0] * self.kpt_shape[1]
        else:
            self.extra_dim = 0

        if hasattr(model, "module"):
            @jax.jit
            def infer(variables, img):
                # u8 input: normalize on device (4x less host->device traffic)
                if img.dtype == jnp.uint8:
                    img = img.astype(jnp.float32) / 255.0
                out = model.module.apply(variables, img, train=False)
                pred = model.decode(out)
                det, ok = non_max_suppression(pred, conf_thres=self.conf, iou_thres=self.iou,
                                              max_det=self.max_det, nc=model.nc, rotated=rotated,
                                              extra_dim=self.extra_dim)
                proto = out[2] if model.task == "segment" else jnp.zeros((img.shape[0], 1, 1, 1))
                return det, ok, proto
        elif getattr(model, "jax_traceable", True):
            # ExportedBackend (engine/exporter.py): the artifact contains
            # forward+decode; only NMS runs live (reference AutoBackend path)
            @jax.jit
            def infer(variables, img):
                if img.dtype == jnp.uint8:
                    img = img.astype(jnp.float32) / 255.0
                pred = model(img)
                det, ok = non_max_suppression(pred, conf_thres=self.conf, iou_thres=self.iou,
                                              max_det=self.max_det, nc=model.nc, rotated=rotated)
                return det, ok, jnp.zeros((img.shape[0], 1, 1, 1))
        else:
            # TFLite / SavedModel backends run under their own runtime, not
            # under jax tracing (reference AutoBackend non-torch branches):
            # forward+decode eagerly, then the jitted NMS tail.
            @jax.jit
            def nms_tail(pred):
                return non_max_suppression(pred, conf_thres=self.conf, iou_thres=self.iou,
                                           max_det=self.max_det, nc=model.nc, rotated=rotated)

            def infer(variables, img):
                x = np.asarray(img)
                if x.dtype == np.uint8:
                    x = x.astype(np.float32) / 255.0
                det, ok = nms_tail(jnp.asarray(model(x)))
                return det, ok, jnp.zeros((x.shape[0], 1, 1, 1))

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
        if self.mesh is not None:
            from quan_ultralytics_tpu.parallel.mesh import replicate, shard_batch

            variables = replicate(self.mesh, variables)
            x = shard_batch(self.mesh, x)
        det, ok, proto = self._infer(variables, x)
        det, ok, proto = np.asarray(det), np.asarray(ok), np.asarray(proto)

        results = []
        task = self.model.task
        rotated = task == "obb"
        for b, (h0, w0, r, dw, dh) in enumerate(meta):
            d = det[b][ok[b]]
            extras = d[:, d.shape[1] - self.extra_dim:] if self.extra_dim else None
            if self.extra_dim:
                d = d[:, : d.shape[1] - self.extra_dim]
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
            masks = keypoints = None
            if task == "segment" and extras is not None:
                masks = self._process_masks(extras, proto[b], boxes, h0, w0, r, dw, dh)
            elif task == "pose" and extras is not None:
                nk, ndim = self.kpt_shape
                keypoints = extras.reshape(-1, nk, ndim).copy()
                keypoints[..., 0] = np.clip((keypoints[..., 0] - dw) / r, 0, w0)
                keypoints[..., 1] = np.clip((keypoints[..., 1] - dh) / r, 0, h0)
            results.append(Results((h0, w0), boxes, self.names, task,
                                   masks=masks, keypoints=keypoints,
                                   orig_img=np.asarray(images[b])))
        return results

    def _process_masks(self, mc, proto, boxes_orig, h0, w0, r, dw, dh):
        """Mask assembly (reference ops.process_mask + scale_masks): sigmoid
        (mc @ proto) at proto resolution, crop to each box, un-letterbox, and
        resize to the original image; boolean at 0.5."""
        import cv2

        if len(mc) == 0:
            return np.zeros((0, h0, w0), bool)
        Hp, Wp = proto.shape[:2]
        m = 1.0 / (1.0 + np.exp(-(mc @ proto.reshape(-1, proto.shape[-1]).T)))
        m = m.reshape(-1, Hp, Wp)
        # the original image occupies [dh : dh + h0*r, dw : dw + w0*r] of the
        # letterbox; proto is a (imgsz/stride_p) scaled view of the letterbox
        sy, sx = Hp / (self.imgsz), Wp / (self.imgsz)
        y0, y1 = int(round(dh * sy)), int(round((dh + h0 * r) * sy))
        x0, x1 = int(round(dw * sx)), int(round((dw + w0 * r) * sx))
        out = np.zeros((len(m), h0, w0), bool)
        for i, mk in enumerate(m):
            crop = mk[max(y0, 0): max(y1, 1), max(x0, 0): max(x1, 1)]
            full = cv2.resize(crop, (w0, h0), interpolation=cv2.INTER_LINEAR)
            # crop to the predicted box (reference crop_mask)
            bx = boxes_orig[i]
            keep = np.zeros((h0, w0), bool)
            xa, ya, xb, yb = (int(max(bx[0], 0)), int(max(bx[1], 0)),
                              int(min(bx[2], w0)), int(min(bx[3], h0)))
            keep[ya:yb, xa:xb] = True
            out[i] = (full > 0.5) & keep
        return out
