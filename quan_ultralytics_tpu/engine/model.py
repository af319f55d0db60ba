"""YOLO model facade: the user-facing entry point.

Analog of reference engine/model.py (Model :29): ``YOLO("yolo11n-obb-quan.yaml")``
then ``.train(...)`` / ``.val(...)`` / ``.predict(...)``. Weights live in an
explicit variables pytree (JAX-style); checkpoints are pickled pytrees
(utils/checkpoint.py, one format for both weights and training state).
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from quan_ultralytics_tpu.data.augment import AugmentHyp
from quan_ultralytics_tpu.data.dataset import YOLODataset
from quan_ultralytics_tpu.data.build import build_dataloader
from quan_ultralytics_tpu.engine.predictor import Predictor, Results
from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
from quan_ultralytics_tpu.engine.validator import Validator
from quan_ultralytics_tpu.models.tasks import DetectionModel


class YOLO:
    """``YOLO(model_yaml_or_ckpt)``; task inferred from the head module."""

    def __init__(self, model: str = "yolo11n-obb-quan.yaml", nc: Optional[int] = None,
                 dtype: Any = None):
        backend_cls = None
        if str(model).endswith(".hlo"):
            from quan_ultralytics_tpu.engine.exporter import ExportedBackend
            backend_cls = ExportedBackend
        elif str(model).endswith(".tflite"):
            from quan_ultralytics_tpu.engine.exporter import TFLiteBackend
            backend_cls = TFLiteBackend
        elif (Path(str(model)) / "saved_model.pb").exists():
            from quan_ultralytics_tpu.engine.exporter import SavedModelBackend
            backend_cls = SavedModelBackend
        if backend_cls is not None:
            # runnable exported artifact (engine/exporter.py backends, the
            # AutoBackend analog): predict-only, no model code executed
            self.model = backend_cls(str(model))
            self.variables = {}
            self.model_yaml = self.model.meta.get("model_yaml")
            self.names = self.model.names
            self.task = self.model.task
            return
        if str(model).endswith((".pkl", ".ckpt")):
            payload = pickle.loads(Path(model).read_bytes())
            self.model = DetectionModel.from_yaml(payload["model_yaml"], nc=payload["nc"], dtype=dtype)
            self.variables = {"params": payload["params"], "batch_stats": payload["batch_stats"]}
            self.model_yaml = payload["model_yaml"]
            self.names = payload.get("names")
        else:
            self.model = DetectionModel.from_yaml(model, nc=nc, dtype=dtype)
            self.variables = None
            self.model_yaml = str(model)
            self.names = None
        self.task = self.model.task

    # ------------------------------------------------------------------
    def _ensure_variables(self, seed: int = 0):
        if self.variables is None:
            self.variables = self.model.init(jax.random.PRNGKey(seed))
        return self.variables

    def train(self, data: Union[str, Dict], epochs: int = 100, batch: int = 16,
              imgsz: int = 640, max_labels: int = 128, save_dir: str = "runs/train",
              close_mosaic: int = 10, resume: Optional[str] = None,
              cache: Optional[str] = None, log=print, **overrides) -> Dict[str, float]:
        """Train on a YOLO-format dataset yaml (reference Model.train :742)."""
        ds = YOLODataset(data, split="train", task=self.task, cache=cache)
        if self.model.nc != ds.nc:
            self.model = DetectionModel.from_yaml(self.model_yaml, nc=ds.nc)
        self.names = ds.names
        aug_overrides = {k: v for k, v in overrides.items()
                         if hasattr(AugmentHyp, k) and not hasattr(TrainConfig, k)}
        cfg = TrainConfig(epochs=epochs, batch=batch, imgsz=imgsz, save_dir=save_dir,
                          **{k: v for k, v in overrides.items() if hasattr(TrainConfig, k)})
        steps_per_epoch = max(len(ds) // batch, 1)
        trainer = Trainer(self.model, cfg, steps_per_epoch)
        state = trainer.init_state()
        start_epoch = 0
        if resume:
            state, start_epoch = trainer.restore_checkpoint(resume)
            log(f"resumed from {resume} at epoch {start_epoch}")
        try:
            val_ds = YOLODataset(data, split="val", task=self.task)
        except Exception:
            val_ds = ds
        validator = Validator(self.model, imgsz=imgsz)
        hyp = AugmentHyp(**aug_overrides)

        def train_loader(epoch):
            return build_dataloader(ds, batch, imgsz, hyp=hyp if hyp.mosaic else None,
                                    max_labels=max_labels, seed=epoch,
                                    augment=hyp.mosaic > 0 or epoch < epochs,
                                    multi_scale=cfg.multi_scale)

        def close_mosaic_hook(epoch):
            hyp.mosaic = 0.0  # reference close_mosaic (trainer.py:354)

        def validate(state):
            return validator(state.variables(ema=True), val_ds, batch_size=batch)

        out_dir = Path(save_dir)
        # callback bus: CSV results + TensorBoard + any importable logger
        # integration (reference Model.train wires add_integration_callbacks)
        from quan_ultralytics_tpu.utils.integrations import build_callbacks

        callbacks = build_callbacks(save_dir, args={
            "data": data if isinstance(data, str) else "<dict>",
            "epochs": epochs, "batch": batch, "imgsz": imgsz,
            "task": self.task, "model": self.model_yaml, **overrides,
        })
        state = trainer.fit(
            state, train_loader, validate_fn=validate, epochs=epochs,
            start_epoch=start_epoch, save_dir=save_dir,
            close_mosaic_hook=close_mosaic_hook, close_mosaic=close_mosaic, log=log,
            callbacks=callbacks,
        )
        # keep facade-format checkpoints too, and load best like reference
        # Model.train (:812-815)
        self._save_ckpt(out_dir / "last.pkl", state)
        best_ck = out_dir / "best.ckpt"
        if best_ck.exists():
            st, _ = trainer.restore_checkpoint(best_ck)
            self._save_ckpt(out_dir / "best.pkl", st)
            self.variables = {"params": st.ema_params, "batch_stats": st.batch_stats}
        else:
            self.variables = {"params": state.ema_params, "batch_stats": state.batch_stats}
        return trainer.history[-1] if trainer.history else {}

    def _save_ckpt(self, path: Path, state):
        payload = {
            "model_yaml": self.model_yaml,
            "nc": self.model.nc,
            "names": self.names,
            "params": jax.device_get(state.ema_params),
            "batch_stats": jax.device_get(state.batch_stats),
            "raw_params": jax.device_get(state.params),
            "step": int(state.step),
        }
        path.write_bytes(pickle.dumps(payload))

    def val(self, data: Union[str, Dict], split: str = "val", imgsz: int = 640,
            batch: int = 8, conf: float = 0.001, iou: float = 0.7,
            save_json: Optional[str] = None, save_submission: Optional[str] = None,
            cache: Optional[str] = None, rect: bool = False,
            mask_native: bool = False, mesh=None,
            save_dir: Optional[str] = None) -> Dict[str, float]:
        """save_dir: write the reference's val artifacts (per-class AP table,
        PR/F1/P/R curve PNGs, confusion-matrix images) there."""
        ds = YOLODataset(data, split=split, task=self.task, cache=cache)
        validator = Validator(self.model, imgsz=imgsz, conf=conf, iou=iou, mesh=mesh)
        out = validator(self._ensure_variables(), ds, batch_size=batch,
                        save_json=save_json, save_submission=save_submission,
                        rect=rect, mask_native=mask_native, save_dir=save_dir)
        # per-class table + confusion matrix, printed like the reference
        # BaseValidator console output
        names = ds.names if isinstance(ds.names, dict) else {
            i: n for i, n in enumerate(ds.names)}
        print(validator.metrics.per_class_table(names))
        print(validator.confusion.summary(names=list(names.values())))
        self.confusion = validator.confusion
        self.metrics = validator.metrics
        return out

    def embed(self, source, layers: Optional[List[int]] = None,
              imgsz: int = 640) -> np.ndarray:
        """Feature embeddings (reference engine/model.py:465 Model.embed /
        nn/tasks.py:163-166): spatially averaged feature vectors from the
        given layer indices (default: the second-to-last layer, matching the
        reference's ``embed=[len(model)-2]``), concatenated per image.
        Returns ``[B, D]`` float32."""
        from quan_ultralytics_tpu.data.augment import letterbox
        from quan_ultralytics_tpu.data.loaders import load_source

        if isinstance(source, (str, Path)):
            images = list(load_source(source))
        elif isinstance(source, np.ndarray) and source.ndim == 3:
            images = [source]
        else:
            images = list(source)
        x = np.stack([letterbox(im, imgsz)[0] for im in images])
        x = jnp.asarray(x.astype(np.float32) / 255.0)
        layers = sorted(layers or [len(self.model.specs) - 2])
        _, feats = self.model.features(self._ensure_variables(), x, layers=layers)
        # [B, H, W, 4, C] -> mean over space -> [B, 4*C]; concat across layers
        pooled = [np.asarray(feats[i].mean(axis=(1, 2)), np.float32).reshape(len(images), -1)
                  for i in layers]
        return np.concatenate(pooled, axis=1)

    def export(self, format: str = "exported", imgsz: int = 640, batch: int = 1,
               path: Optional[str] = None, half: bool = False,
               int8: bool = False) -> str:
        """mode=export (reference Model.export :851 / engine/exporter.py):
        'exported' (RUNNABLE jax.export StableHLO bytecode, reload with
        YOLO("model.hlo") or raw jax — the analog of a runnable ONNX file),
        'stablehlo' (readable StableHLO text), or 'params' (pickled variables
        + yaml, reloadable with YOLO(ckpt))."""
        from quan_ultralytics_tpu.engine.exporter import (export_compiled,
                                                          export_params,
                                                          export_stablehlo)

        variables = self._ensure_variables()
        if format == "exported":
            return export_compiled(self.model, variables, imgsz=imgsz, batch=batch,
                                   names=self.names, model_yaml=self.model_yaml,
                                   path=path or "model.hlo")
        if format == "stablehlo":
            return export_stablehlo(self.model, variables, imgsz=imgsz, batch=batch,
                                    path=path or "model.stablehlo")
        if format == "params":
            return export_params(self.model, variables, self.model_yaml,
                                 names=self.names, path=path or "model.pkl")
        if format == "tflite":
            from quan_ultralytics_tpu.engine.exporter import export_tflite

            return export_tflite(self.model, variables, imgsz=imgsz, batch=batch,
                                 names=self.names, path=path or "model.tflite",
                                 half=half, int8=int8)
        if format in ("saved_model", "pb"):
            from quan_ultralytics_tpu.engine.exporter import export_saved_model

            return export_saved_model(self.model, variables, imgsz=imgsz,
                                      batch=batch, names=self.names,
                                      path=path or "model_saved_model")
        if format == "onnx":
            from quan_ultralytics_tpu.engine.exporter import export_onnx

            return export_onnx(self.model, variables, imgsz=imgsz,
                               batch=batch, names=self.names,
                               path=path or "model.onnx")
        raise ValueError(f"unknown export format {format!r} "
                         f"(exported|stablehlo|params|tflite|saved_model|onnx)")

    def tune(self, data: Union[str, Dict], iterations: int = 10, epochs: int = 5,
             imgsz: int = 640, batch: int = 16, save_dir: str = "runs/tune",
             **overrides) -> Dict[str, float]:
        """mode=tune (reference Model.tune :871 / engine/tuner.py): mutation
        evolution over the training hyperparameters; each iteration trains
        `epochs` epochs and scores fitness = 0.9*mAP50-95 + 0.1*mAP50."""
        from quan_ultralytics_tpu.engine.tuner import Tuner

        base = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 5e-4,
                "warmup_epochs": 3.0, "box": 7.5, "cls": 0.5, "dfl": 1.5}
        it_count = [0]

        def train_fn(hyp):
            m = YOLO(self.model_yaml)
            it_dir = str(Path(save_dir) / f"iter{it_count[0]}")
            it_count[0] += 1
            row = m.train(data, epochs=epochs, batch=batch, imgsz=imgsz,
                          save_dir=it_dir, log=lambda *a: None, **hyp, **overrides)
            return row.get("fitness", -row.get("loss", float("inf")))

        tuner = Tuner(train_fn, base, save_dir=save_dir)
        return tuner(iterations)

    def predict(self, source, imgsz: int = 640, conf: float = 0.25, iou: float = 0.45,
                max_det: int = 300, visualize=False) -> List[Results]:
        if not hasattr(self.model, "module"):
            imgsz = self.model.imgsz  # exported artifacts have a fixed shape
        predictor = Predictor(self.model, imgsz=imgsz, conf=conf, iou=iou,
                              max_det=max_det, names=self.names)
        results = predictor(self._ensure_variables(), source)
        if visualize and hasattr(self.model, "module") and results:
            # reference predict visualize arg (nn/tasks.py:140 _predict_once
            # -> utils/plotting.py:1346): per-layer feature grids, named
            # stage{i}_{Module}_features.png like the reference, one
            # directory per image for multi-image sources (one batched
            # capture pass for all of them)
            from quan_ultralytics_tpu.data.augment import letterbox
            from quan_ultralytics_tpu.utils.plotting import feature_visualization

            out_dir = Path(visualize if isinstance(visualize, (str, Path))
                           else "runs/visualize")
            x = jnp.asarray(np.stack(
                [letterbox(r.orig_img, imgsz)[0] for r in results]
            ).astype(np.float32) / 255.0)
            _, feats = self.model.features(self._ensure_variables(), x)
            for bi in range(len(results)):
                d = out_dir if len(results) == 1 else out_dir / f"im{bi}"
                d.mkdir(parents=True, exist_ok=True)
                for i, f in sorted(feats.items()):
                    feature_visualization(
                        f[bi:bi + 1],
                        d / f"stage{i}_{self.model.specs[i].module}_features.png")
        return results

    def track(self, frames, imgsz: int = 640, conf: float = 0.25, iou: float = 0.45,
              tracker: str = "bytetrack", persist: bool = False):
        """mode=track (reference Model.track): per-frame detect + associate.

        frames: iterable of RGB arrays (a video's frames). Returns per-frame
        [n, 7] arrays (xyxy, track_id, score, cls). Only axis-aligned
        detection tasks are trackable (like the reference).
        """
        from quan_ultralytics_tpu.trackers import BOTSORT, BYTETracker

        if self.task != "detect":
            raise ValueError("track mode requires a detect-task model")
        if not persist or not hasattr(self, "_tracker"):
            self._tracker = BOTSORT() if tracker == "botsort" else BYTETracker()
        predictor = Predictor(self.model, imgsz=imgsz, conf=conf, iou=iou, names=self.names)
        variables = self._ensure_variables()
        outputs = []
        for frame in frames:
            res = predictor(variables, frame)[0]
            kwargs = {"frame": frame} if isinstance(self._tracker, BOTSORT) else {}
            outputs.append(self._tracker.update(res.boxes[:, :4], res.conf, res.cls, **kwargs))
        return outputs

    __call__ = predict
