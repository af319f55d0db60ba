"""Export: runnable StableHLO artifacts / saved-params formats.

Analog of reference engine/exporter.py (:185-1500) + nn/autobackend.py (:54).
The reference's 17 CUDA-era formats (TensorRT, CoreML, TFLite, ...) don't map
to TPU serving; the TPU-native export surface is:

  * ``exported`` (default, ``*.hlo``): a SERIALIZED ``jax.export`` artifact
    of forward+decode with the weights baked in — portable StableHLO
    bytecode that any XLA/PJRT runtime can execute with no model code (the
    TPU analog of a runnable ONNX file). Reload with `ExportedBackend` /
    `YOLO("model.hlo")`, or from raw jax alone via
    ``jax.export.deserialize(payload["serialized"]).call(img)``.
  * ``stablehlo``: human-readable StableHLO text of the same graph.
  * ``params``: pickled variables pytree + model yaml (reload with
    `YOLO(ckpt)`).
  * ``tflite``: a .tflite flatbuffer (jax2tf -> TFLite converter with
    SELECT_TF_OPS) runnable by the stock TFLite interpreter with no jax —
    the one reference edge format that maps cleanly (exporter.py
    export_tflite; reload with `TFLiteBackend`).

All formats export the *fused* inference graph (IQBN folded — the fusion the
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


def export_compiled(model: DetectionModel, variables, imgsz: int = 640,
                    batch: int = 1, path: str = "model.hlo",
                    names=None, model_yaml: Optional[str] = None) -> str:
    """Serialize a RUNNABLE artifact: jax.export bytecode of forward+decode
    with the weights embedded as constants, plus metadata for postprocessing
    (reference exporter.py:110-131 runnable-format intent).

    The artifact executes in any process with jax installed — none of this
    package's model code is needed (see tests/test_export_roundtrip.py,
    which reloads and runs it in a clean subprocess)."""
    from jax import export as jexport

    def forward(img):
        out = model.module.apply(variables, img, train=False)
        return model.decode(out)

    x = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.float32)
    exported = jexport.export(jax.jit(forward))(x)
    payload = {
        "serialized": exported.serialize(),
        "meta": {
            "task": model.task,
            "nc": model.nc,
            "names": names,
            "imgsz": imgsz,
            "batch": batch,
            "model_yaml": model_yaml,
            "strides": tuple(int(s) for s in model.strides),
        },
    }
    Path(path).write_bytes(pickle.dumps(payload))
    return path


class ExportedBackend:
    """Runtime for exported ``.hlo`` artifacts (reference nn/autobackend.py:54
    AutoBackend): predict-ready forward+decode with no model code.

    Exposes the attributes `Predictor` consumes (task/nc); detect and obb
    artifacts are supported (segment/pose predict needs the proto/keypoint
    payload plumbing of the live model)."""

    def __init__(self, path: str):
        from jax import export as jexport

        payload = pickle.loads(Path(path).read_bytes())
        self._fn = jexport.deserialize(payload["serialized"])
        self.meta = payload["meta"]
        self.task = self.meta["task"]
        assert self.task in ("detect", "obb"), \
            f"exported predict supports detect/obb, got {self.task}"
        self.nc = self.meta["nc"]
        self.names = self.meta.get("names")
        self.imgsz = self.meta["imgsz"]
        self.batch = self.meta["batch"]

    def __call__(self, img) -> jnp.ndarray:
        """[b, H, W, 3] float32 -> decoded predictions [b, A, ...]; b may be
        smaller than the exported batch (padded + sliced here)."""
        b = img.shape[0]
        assert b <= self.batch, f"exported for batch {self.batch}, got {b}"
        if b < self.batch:
            pad = jnp.zeros((self.batch - b, *img.shape[1:]), img.dtype)
            img = jnp.concatenate([img, pad])
        return self._fn.call(img.astype(jnp.float32))[:b]


def export_tflite(model: DetectionModel, variables, imgsz: int = 640,
                  batch: int = 1, path: str = "model.tflite",
                  names=None, half: bool = False, int8: bool = False) -> str:
    """Export forward+decode as a .tflite flatbuffer (reference
    exporter.py export_tflite; format='tflite', half/int8 args).

    jax2tf graph serialization -> TFLite converter with SELECT_TF_OPS for
    the ops TFLite builtins don't cover (conv groups, scatter, while). The
    artifact runs under the stock TFLite interpreter with the flex
    delegate — no jax, no model code (tests/test_export_roundtrip.py
    asserts the interpreter matches the live model).

    half: fp16 weight quantization; int8: dynamic-range int8 weight
    quantization (reference exporter.py:552-575 — its full-int8 calibration
    path needs a representative dataset; dynamic-range is the dataless
    analog and what its `int8 and not data` branch falls back to)."""
    from jax.experimental import jax2tf
    import tensorflow as tf

    def forward(img):
        out = model.module.apply(variables, img, train=False)
        return model.decode(out)

    tf_fn = tf.function(
        jax2tf.convert(forward, native_serialization=False), autograph=False,
        input_signature=[tf.TensorSpec((batch, imgsz, imgsz, 3), tf.float32)])
    conv = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()], tf_fn)
    conv.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS,
                                      tf.lite.OpsSet.SELECT_TF_OPS]
    if half or int8:
        conv.optimizations = [tf.lite.Optimize.DEFAULT]
        if half:
            conv.target_spec.supported_types = [tf.float16]
    Path(path).write_bytes(conv.convert())
    meta = {"task": model.task, "nc": model.nc, "names": names,
            "imgsz": imgsz, "batch": batch,
            "strides": tuple(int(s) for s in model.strides)}
    Path(str(path) + ".meta").write_bytes(pickle.dumps(meta))
    return path


def _pad_to_batch(img, batch: int):
    """Zero-pad a [b<=batch, ...] f32 batch to the exported batch size;
    returns (padded, b) so callers can slice outputs back to b."""
    import numpy as np

    img = np.asarray(img, np.float32)
    b = img.shape[0]
    assert b <= batch, f"exported for batch {batch}, got {b}"
    if b < batch:
        img = np.concatenate(
            [img, np.zeros((batch - b, *img.shape[1:]), np.float32)])
    return img, b


def export_saved_model(model: DetectionModel, variables, imgsz: int = 640,
                       batch: int = 1, path: str = "model_saved_model",
                       names=None) -> str:
    """Export forward+decode as a TF SavedModel directory (reference
    exporter.py export_saved_model; format='saved_model'/'pb').

    jax2tf graph serialization -> tf.saved_model.save with a
    serving_default signature; weights are baked into the graph. Reload
    with `SavedModelBackend` or plain `tf.saved_model.load` — no jax, no
    model code (tests/test_export_roundtrip.py)."""
    from jax.experimental import jax2tf
    import tensorflow as tf

    def forward(img):
        out = model.module.apply(variables, img, train=False)
        return model.decode(out)

    tf_fn = tf.function(
        jax2tf.convert(forward, native_serialization=False), autograph=False,
        input_signature=[tf.TensorSpec((batch, imgsz, imgsz, 3), tf.float32,
                                       name="images")])
    mod = tf.Module()
    mod.f = tf_fn
    tf.saved_model.save(
        mod, str(path),
        signatures={"serving_default": tf_fn.get_concrete_function()})
    meta = {"task": model.task, "nc": model.nc, "names": names,
            "imgsz": imgsz, "batch": batch,
            "strides": tuple(int(s) for s in model.strides)}
    (Path(path) / "quan_meta.pkl").write_bytes(pickle.dumps(meta))
    return str(path)


def export_onnx(model: DetectionModel, variables, imgsz: int = 640,
                batch: int = 1, path: str = "model.onnx", names=None,
                opset: int = 17) -> str:
    """Export forward+decode as ONNX via SavedModel -> tf2onnx (reference
    exporter.py export_onnx; format='onnx' is the reference's main
    interchange format, exporter.py:110-131).

    Best-effort: `tf2onnx` is not in the baked image (zero egress), so this
    raises a clear RuntimeError naming the missing dependency when absent —
    the SavedModel artifact is the documented interchange point (PARITY.md
    §2.7). Covered by tests/test_export_roundtrip.py either way (roundtrip
    when tf2onnx importable, error message when not)."""
    try:
        import tf2onnx  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "ONNX export needs the optional `tf2onnx` package (absent from "
            "this zero-egress image). Export format='saved_model' instead "
            "and convert offline: python -m tf2onnx.convert --saved-model "
            "<dir> --output model.onnx") from e
    import tempfile

    import tf2onnx.convert

    with tempfile.TemporaryDirectory() as td:
        sm = export_saved_model(model, variables, imgsz=imgsz, batch=batch,
                                path=str(Path(td) / "sm"), names=names)
        tf2onnx.convert.from_saved_model(sm, output_path=str(path),
                                         opset=opset)
    meta = {"task": model.task, "nc": model.nc, "names": names,
            "imgsz": imgsz, "batch": batch,
            "strides": tuple(int(s) for s in model.strides)}
    Path(str(path) + ".quan_meta.pkl").write_bytes(pickle.dumps(meta))
    return str(path)


class SavedModelBackend:
    """Run an exported SavedModel through TF's runtime (reference
    nn/autobackend.py saved_model branch). Not jax-traceable — the
    Predictor calls it eagerly and jits only the NMS tail."""

    jax_traceable = False

    def __init__(self, path: str):
        import tensorflow as tf

        self._fn = tf.saved_model.load(str(path)).signatures["serving_default"]
        meta_path = Path(path) / "quan_meta.pkl"
        self.meta = pickle.loads(meta_path.read_bytes()) if meta_path.exists() else {}
        self.task = self.meta.get("task", "detect")
        self.nc = self.meta.get("nc")
        self.names = self.meta.get("names")
        self.imgsz = self.meta.get("imgsz")
        spec = self._fn.structured_input_signature[1]
        self.batch = int(next(iter(spec.values())).shape[0])

    def __call__(self, img):
        import tensorflow as tf

        img, b = _pad_to_batch(img, self.batch)
        out = self._fn(tf.constant(img))
        return next(iter(out.values())).numpy()[:b]


class TFLiteBackend:
    """Run an exported .tflite artifact through the TFLite interpreter
    (reference nn/autobackend.py tflite branch). Not jax-traceable — the
    Predictor calls it eagerly and jits only the NMS tail."""

    jax_traceable = False

    def __init__(self, path: str):
        import tensorflow as tf

        self._interp = tf.lite.Interpreter(model_path=str(path))
        self._interp.allocate_tensors()
        self._in = self._interp.get_input_details()[0]
        self._out = self._interp.get_output_details()[0]
        meta_path = Path(str(path) + ".meta")
        self.meta = pickle.loads(meta_path.read_bytes()) if meta_path.exists() else {}
        self.task = self.meta.get("task", "detect")
        self.nc = self.meta.get("nc")
        self.names = self.meta.get("names")
        self.imgsz = self.meta.get("imgsz")
        self.batch = int(self._in["shape"][0])

    def __call__(self, img):
        img, b = _pad_to_batch(img, self.batch)
        self._interp.set_tensor(self._in["index"], img)
        self._interp.invoke()
        return self._interp.get_tensor(self._out["index"])[:b]


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
