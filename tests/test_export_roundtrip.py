"""Runnable-export roundtrip: export, reload, execute, match (VERDICT r2 #4).

The `exported` format is jax.export StableHLO bytecode with weights baked
in (engine/exporter.py). Three levels of evidence:
  1. in-process ExportedBackend output == live model forward+decode
  2. a CLEAN SUBPROCESS that never imports this package deserializes and
     runs the artifact (proving no model code is needed — the runnable-ONNX
     property the reference exporter.py:110-131 formats have)
  3. YOLO("model.hlo").predict() end-to-end through NMS
"""

import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def exported_obb(tmp_path_factory):
    from quan_ultralytics_tpu.engine.model import YOLO

    d = tmp_path_factory.mktemp("export")
    m = YOLO("yolo11n-obb-quan.yaml", nc=3)
    m.names = ["a", "b", "c"]
    path = m.export(format="exported", imgsz=64, batch=2, path=str(d / "model.hlo"))
    return m, path


def test_exported_matches_live(exported_obb):
    from quan_ultralytics_tpu.engine.exporter import ExportedBackend

    m, path = exported_obb
    backend = ExportedBackend(path)
    assert backend.task == "obb" and backend.nc == 3 and backend.imgsz == 64
    img = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    got = np.asarray(backend(jnp.asarray(img)))
    live = np.asarray(m.model.decode(
        m.model.module.apply(m.variables, jnp.asarray(img), train=False)))
    np.testing.assert_allclose(got, live, rtol=1e-5, atol=1e-6)
    # smaller-batch calls pad internally
    got1 = np.asarray(backend(jnp.asarray(img[:1])))
    np.testing.assert_allclose(got1, live[:1], rtol=1e-5, atol=1e-6)


def test_exported_runs_without_package(exported_obb, tmp_path):
    """Deserialize + execute in a subprocess whose only imports are stdlib
    and jax — the artifact is self-contained."""
    _, path = exported_obb
    script = tmp_path / "run_exported.py"
    script.write_text(
        "import pickle, sys\n"
        "import numpy as np\n"
        "from pathlib import Path\n"
        "from jax import export as jexport\n"
        "assert not any('quan_ultralytics' in m for m in sys.modules), 'package leaked'\n"
        f"payload = pickle.loads(Path({str(path)!r}).read_bytes())\n"
        "fn = jexport.deserialize(payload['serialized'])\n"
        "img = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)\n"
        "out = np.asarray(fn.call(img))\n"
        "assert not any('quan_ultralytics' in m for m in sys.modules), 'package leaked'\n"
        "np.save(sys.argv[1], out)\n"
    )
    out_file = tmp_path / "out.npy"
    env = {"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
           "PATH": "/usr/local/bin:/usr/bin:/bin", "HOME": "/root"}
    subprocess.run([sys.executable, str(script), str(out_file)], check=True,
                   env=env, timeout=600)
    got = np.load(out_file)
    m, _ = exported_obb
    img = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    live = np.asarray(m.model.decode(
        m.model.module.apply(m.variables, jnp.asarray(img), train=False)))
    np.testing.assert_allclose(got, live, rtol=1e-5, atol=1e-6)


def test_yolo_predict_from_exported(exported_obb, tmp_path):
    from quan_ultralytics_tpu.engine.model import YOLO

    m, path = exported_obb
    y = YOLO(path)
    assert y.task == "obb" and y.names == ["a", "b", "c"]
    img = (np.random.RandomState(1).rand(48, 64, 3) * 255).astype(np.uint8)
    res = y.predict(img, conf=0.0)
    assert len(res) == 1
    r = res[0]
    assert r.task == "obb" and r.orig_shape == (48, 64)
    assert r.boxes.shape[1] == 7  # xywhr + conf + cls


def test_tflite_export_matches_live(exported_obb, tmp_path):
    """format=tflite: the flatbuffer runs under the stock TFLite interpreter
    (no jax, no model code) and matches the live forward+decode."""
    pytest.importorskip("tensorflow")
    from quan_ultralytics_tpu.engine.exporter import TFLiteBackend

    m, _ = exported_obb
    path = m.export(format="tflite", imgsz=64, batch=2,
                    path=str(tmp_path / "model.tflite"))
    backend = TFLiteBackend(path)
    assert backend.task == "obb" and backend.nc == 3 and backend.batch == 2
    img = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    got = backend(img)
    live = np.asarray(m.model.decode(
        m.model.module.apply(m.variables, jnp.asarray(img), train=False)))
    assert got.shape == live.shape
    np.testing.assert_allclose(got, live, rtol=5e-3, atol=5e-3)
    # smaller-batch calls pad internally
    np.testing.assert_allclose(backend(img[:1]), live[:1], rtol=5e-3, atol=5e-3)


def test_tflite_half_and_int8_variants(exported_obb, tmp_path):
    """half / int8 weight-quantized tflite artifacts run and stay close to
    the live model (reference exporter.py half/int8 export args)."""
    pytest.importorskip("tensorflow")
    from quan_ultralytics_tpu.engine.exporter import TFLiteBackend

    m, _ = exported_obb
    img = np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32)
    live = np.asarray(m.model.decode(
        m.model.module.apply(m.variables, jnp.asarray(img), train=False)))
    for kw, tol in (({"half": True}, 2e-2), ({"int8": True}, 2e-1)):
        path = m.export(format="tflite", imgsz=64, batch=1,
                        path=str(tmp_path / f"m_{list(kw)[0]}.tflite"), **kw)
        got = TFLiteBackend(path)(img)
        assert got.shape == live.shape
        # quantized weights: coarse agreement on the decoded boxes/logits
        assert np.abs(got - live).max() / (np.abs(live).max() + 1e-6) < tol


def test_saved_model_export_matches_live(exported_obb, tmp_path):
    """format=saved_model: the SavedModel runs under TF's runtime (no jax,
    no model code) and matches the live forward+decode."""
    pytest.importorskip("tensorflow")
    from quan_ultralytics_tpu.engine.exporter import SavedModelBackend

    m, _ = exported_obb
    path = m.export(format="saved_model", imgsz=64, batch=2,
                    path=str(tmp_path / "saved"))
    backend = SavedModelBackend(path)
    assert backend.task == "obb" and backend.nc == 3 and backend.batch == 2
    img = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    got = backend(img)
    live = np.asarray(m.model.decode(
        m.model.module.apply(m.variables, jnp.asarray(img), train=False)))
    assert got.shape == live.shape
    np.testing.assert_allclose(got, live, rtol=5e-3, atol=5e-3)
    # smaller-batch calls pad internally
    np.testing.assert_allclose(backend(img[:1]), live[:1], rtol=5e-3, atol=5e-3)


def test_yolo_predict_from_tflite_and_saved_model(exported_obb, tmp_path):
    """YOLO(artifact).predict() end-to-end for the non-jax-traceable
    backends (reference AutoBackend reload-and-run across formats)."""
    pytest.importorskip("tensorflow")
    from quan_ultralytics_tpu.engine.model import YOLO

    m, _ = exported_obb
    paths = [m.export(format="tflite", imgsz=64, batch=1,
                      path=str(tmp_path / "model.tflite")),
             m.export(format="saved_model", imgsz=64, batch=1,
                      path=str(tmp_path / "saved"))]
    img = (np.random.RandomState(1).rand(48, 64, 3) * 255).astype(np.uint8)
    for path in paths:
        y = YOLO(path)
        assert y.task == "obb" and y.names == ["a", "b", "c"]
        res = y.predict(img, conf=0.0)
        assert len(res) == 1 and res[0].task == "obb"
        assert res[0].boxes.shape[1] == 7  # xywhr + conf + cls


def test_onnx_export_roundtrip_or_clear_error(exported_obb, tmp_path):
    """format=onnx (reference's main interchange format, exporter.py:110-131):
    full roundtrip when tf2onnx is importable; otherwise a RuntimeError that
    names the missing dependency and the offline conversion path (documented
    skip, PARITY.md §2.7)."""
    pytest.importorskip("tensorflow")
    m, _ = exported_obb
    try:
        import tf2onnx  # noqa: F401
        have = True
    except ImportError:
        have = False
    if not have:
        with pytest.raises(RuntimeError, match="tf2onnx"):
            m.export(format="onnx", imgsz=64, batch=1,
                     path=str(tmp_path / "model.onnx"))
        return
    import onnxruntime as ort

    path = m.export(format="onnx", imgsz=64, batch=1,
                    path=str(tmp_path / "model.onnx"))
    img = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    sess = ort.InferenceSession(path)
    got = sess.run(None, {sess.get_inputs()[0].name: img})[0]
    live = np.asarray(m.model.decode(
        m.model.module.apply(m.variables, jnp.asarray(img), train=False)))
    np.testing.assert_allclose(got, live, rtol=5e-3, atol=5e-3)
