"""CLI surface: every mode is reachable from the `yolo` entry point
(reference ultralytics/cfg/__init__.py:825 MODES/TASKS)."""

from pathlib import Path

import numpy as np
import pytest

from quan_ultralytics_tpu import cli


def test_usage_errors():
    with pytest.raises(SystemExit):
        cli.main([])
    with pytest.raises(SystemExit):
        cli.main(["obb", "train"])  # missing data=
    with pytest.raises(SystemExit):
        cli.main(["obb", "predict"])  # missing source=
    with pytest.raises(SystemExit):
        cli.main(["track"])  # not a task; needs mode first — usage error


def test_parse_kv():
    kv = cli.parse_kv(["a=1", "b=0.5", "c=x.yaml", "d=True"])
    assert kv == {"a": 1, "b": 0.5, "c": "x.yaml", "d": True}


def test_export_mode(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = cli.main(["obb", "export", "model=yolo11n-obb-quan.yaml",
                   "format=stablehlo", "imgsz=64", "path=m.stablehlo"])
    assert rc == 0
    text = Path("m.stablehlo").read_text()
    assert "stablehlo" in text or "func.func" in text


def test_export_params_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = cli.main(["obb", "export", "model=yolo11n-obb-quan.yaml",
                   "format=params", "path=m.pkl"])
    assert rc == 0
    from quan_ultralytics_tpu.engine.model import YOLO

    m = YOLO("m.pkl")
    assert m.task == "obb" and m.variables is not None


def test_track_mode(tmp_path, capsys):
    import cv2

    src = tmp_path / "frames"
    src.mkdir()
    for i in range(3):
        im = np.full((64, 64, 3), 30, np.uint8)
        cv2.rectangle(im, (10 + 4 * i, 10), (34 + 4 * i, 34), (255, 0, 0), -1)
        cv2.imwrite(str(src / f"f{i}.jpg"), im)
    rc = cli.main(["detect", "track", "model=yolo11n-quan.yaml",
                   f"source={src}", "imgsz=64", "conf=0.001"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "frame 0:" in out and "frame 2:" in out


def test_tune_mode_dispatch(monkeypatch):
    calls = {}

    def fake_tune(self, data, **kw):
        calls["data"] = data
        calls.update(kw)
        return {"lr0": 0.01}

    from quan_ultralytics_tpu.engine.model import YOLO

    monkeypatch.setattr(YOLO, "tune", fake_tune)
    rc = cli.main(["obb", "tune", "model=yolo11n-obb-quan.yaml",
                   "data=dota8.yaml", "iterations=2", "epochs=1"])
    assert rc == 0
    assert calls == {"data": "dota8.yaml", "iterations": 2, "epochs": 1}


def test_classify_data_translation(monkeypatch):
    seen = {}

    def fake_cls_main(flags):
        seen["flags"] = flags
        return 0

    import quan_ultralytics_tpu.classification.cli as ccli

    monkeypatch.setattr(ccli, "main", fake_cls_main)
    rc = cli.main(["classify", "train", "data=synthetic", "epochs=1",
                   "batch=32", "lr0=0.05"])
    assert rc == 0
    f = seen["flags"]
    assert f[f.index("--dataset") + 1] == "synthetic"
    assert f[f.index("--batch_size") + 1] == "32"
    assert f[f.index("--lr") + 1] == "0.05"


def test_classify_train_synthetic_e2e(tmp_path, monkeypatch):
    """`yolo classify train data=synthetic` end to end through the facade CLI
    (closes SURVEY §2.5 #47: classify task reachable from the yolo entry)."""
    monkeypatch.chdir(tmp_path)
    rc = cli.main(["classify", "train", "data=synthetic", "epochs=1",
                   "batch=64", "model=qwrn16_2", "exp_dir=runs_cls"])
    assert rc == 0
    runs = list(Path("runs_cls").glob("**/metrics.csv")) + list(Path("runs_cls").glob("**/*.json"))
    assert runs, "classification run left no artifacts"


def test_settings_mode(tmp_path, monkeypatch, capsys):
    """yolo settings: print / update / reject unknown / reset (reference
    cfg/__init__.py handle_yolo_settings + SettingsManager)."""
    import importlib
    import json as _json

    monkeypatch.setenv("QUAN_TPU_SETTINGS", str(tmp_path / "settings.json"))
    import quan_ultralytics_tpu.utils.settings as settings_mod
    importlib.reload(settings_mod)  # re-bind SETTINGS to the temp path
    from quan_ultralytics_tpu.cli import main

    assert main(["settings"]) == 0
    shown = _json.loads(capsys.readouterr().out)
    assert shown["mlflow"] is True

    assert main(["settings", "mlflow=False"]) == 0
    on_disk = _json.loads((tmp_path / "settings.json").read_text())
    assert on_disk["mlflow"] is False

    # disabled integration must be skipped even when importable
    from quan_ultralytics_tpu.utils.integrations import build_callbacks
    import sys as _sys
    import types as _types
    fake = _types.ModuleType("mlflow")
    fake.__version__ = "0.0"
    fake.set_tracking_uri = lambda *a, **k: (_ for _ in ()).throw(AssertionError("gated"))
    monkeypatch.setitem(_sys.modules, "mlflow", fake)
    monkeypatch.setattr("quan_ultralytics_tpu.utils.integrations.SETTINGS",
                        settings_mod.SETTINGS, raising=False)
    build_callbacks(str(tmp_path), args={})  # must not touch fake mlflow

    with pytest.raises(SystemExit):
        main(["settings", "nonsense=1"])
    assert main(["settings", "reset"]) == 0
    assert _json.loads((tmp_path / "settings.json").read_text())["mlflow"] is True
