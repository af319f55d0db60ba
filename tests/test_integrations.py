"""Logger-integration adapters (utils/integrations.py).

The client libraries (wandb/mlflow/...) don't ship in this environment, so
these tests inject recorder fakes into ``sys.modules`` and assert the
adapters subscribe to the right events and forward the right payloads —
mirroring how the reference gates its callbacks on import success
(ultralytics/utils/callbacks/wb.py:1-20, mlflow.py:25-39)."""

import sys
import types
from pathlib import Path

import pytest


def _build(tmp_path, **kw):
    from quan_ultralytics_tpu.utils.integrations import build_callbacks

    return build_callbacks(str(tmp_path), args={"project": "p", "name": "n",
                                                "epochs": 2}, **kw)


def test_build_without_any_integration(tmp_path):
    cb = _build(tmp_path)
    cb.run("on_fit_epoch_end", {"epoch": 0, "loss": 1.5, "fitness": -1.5})
    cb.run("on_train_end", None)
    csv = (tmp_path / "results.csv").read_text()
    assert "loss" in csv and "1.5" in csv


def test_wandb_adapter_records_lifecycle(tmp_path, monkeypatch):
    calls = []

    class Run:
        id = "r1"

        def log(self, metrics, step=None):
            calls.append(("log", dict(metrics), step))

        def finish(self):
            calls.append(("finish",))

    class Artifact:
        def __init__(self, type=None, name=None):
            calls.append(("artifact", type, name))

        def add_file(self, p):
            calls.append(("add_file", p))

    fake = types.ModuleType("wandb")
    fake.__version__ = "0.0-fake"
    fake.run = None

    def init(**kw):
        calls.append(("init", kw["project"], kw["name"]))
        fake.run = Run()

    fake.init = init
    fake.Artifact = Artifact
    monkeypatch.setitem(sys.modules, "wandb", fake)

    cb = _build(tmp_path)
    assert ("init", "p", "n") in calls  # on_pretrain_routine_end fired by build
    cb.run("on_fit_epoch_end", {"epoch": 3, "loss": 0.5})
    assert ("log", {"epoch": 3.0, "loss": 0.5}, 4) in calls
    best = tmp_path / "best.ckpt"
    best.write_bytes(b"x")
    # wandb.run.log_artifact is looked up dynamically
    Run.log_artifact = lambda self, a, aliases=None: calls.append(("log_artifact", aliases))
    cb.run("on_train_end", best)
    assert ("add_file", str(best)) in calls
    assert ("log_artifact", ["best"]) in calls
    assert ("finish",) in calls


def test_mlflow_adapter_records_lifecycle(tmp_path, monkeypatch):
    calls = []
    fake = types.ModuleType("mlflow")
    fake.__version__ = "0.0-fake"
    fake.set_tracking_uri = lambda uri: calls.append(("uri", uri))
    fake.set_experiment = lambda name: calls.append(("exp", name))
    fake.active_run = lambda: None
    fake.start_run = lambda run_name=None: calls.append(("start", run_name))
    fake.log_params = lambda p: calls.append(("params", dict(p)))
    fake.log_metrics = lambda m, step=None: calls.append(("metrics", dict(m), step))
    fake.log_artifact = lambda p: calls.append(("artifact", p))
    fake.end_run = lambda: calls.append(("end",))
    monkeypatch.setitem(sys.modules, "mlflow", fake)

    cb = _build(tmp_path)
    assert ("start", "n") in calls and ("exp", "p") in calls
    assert any(c[0] == "params" and c[1]["epochs"] == "2" for c in calls)
    cb.run("on_fit_epoch_end", {"epoch": 1, "loss": 2.0, "mAP(50)": 0.3})
    # keys sanitized: parentheses stripped (reference mlflow.py sanitize_dict)
    assert ("metrics", {"epoch": 1.0, "loss": 2.0, "mAP50": 0.3}, 1) in calls
    cb.run("on_train_end", None)
    assert ("end",) in calls


def test_broken_integration_does_not_break_bus(tmp_path, monkeypatch):
    fake = types.ModuleType("comet_ml")
    fake.__version__ = "0.0-fake"

    def boom(**kw):
        raise RuntimeError("no network")

    fake.Experiment = boom
    monkeypatch.setitem(sys.modules, "comet_ml", fake)
    cb = _build(tmp_path)  # must not raise
    cb.run("on_fit_epoch_end", {"epoch": 0, "loss": 1.0})
    assert (tmp_path / "results.csv").exists()


def test_trainer_fit_emits_lifecycle_events(tmp_path):
    """Trainer.fit drives the bus: start, epoch start/end, fit-epoch-end,
    model-save, train-end with the best-checkpoint path."""
    import jax.numpy as jnp
    import numpy as np

    from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
    from quan_ultralytics_tpu.models.tasks import DetectionModel
    from quan_ultralytics_tpu.utils.callbacks import Callbacks

    model = DetectionModel.from_yaml("yolo11n-quan.yaml", nc=2)
    cfg = TrainConfig(epochs=1, batch=2, imgsz=64, nbs=2)
    trainer = Trainer(model, cfg, steps_per_epoch=1)
    state = trainer.init_state()

    events = []
    cb = Callbacks()
    for ev in ("on_train_start", "on_train_epoch_start", "on_train_epoch_end",
               "on_fit_epoch_end", "on_model_save", "on_train_end"):
        cb.add(ev, (lambda e: (lambda *a: events.append((e, a))))(ev))

    rnd = np.random.RandomState(0)
    batch = {
        "img": jnp.asarray(rnd.rand(2, 64, 64, 3).astype(np.float32)),
        "bboxes": jnp.asarray(rnd.rand(2, 4, 4).astype(np.float32) * 0.3 + 0.1),
        "cls": jnp.zeros((2, 4), jnp.int32),
        "mask": jnp.ones((2, 4), bool),
    }
    trainer.fit(state, lambda epoch: [batch], epochs=1,
                save_dir=str(tmp_path / "run"), log=lambda *a: None, callbacks=cb)
    names = [e[0] for e in events]
    assert names[0] == "on_train_start"
    assert "on_fit_epoch_end" in names and "on_model_save" in names
    assert names[-1] == "on_train_end"
    # best.ckpt exists after one epoch, so on_train_end carries its path
    (end_args,) = [a for n, a in events if n == "on_train_end"]
    assert end_args[0] is not None and Path(end_args[0]).exists()
