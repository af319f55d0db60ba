"""Trainer mechanics: schedules, resume, EMA, NaN guard, checkpointing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quan_ultralytics_tpu.engine.trainer import (
    TrainConfig, Trainer, TrainState, build_optimizer, ema_update, lr_schedule,
)
from quan_ultralytics_tpu.models.tasks import DetectionModel


def test_lr_schedule_warmup_and_decay():
    cfg = TrainConfig(epochs=10, lr0=0.01, lrf=0.1, warmup_epochs=3.0)
    fn = lr_schedule(cfg, steps_per_epoch=100)
    assert float(fn(0)) == 0.0
    assert float(fn(150)) < float(fn(300))  # still warming
    # after warmup, linear decay toward lr0*lrf
    assert float(fn(300)) > float(fn(900))
    assert abs(float(fn(1000)) - 0.01 * 0.1) < 1e-4


def test_lr_schedule_no_warmup():
    cfg = TrainConfig(epochs=10, lr0=0.01, warmup_epochs=0.0)
    fn = lr_schedule(cfg, steps_per_epoch=2)
    assert float(fn(0)) == pytest.approx(0.01, rel=1e-3)


def test_ema_ramp():
    p = {"w": jnp.ones(3)}
    new = {"w": jnp.zeros(3)}
    early = ema_update(p, new, jnp.asarray(1), 0.9999, 2000.0)
    late = ema_update(p, new, jnp.asarray(100000), 0.9999, 2000.0)
    # early updates track new params closely; late updates barely move
    assert float(early["w"][0]) < 0.01
    assert float(late["w"][0]) > 0.99


def _tiny_setup():
    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=3)
    cfg = TrainConfig(epochs=2, batch=2, imgsz=64, nbs=2, warmup_epochs=0.0)
    trainer = Trainer(model, cfg, steps_per_epoch=1)
    state = trainer.init_state()
    M = 4
    batch = {
        "img": jnp.asarray(np.random.rand(2, 64, 64, 3).astype(np.float32)),
        "bboxes": jnp.asarray(np.tile(np.array([[0.5, 0.5, 0.3, 0.2, 0.1]], np.float32), (2, M, 1))),
        "cls": jnp.zeros((2, M), jnp.int32),
        "mask": jnp.ones((2, M), bool),
    }
    return trainer, state, batch


@pytest.mark.parametrize("yaml_name,nc,extra", [
    ("yolo11n-obb-quan.yaml", 3, None),
    ("yolo11n-seg-quan.yaml", 3, "masks"),
    ("yolo11n-pose-quan.yaml", 1, "keypoints"),
])
def test_init_state_imgsz_640(yaml_name, nc, extra):
    """Regression: init_state crashed for any imgsz where imgsz//8 is not a
    multiple of 32 (640 -> probe 80 -> FPN upsample 3->6 vs P4=5 concat
    TypeError). 640 is the reference COCO recipe shape (args_classical.yaml:6)
    and blocked all detect/seg/pose training at 640."""
    model = DetectionModel.from_yaml(yaml_name, nc=nc)
    cfg = TrainConfig(epochs=1, batch=2, imgsz=640, nbs=2, warmup_epochs=0.0)
    trainer = Trainer(model, cfg, steps_per_epoch=1)
    state = trainer.init_state()  # crashed before the probe-size fix
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(state.params))
    if model.task != "obb":
        return  # init is the regression; one step compile is enough coverage
    # the state trains at any multiple-of-32 batch shape (shapes come from
    # the batch, not cfg.imgsz) — run one cheap 64px step to prove it
    M = 4
    batch = {
        "img": jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)),
        "bboxes": jnp.asarray(np.tile(np.array([[[0.5, 0.5, 0.3, 0.2, 0.1]]], np.float32), (2, M, 1))),
        "cls": jnp.zeros((2, M), jnp.int32),
        "mask": jnp.ones((2, M), bool),
    }
    step = trainer.make_train_step()
    state, loss, _ = step(state, batch)
    assert np.isfinite(float(loss))


def test_checkpoint_roundtrip(tmp_path):
    trainer, state, batch = _tiny_setup()
    step = trainer.make_train_step()
    state, loss, aux = step(state, batch)
    trainer.save_checkpoint(tmp_path / "ck", state, epoch=0)
    restored, next_epoch = trainer.restore_checkpoint(tmp_path / "ck")
    assert next_epoch == 1
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state continues training
    restored, loss2, _ = step(restored, batch)
    assert np.isfinite(float(loss2))


def test_nan_guard_skips_update():
    trainer, state, batch = _tiny_setup()
    step = trainer.make_train_step()
    bad = dict(batch)
    bad["img"] = batch["img"].at[0, 0, 0, 0].set(jnp.nan)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state2, loss, aux = step(state, bad)
    assert aux["nan_skipped"] == 1.0
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))


def test_fit_early_stopping(tmp_path):
    trainer, state, batch = _tiny_setup()
    trainer.cfg.patience = 1

    def loader(epoch):
        return [batch]

    calls = {"n": 0}

    def validate(state):
        calls["n"] += 1
        return {"mAP50": 0.5, "mAP50-95": 0.5}  # constant fitness -> stop

    state = trainer.fit(state, loader, validate_fn=validate, epochs=10,
                        save_dir=str(tmp_path), log=lambda *a: None)
    assert calls["n"] < 10, "early stopping did not trigger"
    assert (tmp_path / "best.ckpt").exists() and (tmp_path / "results.json").exists()
