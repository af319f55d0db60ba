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


def test_ema_once_per_optimizer_update():
    """EMA cadence under grad accumulation (reference trainer.py:586-594):
    EMA updates once per OPTIMIZER update, with `updates` counting optimizer
    updates — k micro-steps at accumulate=k must produce exactly one EMA
    update whose ramp uses update-count 1."""
    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=3)
    k = 3
    cfg = TrainConfig(epochs=2, batch=2, imgsz=64, nbs=2 * k, warmup_epochs=0.0)
    trainer = Trainer(model, cfg, steps_per_epoch=k)
    assert trainer.accumulate == k
    state = trainer.init_state()
    M = 4
    batch = {
        "img": jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)),
        "bboxes": jnp.asarray(np.tile(np.array([[[0.5, 0.5, 0.3, 0.2, 0.1]]], np.float32), (2, M, 1))),
        "cls": jnp.zeros((2, M), jnp.int32),
        "mask": jnp.ones((2, M), bool),
    }
    step = trainer.make_train_step()
    p0 = jax.device_get(state.params)
    for i in range(k - 1):
        state, _, _ = step(state, batch)
        # params unchanged during accumulation -> EMA must be untouched too
        for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                        jax.tree_util.tree_leaves(p0)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state, _, _ = step(state, batch)  # k-th micro-step: optimizer applies
    d1 = cfg.ema_decay * (1.0 - np.exp(-1.0 / cfg.ema_tau))  # ramp at count 1
    expect = jax.tree_util.tree_map(
        lambda e, p: np.asarray(e) * d1 + np.asarray(p) * (1.0 - d1),
        p0, jax.device_get(state.params))
    for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(expect)):
        # f32 state vs f64 host-side expectation: pure rounding slack
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6, atol=1e-7)


def test_train_step_does_not_leak_assigner_impl():
    """Regression (round-4 VERDICT weak #1): make_train_step mutated
    process-global os.environ (QUAN_ASSIGNER_BF16) and flipped later
    standalone losses to the bf16 metric chain, breaking exact-f32 parity
    assertions suite-order-dependently. Standalone loss values must be
    bitwise identical before and after building/running a train step."""
    import os

    from quan_ultralytics_tpu.losses.detect import detection_loss

    rng = np.random.RandomState(0)
    nc, reg_max = 3, 16
    feats = [jnp.asarray(rng.randn(2, s, s, 4 * reg_max + nc).astype(np.float32) * 2)
             for s in (8, 4, 2)]
    M = 6
    lbatch = {
        "cls": jnp.asarray(rng.randint(0, nc, (2, M)), jnp.int32),
        "bboxes": jnp.asarray(rng.uniform(0.2, 0.6, (2, M, 4)).astype(np.float32)),
        "mask": jnp.ones((2, M), bool),
    }
    env_before = os.environ.get("QUAN_ASSIGNER_BF16")
    baseline, _ = detection_loss(feats, lbatch, (8, 16, 32), nc)
    baseline = float(baseline)

    trainer, state, tbatch = _tiny_setup()
    step = trainer.make_train_step()
    state, loss, _ = step(state, tbatch)
    assert np.isfinite(float(loss))

    assert os.environ.get("QUAN_ASSIGNER_BF16") == env_before, \
        "train step mutated QUAN_ASSIGNER_BF16"
    after, _ = detection_loss(feats, lbatch, (8, 16, 32), nc)
    assert float(after) == baseline, "standalone loss changed after train step"


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
