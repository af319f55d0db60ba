"""Detection trainer: pjit data-parallel train step, EMA, warmup LR, ckpt.

TPU-native analog of reference ultralytics/engine/trainer.py (BaseTrainer):
  * optimizer auto-build with 3 param groups (:759+): weight-decayed conv
    weights, decay-free norm scales, decay-free biases -> optax masked decay.
  * warmup (:366-376): per-step linear interpolation over the first
    ``warmup_epochs`` epochs; bias group warms from warmup_bias_lr.
  * EMA with the ramped decay  d * (1 - exp(-updates / tau))
    (utils/torch_utils.py:495 ModelEMA).
  * grad accumulation `accumulate = round(nbs / batch)` (trainer.py:302)
    via optax.MultiSteps.
  * DDP -> a 1-D jax.sharding mesh; the gradient all-reduce is inserted by
    GSPMD, not written by hand (see parallel/mesh.py).
  * AMP fp16 + GradScaler -> bf16 compute dtype, fp32 params/loss; no scaler
    needed on TPU.
  * checkpoints: single-file pickled pytrees (utils/checkpoint.py) of
    {params, batch_stats, opt_state, ema, step} with the reference's
    last/best policy (trainer.py:513-546).
"""

from __future__ import annotations

import dataclasses
import json
import math
import time
from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training import train_state

from quan_ultralytics_tpu.losses.detect import LossHyp, detection_loss, obb_loss
from quan_ultralytics_tpu.models.tasks import DetectionModel
from quan_ultralytics_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from quan_ultralytics_tpu.parallel.prefetch import prefetch_to_device


@dataclasses.dataclass
class TrainConfig:
    """Subset of reference cfg/default.yaml hyperparameters that affect the
    optimization (same defaults)."""

    epochs: int = 100
    batch: int = 16
    imgsz: int = 640
    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    nbs: int = 64  # nominal batch size for grad accumulation / decay scaling
    cos_lr: bool = False
    optimizer: str = "auto"  # auto -> SGD for detection
    box: float = 7.5
    cls: float = 0.5
    dfl: float = 1.5
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0
    max_grad_norm: float = 10.0
    dtype: str = "bfloat16"
    seed: int = 0
    save_dir: str = "runs/train"
    patience: int = 100
    multi_scale: bool = False
    guard_nan: bool = True  # skip optimizer update on non-finite loss/grads
    assigner_bf16: Optional[bool] = None  # TAL metric chain in bf16 (faster,
    # 139.9 vs 136.3 img/s b24@1024 r3 abf16 A/B; assignment is a selection
    # heuristic, no gradients flow through it). None -> default ON for the
    # trainer unless $QUAN_ASSIGNER_BF16 == "0" opts out. Passed explicitly
    # into the loss (NOT via environ mutation): standalone loss calls keep
    # their exact-f32 default regardless of trainer activity in the process.


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any

    def variables(self, ema: bool = False):
        return {"params": self.ema_params if ema else self.params, "batch_stats": self.batch_stats}


def _param_label(path: Tuple, leaf) -> str:
    """Classify params into optimizer groups like reference build_optimizer:
    'bias' (QER/real conv biases, beta), 'norm' (gamma / IQLN weight), else
    'weight' (decayed)."""
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    last = keys[-1] if keys else ""
    if last in ("b", "bias", "beta"):
        return "bias"
    if last in ("gamma",) or ("bn" in keys and last == "weight"):
        return "norm"
    return "weight"


def _warmup_updates(cfg: TrainConfig, steps_per_epoch: int, accumulate: int) -> float:
    """Warmup length in OPTIMIZER updates. The reference floors warmup at 100
    dataloader iterations (trainer.py:366); under grad accumulation the
    schedules inside optax.MultiSteps only see one count per `accumulate`
    micro-steps, so both the epoch length and the floor are divided by it."""
    if cfg.warmup_epochs == 0:  # explicit 0 disables (tiny-run/overfit use)
        return 0.0
    return max(cfg.warmup_epochs * steps_per_epoch, 100.0) / accumulate


def lr_schedule(
    cfg: TrainConfig, steps_per_epoch: int, accumulate: int = 1
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """lr(update): warmup then linear (or cosine) decay to lr0*lrf
    (reference trainer 'one_cycle'/linear `lf`, trainer.py:810 + :366-376).
    `update` counts optimizer updates (= micro-steps / accumulate)."""
    warmup_steps = _warmup_updates(cfg, steps_per_epoch, accumulate)
    updates_per_epoch = max(steps_per_epoch / accumulate, 1e-9)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        frac_epoch = step / updates_per_epoch
        if cfg.cos_lr:
            decay = cfg.lrf + 0.5 * (1 - cfg.lrf) * (1 + jnp.cos(math.pi * frac_epoch / cfg.epochs))
        else:
            decay = (1 - frac_epoch / cfg.epochs) * (1.0 - cfg.lrf) + cfg.lrf
        lr = cfg.lr0 * decay
        if warmup_steps:
            lr = lr * jnp.clip(step / warmup_steps, 0.0, 1.0)
        return lr

    return fn


def build_optimizer(cfg: TrainConfig, params, steps_per_epoch: int) -> optax.GradientTransformation:
    """3-group SGD with warmup fidelity (reference trainer.py:366-376 +
    build_optimizer :759+): momentum ramps warmup_momentum -> momentum, the
    bias group's LR ramps from warmup_bias_lr DOWN to the schedule, weight
    decay only on conv weights, scaled by batch*accumulate/nbs."""
    accumulate = max(round(cfg.nbs / cfg.batch), 1)
    schedule = lr_schedule(cfg, steps_per_epoch, accumulate)
    wd = cfg.weight_decay * cfg.batch * accumulate / cfg.nbs
    warmup_steps = _warmup_updates(cfg, steps_per_epoch, accumulate)

    def momentum_schedule(step):
        if warmup_steps == 0:
            return cfg.momentum
        w = jnp.clip(jnp.asarray(step, jnp.float32) / warmup_steps, 0.0, 1.0)
        return cfg.warmup_momentum + (cfg.momentum - cfg.warmup_momentum) * w

    def bias_lr_schedule(step):
        # interpolate warmup_bias_lr -> schedule over warmup, then follow it
        base = schedule(step)
        if warmup_steps == 0:
            return base
        w = jnp.clip(jnp.asarray(step, jnp.float32) / warmup_steps, 0.0, 1.0)
        # lr_schedule already multiplies by w; reconstruct the un-warmed lr
        full = jnp.where(w > 0, base / jnp.maximum(w, 1e-9), base)
        return jnp.where(w < 1.0, cfg.warmup_bias_lr + (full - cfg.warmup_bias_lr) * w, base)

    labels = jax.tree_util.tree_map_with_path(_param_label, params)

    def sgd(decay, lr):
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.add_decayed_weights(decay) if decay else optax.identity(),
            optax.inject_hyperparams(
                lambda learning_rate, momentum: optax.sgd(learning_rate, momentum, nesterov=True)
            )(learning_rate=lr, momentum=momentum_schedule),
        )

    tx = optax.multi_transform(
        {"weight": sgd(wd, schedule), "norm": sgd(0.0, schedule), "bias": sgd(0.0, bias_lr_schedule)},
        labels,
    )
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx


def ema_update(ema_params, new_params, updates: jnp.ndarray, decay: float, tau: float):
    """ModelEMA ramped decay (reference torch_utils.py:495)."""
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    return jax.tree_util.tree_map(lambda e, p: e * d + p * (1.0 - d), ema_params, new_params)


class Trainer:
    """Minimal faithful trainer for detect/obb tasks.

    Data comes from any iterable yielding dicts with:
      'img'    [B, H, W, 3] uint8 0..255 (normalized on device) or
               float32 in [0, 1]
      'cls'    [B, M] int32, 'bboxes' [B, M, 4|5] normalized, 'mask' [B, M]
    """

    def __init__(self, model: DetectionModel, cfg: TrainConfig, steps_per_epoch: int):
        self.model = model
        self.cfg = cfg
        self.steps_per_epoch = steps_per_epoch
        self.mesh = make_mesh()
        self.loss_hyp = LossHyp(box=cfg.box, cls=cfg.cls, dfl=cfg.dfl)
        self.accumulate = max(round(cfg.nbs / cfg.batch), 1)  # trainer.py:302
        self._train_step = None

    def init_state(self, rng=None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        # Init at a small probe size to keep tracing cheap, but the probe must
        # be a multiple of the max stride (32): at imgsz=640 the naive //8
        # gives 80, whose P5 upsample (3->6) cannot concat against P4 (5) —
        # exactly the reference COCO recipe shape (args_classical.yaml:6).
        probe = max((self.cfg.imgsz // 8 + 31) // 32 * 32, 64)
        variables = self.model.init(rng, imgsz=probe)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.tx = build_optimizer(self.cfg, params, self.steps_per_epoch)
        opt_state = self.tx.init(params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            ema_params=params,
        )
        jax.block_until_ready(state)
        return state

    def _assigner_bf16(self) -> bool:
        """Resolve the trainer's TAL-metric dtype choice (read-only env
        opt-out; never mutates process state)."""
        import os

        if self.cfg.assigner_bf16 is not None:
            return bool(self.cfg.assigner_bf16)
        return os.environ.get("QUAN_ASSIGNER_BF16", "1") == "1"

    def loss_fn(self, params, batch_stats, batch):
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        assigner_bf16 = self._assigner_bf16()
        img = batch["img"]
        if img.dtype == jnp.uint8:
            # loader ships uint8 (4x less H2D); divide in f32 first so the
            # result is bit-identical to the old host-side f32/255 batches
            img = img.astype(jnp.float32) / 255.0
        img = img.astype(dtype)
        from quan_ultralytics_tpu.models.conv import train_graph

        with train_graph():
            # scope conv-impl TRAIN defaults (fold threshold 128: the
            # backward's layout flips at folded/grouped boundaries cost more
            # than dense FLOPs — 156.4 vs 140.5 img/s b24@1024, r4 trainfold)
            # to this trace; validator/predictor traces keep inference
            # defaults (fold 32)
            out, updates = self.model.module.apply(
                {"params": params, "batch_stats": batch_stats},
                img,
                train=True,
                mutable=["batch_stats"],
            )
        if self.model.task == "obb":
            total, aux = obb_loss(out, batch, self.model.strides, self.model.nc,
                                  hyp=self.loss_hyp, assigner_bf16=assigner_bf16)
        elif self.model.task == "segment":
            from quan_ultralytics_tpu.losses.segpose import segmentation_loss

            total, aux = segmentation_loss(out, batch, self.model.strides,
                                           self.model.nc, hyp=self.loss_hyp,
                                           assigner_bf16=assigner_bf16)
        elif self.model.task == "pose":
            from quan_ultralytics_tpu.losses.segpose import pose_loss

            kpt_shape = tuple(self.model.specs[-1].args[1])
            total, aux = pose_loss(out, batch, self.model.strides, self.model.nc,
                                   kpt_shape=kpt_shape, hyp=self.loss_hyp,
                                   assigner_bf16=assigner_bf16)
        else:
            total, aux = detection_loss(out, batch, self.model.strides, self.model.nc,
                                        hyp=self.loss_hyp, assigner_bf16=assigner_bf16)
        return total, (aux, updates["batch_stats"])

    def make_train_step(self):
        import os

        if os.environ.get("QUAN_QCONV_IMPL") == "int8":
            # the PTQ path round()s activations/weights — zero gradient;
            # int8 is a serving-only impl (ops/qconv.py qconv2d_int8)
            raise RuntimeError("QUAN_QCONV_IMPL=int8 is inference-only; "
                               "unset it for training")
        tx = self.tx

        guard_nan = self.cfg.guard_nan
        accumulate = self.accumulate

        @jax.jit
        def train_step(state: TrainState, batch):
            (loss, (aux, new_stats)), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            step = state.step + 1
            # EMA follows OPTIMIZER updates, not micro-steps (reference
            # trainer.py:586-594 calls ema.update only inside optimizer_step,
            # and ModelEMA.updates counts those calls, torch_utils.py:495).
            # Under grad accumulation optax.MultiSteps only applies the inner
            # update every `accumulate` micro-steps; on the other micro-steps
            # params are unchanged and the EMA must not decay toward them.
            if accumulate > 1:
                n_updates = new_opt.gradient_step  # optimizer-update count
                did_update = n_updates != state.opt_state.gradient_step
            else:
                n_updates = step
                did_update = jnp.bool_(True)
            ema = ema_update(state.ema_params, new_params, n_updates,
                             self.cfg.ema_decay, self.cfg.ema_tau)
            ema = jax.tree_util.tree_map(
                lambda e_new, e_old: jnp.where(did_update, e_new, e_old),
                ema, state.ema_params)
            if guard_nan:
                # NaN guard (the reference's commented nan_to_num hook,
                # trainer.py:248, done right): a non-finite loss or grad skips
                # the WHOLE update — params, optimizer state (incl. momentum
                # buffers and schedule counters), EMA, and the step counter
                # all keep their previous values instead of being poisoned or
                # nudged by stale momentum.
                finite = jnp.isfinite(loss)
                for g in jax.tree_util.tree_leaves(grads):
                    finite &= jnp.isfinite(g).all()

                def keep(new, old):
                    return jax.tree_util.tree_map(
                        lambda n, o: jnp.where(finite, n, o), new, old
                    )

                new_params = keep(new_params, state.params)
                new_opt = keep(new_opt, state.opt_state)
                ema = keep(ema, state.ema_params)
                new_stats = keep(new_stats, state.batch_stats)
                step = jnp.where(finite, step, state.step)
                aux = {**aux, "nan_skipped": (~finite).astype(jnp.float32)}
            return (
                state.replace(step=step, params=new_params, batch_stats=new_stats,
                              opt_state=new_opt, ema_params=ema),
                loss,
                aux,
            )

        return train_step

    def fit(
        self,
        state: TrainState,
        train_loader_fn,  # epoch:int -> iterable of batches
        validate_fn=None,  # state -> metrics dict (run on EMA weights)
        epochs: Optional[int] = None,
        start_epoch: int = 0,
        save_dir: Optional[str] = None,
        close_mosaic_hook=None,  # epoch:int -> None; called at epochs-close_mosaic
        close_mosaic: int = 10,
        log=print,
        callbacks=None,
    ) -> TrainState:
        """Full epoch loop: train -> EMA validate -> save last/best -> early
        stop (reference BaseTrainer._do_train trainer.py:319-477, fitness =
        0.9*mAP50-95 + 0.1*mAP50, EarlyStopping torch_utils.py:713)."""
        import json
        from pathlib import Path

        step_fn = self._train_step or self.make_train_step()
        self._train_step = step_fn
        epochs = epochs or self.cfg.epochs
        # None = "no best yet": the first epoch always becomes best, even
        # under the no-validator fallback fitness=-loss (reference
        # BaseTrainer.best_fitness starts None, trainer.py:431-434)
        best_fitness, best_epoch = None, -1
        history = []
        out = Path(save_dir) if save_dir else None
        if out:
            out.mkdir(parents=True, exist_ok=True)
        if callbacks is not None:
            callbacks.run("on_train_start")
        for epoch in range(start_epoch, epochs):
            if close_mosaic_hook and epoch == max(epochs - close_mosaic, 0):
                close_mosaic_hook(epoch)  # reference close_mosaic (trainer.py:354)
            if callbacks is not None:
                callbacks.run("on_train_epoch_start")
            t0 = time.time()
            losses = []
            # background thread converts + device_puts the NEXT batches while
            # the current step runs (H2D hides behind device compute)
            for batch in prefetch_to_device(train_loader_fn(epoch), self.mesh, size=2):
                state, loss, aux = step_fn(state, batch)
                # keep losses on device: fetching per step would block on
                # dispatch latency every iteration and kill async pipelining
                losses.append(loss)
            losses = [float(x) for x in jax.device_get(losses)]
            row = {"epoch": epoch, "loss": float(np.mean(losses)) if losses else float("nan"),
                   "time_s": round(time.time() - t0, 2)}
            fitness = row["loss"] * -1.0  # fallback when no validator
            if validate_fn is not None:
                metrics = validate_fn(state)
                row.update(metrics)
                fitness = metrics.get("mAP50-95", 0.0) * 0.9 + metrics.get("mAP50", 0.0) * 0.1
            row["fitness"] = fitness
            history.append(row)
            if callbacks is not None:
                callbacks.run("on_train_epoch_end")
                callbacks.run("on_fit_epoch_end", row)
            log(f"epoch {epoch}: " + " ".join(f"{k}={v:.4g}" for k, v in row.items() if k != "epoch"))
            if out:
                self.save_checkpoint(out / "last.ckpt", state, epoch)
                if best_fitness is None or fitness > best_fitness:
                    best_fitness, best_epoch = fitness, epoch
                    self.save_checkpoint(out / "best.ckpt", state, epoch)
                (out / "results.json").write_text(json.dumps(history, indent=2))
                if callbacks is not None:
                    callbacks.run("on_model_save", out / "last.ckpt")
            if epoch - best_epoch > self.cfg.patience:
                log(f"early stopping: no fitness improvement in {self.cfg.patience} epochs")
                break
        self.history = history
        if callbacks is not None:
            callbacks.run("on_train_end",
                          (out / "best.ckpt") if out and (out / "best.ckpt").exists() else None)
        return state

    def save_checkpoint(self, path, state: TrainState, epoch: int) -> None:
        from quan_ultralytics_tpu.utils import checkpoint

        checkpoint.save(path, {
            "epoch": epoch,
            "step": int(state.step),
            "params": state.params,
            "batch_stats": state.batch_stats,
            "ema_params": state.ema_params,
            "opt_state": state.opt_state,
        })

    def restore_checkpoint(self, path) -> Tuple[TrainState, int]:
        """Resume (reference check_resume/resume_training trainer.py:692-750)."""
        from quan_ultralytics_tpu.utils import checkpoint

        payload = checkpoint.restore(path)
        state = TrainState(
            step=jnp.asarray(payload["step"], jnp.int32),
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            ema_params=payload["ema_params"],
        )
        return state, payload["epoch"] + 1
