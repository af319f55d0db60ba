"""Classification training harness (CIFAR/SVHN/ImageNet).

TPU analog of reference classification/classification.py (:43-291) +
classification/utils/training.py: SGD(momentum=0.9, nesterov, wd=1e-4),
MultiStepLR [30, 60, 90] gamma=0.1, cross-entropy on the quaternion-norm
logits, AMP -> bf16 compute, top-1/top-5 eval, experiment dirs with metrics
json and last/best checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
import pickle
import signal
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from quan_ultralytics_tpu.classification.models import create_model
from quan_ultralytics_tpu.parallel.mesh import make_mesh, shard_batch


@dataclasses.dataclass
class ClsConfig:
    model: str = "qwrn16_2"
    dataset: str = "cifar10"
    data_dir: str = "data"
    mapping: str = "poincare"
    epochs: int = 100
    batch_size: int = 128
    lr: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 1e-4
    milestones: Tuple[int, ...] = (30, 60, 90)
    gamma: float = 0.1
    drop_rate: float = 0.0
    num_classes: int = 10
    dtype: str = "bfloat16"
    seed: int = 0
    exp_dir: str = "runs/classify"
    augment: bool = True


class ClsState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def multistep_lr(cfg: ClsConfig, steps_per_epoch: int) -> Callable:
    bounds = {int(m * steps_per_epoch): cfg.gamma for m in cfg.milestones}
    return optax.piecewise_constant_schedule(cfg.lr, bounds)


def build_cls_optimizer(cfg: ClsConfig, steps_per_epoch: int):
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(multistep_lr(cfg, steps_per_epoch), momentum=cfg.momentum, nesterov=True),
    )


class ClsTrainer:
    def __init__(self, cfg: ClsConfig, steps_per_epoch: int):
        self.cfg = cfg
        self.model = create_model(
            cfg.model, cfg.num_classes, cfg.drop_rate, cfg.mapping,
            dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else None,
        )
        self.tx = build_cls_optimizer(cfg, steps_per_epoch)
        self.mesh = make_mesh()
        self._train_step = None
        self._eval_step = None

    def init_state(self, input_size: int = 32) -> ClsState:
        rng = jax.random.PRNGKey(self.cfg.seed)
        x = jnp.zeros((2, input_size, input_size, 3), jnp.float32)
        variables = self.model.init({"params": rng, "dropout": rng}, x, train=False)
        params = variables["params"]
        return ClsState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(params),
        )

    def make_train_step(self):
        model, tx = self.model, self.tx
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32

        def loss_fn(params, batch_stats, batch, rng):
            logits, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["img"].astype(dtype),
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            # CE on quaternion-norm logits (reference classification.py:214)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), batch["label"]
            ).mean()
            acc = (logits.argmax(-1) == batch["label"]).mean()
            return loss, (acc, updates["batch_stats"])

        @jax.jit
        def step_fn(state: ClsState, batch, rng):
            (loss, (acc, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, rng
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt),
                loss, acc,
            )

        return step_fn

    def make_eval_step(self):
        model = self.model

        @jax.jit
        def eval_fn(state: ClsState, batch):
            logits = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["img"], train=False,
            ).astype(jnp.float32)
            top1 = (logits.argmax(-1) == batch["label"]).sum()
            k = min(5, logits.shape[-1])
            topk = jax.lax.top_k(logits, k)[1]
            top5 = (topk == batch["label"][:, None]).any(-1).sum()
            return top1, top5

        return eval_fn

    def evaluate(self, state: ClsState, data_iter) -> Dict[str, float]:
        eval_fn = self._eval_step or self.make_eval_step()
        self._eval_step = eval_fn
        c1 = c5 = n = 0
        for batch in data_iter:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            t1, t5 = eval_fn(state, batch)
            c1 += int(t1)
            c5 += int(t5)
            n += batch["label"].shape[0]
        return {"top1": c1 / max(n, 1), "top5": c5 / max(n, 1)}


class ExperimentManager:
    """Timestamped experiment dirs with config/metrics/checkpoints
    (reference classification/utils/experiment_manager.py:8-240;
    keep-last-5 policy :204)."""

    def __init__(self, cfg: ClsConfig, name: Optional[str] = None):
        stamp = time.strftime("%Y%m%d_%H%M%S")
        self.dir = Path(cfg.exp_dir) / (name or f"{cfg.model}_{cfg.dataset}_{stamp}")
        self.dir.mkdir(parents=True, exist_ok=True)
        (self.dir / "config.json").write_text(json.dumps(dataclasses.asdict(cfg), indent=2))
        self.metrics: list = []
        self.best_acc = 0.0

    def log_epoch(self, epoch: int, train_loss: float, train_acc: float, val: Dict[str, float], lr: float):
        row = {"epoch": epoch, "train_loss": train_loss, "train_acc": train_acc,
               "lr": lr, **val}
        self.metrics.append(row)
        (self.dir / "metrics.json").write_text(json.dumps(self.metrics, indent=2))
        try:  # training curves (reference experiment_manager.py:95-178)
            from quan_ultralytics_tpu.utils.plotting import plot_curves

            plot_curves(self.metrics, str(self.dir / "curves.png"))
        except Exception:
            pass
        return row

    def save_checkpoint(self, state: ClsState, epoch: int, val_acc: float, keep_last: int = 5):
        payload = {
            "epoch": epoch,
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": int(state.step),
            "val_acc": val_acc,
        }
        p = self.dir / f"checkpoint_epoch{epoch}.pkl"
        with open(p, "wb") as fh:
            pickle.dump(payload, fh)
        (self.dir / "last.pkl").write_bytes(p.read_bytes())
        if val_acc > self.best_acc:
            self.best_acc = val_acc
            (self.dir / "best_model.pkl").write_bytes(p.read_bytes())
        ckpts = sorted(self.dir.glob("checkpoint_epoch*.pkl"),
                       key=lambda q: int(q.stem.split("epoch")[1]))
        for old in ckpts[:-keep_last]:
            old.unlink()

    @staticmethod
    def load_checkpoint(path: str):
        with open(path, "rb") as fh:
            return pickle.load(fh)


def fit(cfg: ClsConfig, train_loader_fn: Callable[[int], Iterator],
        val_loader_fn: Callable[[], Iterator], steps_per_epoch: int,
        input_size: int = 32, start_state: Optional[ClsState] = None,
        start_epoch: int = 0, log=print) -> Tuple[ClsState, ExperimentManager]:
    trainer = ClsTrainer(cfg, steps_per_epoch)
    state = start_state if start_state is not None else trainer.init_state(input_size)
    step_fn = trainer.make_train_step()
    exp = ExperimentManager(cfg)
    sched = multistep_lr(cfg, steps_per_epoch)
    rng = jax.random.PRNGKey(cfg.seed + 1)

    interrupted = {"flag": False}

    def _sigint(signum, frame):  # interrupt checkpoint (classification.py:26-40)
        interrupted["flag"] = True

    old_handler = signal.signal(signal.SIGINT, _sigint)
    try:
        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            losses, accs = [], []
            for batch in train_loader_fn(epoch):
                rng, sub = jax.random.split(rng)
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                state, loss, acc = step_fn(state, batch, sub)
                losses.append(float(loss))
                accs.append(float(acc))
                if interrupted["flag"]:
                    break
            val = trainer.evaluate(state, val_loader_fn())
            lr = float(sched(state.step))
            row = exp.log_epoch(epoch, float(np.mean(losses)), float(np.mean(accs)), val, lr)
            exp.save_checkpoint(state, epoch, val["top1"])
            log(f"epoch {epoch}: loss {row['train_loss']:.4f} acc {row['train_acc']:.4f} "
                f"top1 {val['top1']:.4f} top5 {val['top5']:.4f} lr {lr:.5f} "
                f"({time.time() - t0:.1f}s)")
            if interrupted["flag"]:
                log("interrupted — checkpoint saved")
                break
    finally:
        signal.signal(signal.SIGINT, old_handler)
    return state, exp
