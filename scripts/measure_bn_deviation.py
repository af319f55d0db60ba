"""Measure the synced-BN (global-batch IQBN stats) vs per-device-BN deviation.

The reference trains DDP with per-GPU BatchNorm statistics (torch default —
no SyncBN wrap in the trainer); our pjit data parallelism computes IQBN
statistics over the GLOBAL batch (models/conv.py:186-191). This script
quantifies the training-trajectory difference on the 8-virtual-CPU mesh:

  * variant A (ours): one train step on the global batch of 8.
  * variant B (reference semantics): vmap the loss over 8 single-image
    groups — each group normalizes with ITS OWN batch stats (exactly per-GPU
    BN), gradients averaged (the DDP all-reduce), running stats averaged.

Prints both loss curves and the relative deltas -> DEVIATIONS.md.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     timeout 3600 python scripts/measure_bn_deviation.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
    from quan_ultralytics_tpu.models.tasks import DetectionModel

    G, imgsz, M, steps = 8, 64, 4, 30
    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=3)
    cfg = TrainConfig(epochs=1, batch=G, imgsz=imgsz, nbs=G, warmup_epochs=0.0,
                      dtype="float32", lr0=0.01)
    trainer = Trainer(model, cfg, steps_per_epoch=steps)
    state0 = trainer.init_state()
    tx = trainer.tx

    rng = np.random.RandomState(0)
    batches = []
    for _ in range(steps):
        batches.append({
            "img": jnp.asarray(rng.rand(G, imgsz, imgsz, 3).astype(np.float32)),
            "bboxes": jnp.asarray(
                np.tile(np.array([[0.5, 0.5, 0.3, 0.2, 0.1]], np.float32), (G, M, 1))
                * rng.uniform(0.8, 1.2, (G, M, 5)).astype(np.float32)),
            "cls": jnp.zeros((G, M), jnp.int32),
            "mask": jnp.ones((G, M), bool),
        })

    # ---- variant A: global-batch stats (our synced-BN semantics)
    step_fn = trainer.make_train_step()
    sA, lossesA = state0, []
    for b in batches:
        sA, loss, _ = step_fn(sA, b)
        lossesA.append(float(loss))

    # ---- variant B: per-device BN statistics, everything else identical.
    # The model forward runs per single-image group (each group normalizes
    # with ITS OWN batch stats - exactly per-GPU BN), the outputs are merged
    # and ONE global loss is computed, so the ONLY difference vs variant A is
    # which statistics the IQBN layers normalize with.
    from quan_ultralytics_tpu.losses.detect import obb_loss

    def loss_pergroup_bn(params, stats, batch):
        def fwd(gimg):
            return model.module.apply(
                {"params": params, "batch_stats": stats}, gimg[None],
                train=True, mutable=["batch_stats"])

        out, upds = jax.vmap(fwd)(batch["img"].astype(jnp.float32))
        out = jax.tree_util.tree_map(
            lambda a: a.reshape((a.shape[0],) + a.shape[2:]), out)
        total, aux = obb_loss(out, batch, model.strides, model.nc,
                              hyp=trainer.loss_hyp)
        new_stats = jax.tree_util.tree_map(
            lambda s: s.mean(0), upds["batch_stats"])  # DDP buffer average
        return total, (aux, new_stats)

    @jax.jit
    def stepB(state, batch):
        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_pergroup_bn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        from quan_ultralytics_tpu.engine.trainer import ema_update

        step = state.step + 1
        ema = ema_update(state.ema_params, new_params, step, cfg.ema_decay, cfg.ema_tau)
        return state.replace(step=step, params=new_params, batch_stats=new_stats,
                             opt_state=new_opt, ema_params=ema), loss

    sB, lossesB = state0, []
    for b in batches:
        sB, loss = stepB(sB, b)
        lossesB.append(float(loss))

    rel = [abs(a - b) / max(abs(a), 1e-9) for a, b in zip(lossesA, lossesB)]
    # parameter divergence after `steps` steps
    pd = [float(jnp.abs(x - y).max()) for x, y in zip(
        jax.tree_util.tree_leaves(sA.params), jax.tree_util.tree_leaves(sB.params))]
    print(json.dumps({
        "steps": steps,
        "loss_synced_first_last": [round(lossesA[0], 4), round(lossesA[-1], 4)],
        "loss_perdev_first_last": [round(lossesB[0], 4), round(lossesB[-1], 4)],
        "max_rel_loss_delta": round(max(rel), 5),
        "mean_rel_loss_delta": round(float(np.mean(rel)), 5),
        "max_param_abs_delta": round(max(pd), 6),
    }, indent=1))


if __name__ == "__main__":
    main()
