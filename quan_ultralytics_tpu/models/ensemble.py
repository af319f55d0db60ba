"""Model ensembling (reference nn/tasks.py:697-710 Ensemble).

Run several trained checkpoints of the same task/nc and combine their
decoded predictions before NMS (max-confidence merge — like the reference's
NMS-over-concatenated outputs)."""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from quan_ultralytics_tpu.models.tasks import DetectionModel


class Ensemble:
    def __init__(self, models: Sequence[DetectionModel], variables_list: Sequence[dict]):
        assert len(models) == len(variables_list) and len(models) > 0
        tasks = {m.task for m in models}
        ncs = {m.nc for m in models}
        assert len(tasks) == 1 and len(ncs) == 1, "ensemble members must share task and nc"
        self.models = list(models)
        self.variables_list = list(variables_list)
        self.task = models[0].task
        self.nc = models[0].nc

    def decode(self, img: jnp.ndarray) -> jnp.ndarray:
        """Concatenated decoded predictions [B, n_models * A, ...] — feed to
        non_max_suppression like a single model's output."""
        preds = []
        for m, v in zip(self.models, self.variables_list):
            out = m.module.apply(v, img, train=False)
            preds.append(m.decode(out))
        return jnp.concatenate(preds, axis=1)
