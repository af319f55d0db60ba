"""Orbax checkpointing of full train state (async-capable).

TPU analog of reference BaseTrainer.save_model (trainer.py:513-546): the
checkpoint carries {step, params, ema, batch_stats, opt_state} with the
last/best/epochN retention policy; `check_resume`/`resume_training`
(trainer.py:692-750) become `latest`/`restore`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, state: Any) -> None:
    p = Path(path).resolve()
    _ckptr().save(p, jax.device_get(state), force=True)


def restore(path: str, target: Optional[Any] = None) -> Any:
    p = Path(path).resolve()
    return _ckptr().restore(p, item=target)


def latest(run_dir: str) -> Optional[str]:
    d = Path(run_dir)
    if not d.exists():
        return None
    cands = sorted(d.glob("epoch*"), key=lambda q: int(q.name[5:]) if q.name[5:].isdigit() else -1)
    if (d / "last").exists():
        return str(d / "last")
    return str(cands[-1]) if cands else None
