"""Single-format checkpointing of the full train state.

TPU analog of reference BaseTrainer.save_model (trainer.py:513-546): the
checkpoint carries {epoch, step, params, ema_params, batch_stats, opt_state}
with the last/best retention policy; `check_resume`/`resume_training`
(trainer.py:692-750) become `latest`/`restore`. One format end-to-end: the
Trainer, the YOLO facade reload path, and `latest()` all read/write these
pickle payloads (optax opt_state NamedTuples round-trip exactly; orbax was
evaluated and dropped — two formats meant `latest()` could never find what
the Trainer wrote).
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax


def save(path: str, payload: Dict[str, Any]) -> None:
    """Write a host-side copy of the payload (device arrays are fetched)."""
    Path(path).write_bytes(pickle.dumps(jax.device_get(payload)))


def restore(path: str) -> Dict[str, Any]:
    return pickle.loads(Path(path).read_bytes())


def latest(run_dir: str) -> Optional[str]:
    """Most recent resumable checkpoint in a run directory: prefers last.ckpt,
    falls back to the highest epoch{N}.ckpt."""
    d = Path(run_dir)
    if not d.exists():
        return None
    if (d / "last.ckpt").exists():
        return str(d / "last.ckpt")
    cands = sorted(
        d.glob("epoch*.ckpt"),
        key=lambda q: int(q.stem[5:]) if q.stem[5:].isdigit() else -1,
    )
    return str(cands[-1]) if cands else None
