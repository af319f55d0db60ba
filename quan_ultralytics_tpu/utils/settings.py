"""Persistent user settings (reference utils/__init__.py SettingsManager
:842-1324).

A JSON-backed dict at ``$QUAN_TPU_SETTINGS`` (default
``~/.config/quan_ultralytics_tpu/settings.json``) holding directories and
per-integration enable flags. The reference gates each logger callback on
``SETTINGS[name] is True`` (e.g. mlflow.py:30); `utils/integrations.py`
applies the same gate here. Unknown keys are rejected; a version bump
resets stale files like the reference's ``correct_keys`` check.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict

_VERSION = "1.0"

_DEFAULTS: Dict[str, Any] = {
    "settings_version": _VERSION,
    "datasets_dir": "datasets",
    "runs_dir": "runs",
    "weights_dir": "weights",
    # integration toggles (reference SETTINGS defaults :897-915)
    "tensorboard": True,
    "wandb": True,
    "mlflow": True,
    "comet": True,
    "clearml": True,
    "dvc": True,
    "neptune": True,
    "raytune": True,
    "sync": False,  # reference 'sync'/'hub' analytics — no egress here
}


def _path() -> Path:
    env = os.environ.get("QUAN_TPU_SETTINGS")
    if env:
        return Path(env)
    return Path.home() / ".config" / "quan_ultralytics_tpu" / "settings.json"


class SettingsManager(dict):
    """Dict with JSON persistence and typed, known-key updates."""

    def __init__(self):
        super().__init__(_DEFAULTS)
        self.file = _path()
        # READ-ONLY load: never write at import time — a mere import must
        # not touch (or, worse, be able to corrupt) the user's config, and
        # settings.json only changes on an explicit update()/reset().
        try:
            loaded = json.loads(self.file.read_text())
            if (set(loaded) == set(_DEFAULTS)
                    and loaded.get("settings_version") == _VERSION):
                dict.update(self, loaded)
            # stale schema / unknown keys: keep in-memory defaults
            # (reference correct_keys reset :1010-1023, deferred to the
            # next explicit save)
        except Exception:
            pass

    def save(self) -> None:
        self.file.parent.mkdir(parents=True, exist_ok=True)
        # atomic replace: a concurrent reader never sees a half-written file
        tmp = self.file.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(dict(self), indent=2))
        os.replace(tmp, self.file)

    def update(self, *args, **kwargs) -> None:  # type: ignore[override]
        new = dict(*args, **kwargs)
        for k, v in new.items():
            if k not in _DEFAULTS:
                raise KeyError(
                    f"unknown setting {k!r} (valid: {sorted(_DEFAULTS)})")
            want = type(_DEFAULTS[k])
            if not isinstance(v, want):
                raise TypeError(f"setting {k!r} must be {want.__name__}, "
                                f"got {type(v).__name__}")
        super().update(new)
        if new:
            self.save()

    def reset(self) -> None:
        self.clear()
        super().update(_DEFAULTS)
        self.save()


SETTINGS = SettingsManager()
