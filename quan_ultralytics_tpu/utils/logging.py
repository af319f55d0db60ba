"""Logger + persistent settings (reference utils/__init__.py LOGGER :411,
SETTINGS :842-1324)."""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Any, Dict

LOGGER = logging.getLogger("quan_tpu")
if not LOGGER.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(message)s"))
    LOGGER.addHandler(_h)
    LOGGER.setLevel(logging.INFO if os.environ.get("QUAN_VERBOSE", "1") == "1" else logging.WARNING)

SETTINGS_FILE = Path(os.environ.get("QUAN_SETTINGS", "~/.config/quan_tpu/settings.json")).expanduser()

DEFAULT_SETTINGS: Dict[str, Any] = {
    "datasets_dir": "datasets",
    "runs_dir": "runs",
    "weights_dir": "weights",
    "tensorboard": False,
    "sync": False,
}


class Settings(dict):
    """JSON-persisted user settings (reference SETTINGS singleton)."""

    def __init__(self):
        super().__init__(DEFAULT_SETTINGS)
        if SETTINGS_FILE.exists():
            try:
                self.update(json.loads(SETTINGS_FILE.read_text()))
            except Exception:
                pass

    def save(self) -> None:
        SETTINGS_FILE.parent.mkdir(parents=True, exist_ok=True)
        SETTINGS_FILE.write_text(json.dumps(dict(self), indent=2))

    def update_and_save(self, **kwargs) -> None:
        self.update(kwargs)
        self.save()


SETTINGS = Settings()
