"""Layered config: default.yaml + overrides with type/range validation.

Analog of reference ultralytics/cfg/__init__.py get_cfg (:repo entry
`entrypoint` lives in quan_ultralytics_tpu.cli). Produces a simple namespace
whose keys match the reference's default.yaml vocabulary.
"""

from __future__ import annotations

from pathlib import Path
from types import SimpleNamespace
from typing import Any, Dict, Optional, Union

import yaml

CFG_PATH = Path(__file__).resolve().parent / "default.yaml"

# keys validated as fractions in [0, 1]
CFG_FRACTION_KEYS = {
    "lrf", "momentum", "weight_decay", "warmup_momentum", "hsv_h", "hsv_s",
    "hsv_v", "translate", "scale", "flipud", "fliplr", "mosaic", "mixup",
    "copy_paste", "conf", "iou", "fraction",
}
CFG_INT_KEYS = {"epochs", "patience", "batch", "imgsz", "workers", "seed",
                "close_mosaic", "max_det", "nbs", "save_period", "vid_stride"}
CFG_BOOL_KEYS = {"save", "exist_ok", "pretrained", "deterministic", "resume",
                 "amp", "profile", "multi_scale", "val", "save_json", "half",
                 "plots", "augment", "agnostic_nms", "dynamic", "nms"}


def load_default() -> Dict[str, Any]:
    with open(CFG_PATH) as fh:
        return yaml.safe_load(fh)


def get_cfg(overrides: Optional[Dict[str, Any]] = None,
            cfg: Union[str, Dict, None] = None) -> SimpleNamespace:
    """Merge default.yaml (or a user cfg yaml) with overrides, type-checked."""
    base = load_default()
    if isinstance(cfg, (str, Path)):
        with open(cfg) as fh:
            base.update(yaml.safe_load(fh) or {})
    elif isinstance(cfg, dict):
        base.update(cfg)
    for k, v in (overrides or {}).items():
        if k not in base:
            raise KeyError(
                f"invalid config key {k!r}; valid keys are in {CFG_PATH}")
        base[k] = v
    for k, v in base.items():
        if v is None:
            continue
        if k in CFG_INT_KEYS and not isinstance(v, bool):
            base[k] = int(v)
        elif k in CFG_BOOL_KEYS:
            if isinstance(v, str):
                base[k] = v.lower() in ("1", "true", "yes")
            else:
                base[k] = bool(v)
        elif k in CFG_FRACTION_KEYS and isinstance(v, (int, float)):
            if not 0.0 <= float(v) <= 1.0:
                raise ValueError(f"config key {k}={v} must be in [0, 1]")
    return SimpleNamespace(**base)
