"""`yolo`-style CLI: ``python -m quan_ultralytics_tpu.cli TASK MODE k=v ...``.

Analog of reference ultralytics/cfg/__init__.py entrypoint (:825):
    yolo obb train model=yolo11n-obb-quan.yaml data=dota8.yaml epochs=10
    yolo detect val model=... data=...
    yolo obb predict model=runs/train/best.pkl source=img.jpg
Task may be omitted (inferred from the model head).
"""

from __future__ import annotations

import ast
import sys
from typing import Any, Dict

MODES = ("train", "val", "predict")
TASKS = ("detect", "obb", "classify")


def parse_kv(argv) -> Dict[str, Any]:
    out = {}
    for a in argv:
        if "=" not in a:
            raise SystemExit(f"expected k=v argument, got {a!r}")
        k, v = a.split("=", 1)
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    task = None
    if argv and argv[0] in TASKS:
        task = argv.pop(0)
    if not argv or argv[0] not in MODES:
        print(__doc__)
        raise SystemExit(f"usage: yolo [task] MODE k=v...  (modes: {MODES})")
    mode = argv.pop(0)
    kv = parse_kv(argv)

    if task == "classify":
        # classification has its own reference-compatible argparse CLI
        from quan_ultralytics_tpu.classification.cli import main as cls_main

        flags = []
        for k, v in kv.items():
            flags += [f"--{k}", str(v)]
        return cls_main(flags)

    from quan_ultralytics_tpu.engine.model import YOLO

    model_arg = kv.pop("model", "yolo11n-obb-quan.yaml" if task == "obb" else "yolo11n-quan.yaml")
    model = YOLO(model_arg)
    if mode in ("train", "val") and "data" not in kv:
        raise SystemExit(f"yolo {mode} requires data=<dataset.yaml>")
    if mode == "predict" and "source" not in kv:
        raise SystemExit("yolo predict requires source=<image-or-dir>")
    if mode == "train":
        data = kv.pop("data")
        res = model.train(data, **kv)
        print(res)
    elif mode == "val":
        data = kv.pop("data")
        res = model.val(data, **kv)
        print(res)
    elif mode == "predict":
        source = kv.pop("source")
        results = model.predict(source, **kv)
        for r in results:
            print(f"{len(r)} detections", r.boxes[:10])
    return 0


if __name__ == "__main__":
    main()
