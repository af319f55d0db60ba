"""`yolo`-style CLI: ``python -m quan_ultralytics_tpu.cli TASK MODE k=v ...``.

Analog of reference ultralytics/cfg/__init__.py entrypoint (:825):
    yolo obb train model=yolo11n-obb-quan.yaml data=dota8.yaml epochs=10
    yolo detect val model=... data=...
    yolo obb predict model=runs/train/best.pkl source=img.jpg
Task may be omitted (inferred from the model head).
"""

from __future__ import annotations

import ast
import json
import sys
from typing import Any, Dict

MODES = ("train", "val", "predict", "export", "track", "tune", "benchmark",
         "settings")
TASKS = ("detect", "obb", "classify", "segment", "pose")
DEFAULT_MODELS = {
    "obb": "yolo11n-obb-quan.yaml",
    "segment": "yolo11n-seg-quan.yaml",
    "pose": "yolo11n-pose-quan.yaml",
}


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
    if mode == "settings":
        # reference special mode 'settings' (cfg/__init__.py handle_yolo_settings
        # :583): no args prints, k=v updates, 'reset' restores defaults
        from quan_ultralytics_tpu.utils.settings import SETTINGS

        if argv and argv[0] == "reset":
            SETTINGS.reset()
            print(f"settings reset to defaults ({SETTINGS.file})")
            return 0
        updates = parse_kv(argv)
        if updates:
            try:
                SETTINGS.update(updates)
            except (KeyError, TypeError) as e:
                raise SystemExit(f"settings error: {e.args[0]}")
        print(json.dumps(dict(SETTINGS), indent=2))
        return 0
    kv = parse_kv(argv)
    if mode == "benchmark":
        # reference MODES 'benchmark' (utils/benchmarks.py benchmark :51):
        # speed table across (model, imgsz, dtype) on the XLA runtime
        from quan_ultralytics_tpu.utils.benchmarks import benchmark, print_table

        def _seq(v, cast):
            # parse_kv literal_evals "640,1024" into a tuple already; also
            # accept a bare scalar or a comma string ("a.yaml,b.yaml")
            if isinstance(v, (tuple, list)):
                return tuple(cast(s) for s in v)
            if isinstance(v, (int, float)):
                return (cast(v),)
            return tuple(cast(s.strip()) for s in str(v).split(","))

        kw = {}
        if "model" in kv:
            kw["models"] = _seq(kv["model"], str)
        if "imgsz" in kv:
            kw["imgsz"] = _seq(kv["imgsz"], int)
        for k, cast in (("batch", int), ("iters", int), ("nc", int)):
            if k in kv:
                kw[k] = cast(kv[k])
        if "dtype" in kv:
            kw["dtypes"] = _seq(kv["dtype"], str)
        print_table(benchmark(**kw))
        return 0
    if task != "classify":
        # classify routes through its reference-compatible argparse CLI with
        # its own flag vocabulary (exp_dir, batch_size, ...)
        from quan_ultralytics_tpu.cfg import validate_overrides

        try:
            validate_overrides(kv)
        except (KeyError, ValueError) as e:
            raise SystemExit(f"config error: {e.args[0]}")

    if task == "classify":
        # classification runs through its reference-compatible CLI; yolo-style
        # k=v keys are translated (reference cfg/__init__.py routes classify
        # through the same MODES but a different trainer — same idea here):
        #   data=cifar10|cifar100|svhn|synthetic -> --dataset NAME
        #   data=<folder>                        -> --dataset imagenet --data_dir <folder>
        #   batch -> --batch_size, lr0 -> --lr
        from quan_ultralytics_tpu.classification.cli import main as cls_main

        if mode != "train":
            raise SystemExit("classify supports mode=train (val runs every epoch)")
        rename = {"batch": "batch_size", "lr0": "lr"}
        flags = []
        for k, v in kv.items():
            if k == "data":
                from pathlib import Path as _P

                if str(v) in ("cifar10", "cifar100", "svhn", "imagenet", "synthetic"):
                    flags += ["--dataset", str(v)]
                elif _P(str(v)).is_dir():
                    flags += ["--dataset", "imagenet", "--data_dir", str(v)]
                else:
                    raise SystemExit(f"classify data must be a known dataset or folder, got {v!r}")
                continue
            k = rename.get(k, k)
            if v is True:
                flags += [f"--{k}"]
            else:
                flags += [f"--{k}", str(v)]
        return cls_main(flags)

    from quan_ultralytics_tpu.engine.model import YOLO

    model_arg = kv.pop("model", DEFAULT_MODELS.get(task, "yolo11n-quan.yaml"))
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
        # reference predictor per-image verbose line + save/save_txt flags
        # (engine/predictor.py:222-306, results.py save_txt/plot)
        from pathlib import Path

        source = kv.pop("source")
        save = kv.pop("save", False)
        save_txt = kv.pop("save_txt", False)
        save_conf = kv.pop("save_conf", False)
        save_dir = Path(kv.pop("save_dir", "runs/predict"))
        results = model.predict(source, **kv)
        for i, r in enumerate(results):
            print(f"image {i + 1}/{len(results)} {r.orig_shape[1]}x{r.orig_shape[0]} "
                  f"{r.verbose()}")
            if save:
                save_dir.mkdir(parents=True, exist_ok=True)
                r.plot(filename=str(save_dir / f"im{i}.jpg"))
            if save_txt:
                (save_dir / "labels").mkdir(parents=True, exist_ok=True)
                r.save_txt(save_dir / "labels" / f"im{i}.txt", save_conf=save_conf)
    elif mode == "export":
        # reference cfg/__init__.py MODES 'export' -> Model.export (:851)
        path = model.export(**kv)
        print(f"exported: {path}")
    elif mode == "track":
        # reference 'track' mode (Model.track): video/dir source -> per-frame
        # associations via ByteTrack/BoT-SORT
        if "source" not in kv:
            raise SystemExit("yolo track requires source=<video-or-dir>")
        from quan_ultralytics_tpu.data.loaders import load_source

        source = kv.pop("source")
        tracks = model.track(load_source(source), **kv)
        for fi, t in enumerate(tracks):
            print(f"frame {fi}: {len(t)} tracks")
    elif mode == "tune":
        if "data" not in kv:
            raise SystemExit("yolo tune requires data=<dataset.yaml>")
        data = kv.pop("data")
        best = model.tune(data, **kv)
        print(best)
    return 0


if __name__ == "__main__":
    main()
