"""Benchmark: QUAN-YOLO11n-OBB inference throughput @1024 on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The driver target (BASELINE.json) is >= 2x A100 images/sec/chip for
QUAN-YOLO11n OBB inference at imgsz=1024. The reference repo publishes no
wall-clock numbers, so `vs_baseline` is computed against a documented proxy:
A100_PROXY_IMG_S = 400 img/s (fp16, batch inference, yolo11n-scale graph at
1024px — derived from public yolo11n@640 A100 numbers scaled by pixel
count); vs_baseline = value / (2 * A100_PROXY_IMG_S), i.e. >= 1.0 meets the
target.

Measures the full device pipeline: quaternion graph forward (bf16) + DFL
decode + rotated fast-NMS.
"""

import json
import time

import numpy as np

A100_PROXY_IMG_S = 400.0
TARGET = 2 * A100_PROXY_IMG_S


def main():
    import jax
    import jax.numpy as jnp

    from quan_ultralytics_tpu.models.tasks import DetectionModel
    from quan_ultralytics_tpu.ops.boxes import non_max_suppression

    imgsz = 1024
    batch = 16
    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)

    @jax.jit
    def infer(variables, img):
        out = model.module.apply(variables, img, train=False)
        pred = model.decode(out)
        return non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                   max_det=300, nc=model.nc, rotated=True)

    img = jnp.asarray(np.random.rand(batch, imgsz, imgsz, 3).astype(np.float32))
    # warmup + compile; materialize to host — on the axon tunnel,
    # block_until_ready alone does not synchronize with real execution.
    det, ok = infer(variables, img)
    float(np.asarray(det).sum())

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        det, ok = infer(variables, img)
        float(np.asarray(det[0, 0]).sum())  # per-iter host sync (tiny copy)
    dt = time.perf_counter() - t0
    img_per_s = batch * iters / dt

    print(json.dumps({
        "metric": "quan_yolo11n_obb_infer_imgs_per_sec_at_1024",
        "value": round(img_per_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
