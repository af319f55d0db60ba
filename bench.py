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

Timing methodology: this environment reaches the chip through a relay with
~30ms dispatch latency, and block_until_ready does not synchronize with
remote execution — so the benchmark runs ITERS forwards inside ONE jitted
fori_loop (carry-dependent input defeats loop-invariant hoisting) and
fetches a scalar, then divides.
"""

import json
import time

import numpy as np

A100_PROXY_IMG_S = 400.0
TARGET = 2 * A100_PROXY_IMG_S


def _measure():
    import os

    # best measured config (see CLAUDE.md round-3 A/Bs @1024 b128):
    #   auto conv impl (folded narrow / grouped wide), fold threshold 32,
    #   deep phase-packed stem level 1 (layers 0-3; levels 2/3 measured
    #   slower: 934 / 889 / 868 img/s), layer-0 as the direct fine-grid
    #   packed conv (968.3 vs 934.0 img/s), fused Pallas attention
    os.environ.setdefault("QUAN_QCONV_IMPL", "auto")
    os.environ.setdefault("QUAN_STEM_DEEP", "1")
    os.environ.setdefault("QUAN_STEM_L0", "fine")
    os.environ.setdefault("QUAN_FUSED_ATTN", "1")

    import jax
    import jax.numpy as jnp

    from quan_ultralytics_tpu.models.tasks import DetectionModel
    from quan_ultralytics_tpu.ops.boxes import non_max_suppression

    imgsz = 1024
    batch = 128  # b128 fits once fused attention stops materializing the
    # [B,4,8,1024,1024] score tensor (round-2 OOM'd at 128): measured
    # b96 678 / b104 716 / b112 739.5 / b128 812.2 img/s (round-3 session)
    iters = 10
    # QUAN_BENCH_INPUT=u8: feed device-resident uint8 frames and normalize
    # in-pipeline (predictor semantics, matching the reference's GPU-side
    # /255 of uint8 batches — predictor.py:82). The f32 [128,1024,1024,3]
    # input is 1.5 GB and the normalize+RGB-mapping chain reads it 2-3x;
    # u8 cuts that HBM traffic 4x. A/B'd by scripts/tpu_r3_session.py u8in.
    input_u8 = os.environ.get("QUAN_BENCH_INPUT", "f32") == "u8"
    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), imgsz=64)
    # generate the input ON DEVICE: a [96,1024,1024,3] f32 host transfer is
    # 1.2 GB through the TCP relay and can dominate (or wedge) the session
    shape = (batch, imgsz, imgsz, 3)
    if input_u8:
        img = jax.jit(lambda k: jax.random.randint(k, shape, 0, 256, jnp.uint8))(
            jax.random.PRNGKey(1))
    else:
        img = jax.jit(lambda k: jax.random.uniform(k, shape, jnp.float32))(
            jax.random.PRNGKey(1))
    jax.block_until_ready(img)

    @jax.jit
    def run(variables, img):
        def body(i, acc):
            if input_u8:
                x = (img + (acc * 1e-12).astype(jnp.uint8)).astype(jnp.float32) / 255.0
            else:
                x = img + acc * 1e-12
            out = model.module.apply(variables, x, train=False)
            pred = model.decode(out)
            det, ok = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                          max_det=300, nc=model.nc, rotated=True)
            # carry the FULL reduction: a slice-only carry would let a smarter
            # XLA slice-through-conv pass silently DCE 95/96 batch items
            return det.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(run(variables, img))  # compile + warmup (real execution)
    t0 = time.perf_counter()
    float(run(variables, img))  # host-synced by the scalar fetch
    dt = (time.perf_counter() - t0) / iters
    img_per_s = batch / dt

    return img_per_s


def main():
    # The remote-compile helper pool intermittently 500s and the tunnel can
    # wedge after process churn (CLAUDE.md); one bounded retry in a FRESH
    # process protects the round-end measurement from a transient failure.
    import os
    import subprocess
    import sys

    if os.environ.get("QUAN_BENCH_CHILD") == "1":
        img_per_s = _measure()
    else:
        try:
            img_per_s = _measure()
        except Exception as e:
            # escalating backoff: the tunnel wedges for a while after process
            # churn, so spaced fresh-process attempts beat one quick retry
            retries = int(os.environ.get("QUAN_BENCH_RETRIES", "3"))
            delays = ([60, 300, 600] + [900] * max(0, retries - 3))[:retries]
            print(f"bench attempt 1 failed ({e!r}); {len(delays)} fresh-"
                  f"process retries with backoff {delays}", file=sys.stderr)
            env = dict(os.environ, QUAN_BENCH_CHILD="1")
            last = None
            for d in delays:
                time.sleep(d)
                try:
                    out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                         env=env, capture_output=True, text=True,
                                         timeout=1800)
                except subprocess.TimeoutExpired:
                    # a wedged tunnel manifests as a hang, not a fast error —
                    # keep walking the backoff schedule
                    last = "child timed out after 1800s"
                    print(f"retry failed ({last})", file=sys.stderr)
                    continue
                line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
                if out.returncode == 0 and line.startswith("{"):
                    print(line)
                    return
                last = out.stderr[-2000:]
                print(f"retry failed (rc={out.returncode})", file=sys.stderr)
            if last:
                print(last, file=sys.stderr)
            raise
    print(json.dumps({
        "metric": "quan_yolo11n_obb_infer_imgs_per_sec_at_1024",
        "value": round(img_per_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
