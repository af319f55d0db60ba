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

    imgsz = int(os.environ.get("QUAN_BENCH_IMGSZ", "1024"))
    batch = int(os.environ.get("QUAN_BENCH_BATCH", "128"))
    # b128 fits once fused attention stops materializing the
    # [B,4,8,1024,1024] score tensor (round-2 OOM'd at 128). Knee confirmed
    # at 128: b144/160/192 = 526/561/651 img/s (HBM spill cliff); with the
    # round-3 micro-opts + l0=fine the b128 headline measured 968.3 img/s
    iters = int(os.environ.get("QUAN_BENCH_ITERS", "10"))
    # uint8 device-resident frames, normalized in-pipeline (predictor
    # semantics, matching the reference's GPU-side /255 of uint8 batches —
    # predictor.py:82): the f32 [128,1024,1024,3] input is 1.5 GB and the
    # normalize+RGB-mapping chain reads it 2-3x; u8 cuts that traffic 4x.
    # Round-4 A/B at the winning config: u8 985.1 vs f32 970.4 img/s
    # (scripts/r4_results.jsonl combo2) — u8 is the default.
    input_u8 = os.environ.get("QUAN_BENCH_INPUT", "u8") == "u8"
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


# tiny timed matmul: proves the tunnel dispatches + the compile helper works
# before we sink a ~60s model compile into a wedged session
_PROBE = ("import jax, jax.numpy as jnp;"
          "x = jnp.ones((1024, 1024), jnp.bfloat16);"
          "print(float(jax.jit(lambda a: (a @ a).sum())(x)))")


def _emit(img_per_s):
    print(json.dumps({
        "metric": "quan_yolo11n_obb_infer_imgs_per_sec_at_1024",
        "value": round(img_per_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / TARGET, 3),
    }), flush=True)


def main():
    """Driver-proof orchestration (round-3 postmortem, VERDICT r3 #2).

    Round 3's official bench was rc=124/null: the FIRST attempt ran
    in-process with no timeout, and a wedged tunnel (CLAUDE.md: wedges ~1h
    after process churn) hangs forever — the driver killed the whole run
    before any retry fired. Rules now:
      * EVERY touch of the TPU — probe or measurement — runs in a child
        process with a hard timeout (a wedged tunnel = hang, not error);
      * a ~3-min health probe (tiny timed matmul) gates each measurement
        attempt so a wedged session costs minutes, not a model compile;
      * total wall time is capped (QUAN_BENCH_BUDGET_S, default 1500s) so
        the driver's own limit is never the thing that fires first.
    """
    import os
    import subprocess
    import sys

    if os.environ.get("QUAN_BENCH_CHILD") == "1":
        _emit(_measure())
        return

    budget = float(os.environ.get("QUAN_BENCH_BUDGET_S", "1500"))
    deadline = time.monotonic() + budget
    env = dict(os.environ, QUAN_BENCH_CHILD="1")

    def child(args, timeout):
        try:
            return subprocess.run(args, env=env, capture_output=True,
                                  text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            return None

    attempt, probe_failures = 0, 0
    while deadline - time.monotonic() > 150:
        attempt += 1
        # 1) health probe: first matmul compile through the relay takes
        # 2-110s when healthy (r3 session spread), so 180s separates
        # "healthy" from "wedged" cleanly
        p = child([sys.executable, "-c", _PROBE],
                  min(180.0, deadline - time.monotonic() - 10))
        if p is None or p.returncode != 0:
            probe_failures += 1
            why = "hang" if p is None else (p.stderr or "")[-300:]
            print(f"probe {attempt} failed ({why}); waiting", file=sys.stderr)
            time.sleep(min(90.0, max(0.0, deadline - time.monotonic() - 150)))
            continue
        # 2) measurement, bounded by what's left of the budget
        out = child([sys.executable, os.path.abspath(__file__)],
                    min(900.0, deadline - time.monotonic() - 5))
        line = ""
        if out is not None and out.returncode == 0 and out.stdout.strip():
            line = out.stdout.strip().splitlines()[-1]
        if line.startswith("{"):
            print(line)
            return
        why = "hang" if out is None else f"rc={out.returncode} " + (out.stderr or "")[-500:]
        print(f"measurement {attempt} failed ({why})", file=sys.stderr)
        time.sleep(min(60.0, max(0.0, deadline - time.monotonic() - 150)))
    print(f"bench: no measurement landed within {budget:.0f}s "
          f"({attempt} attempts, {probe_failures} probe failures)", file=sys.stderr)
    # Last-known-good fallback (VERDICT r4 weak #7): a wedged tunnel must
    # not erase the round's headline — emit the most recent recorded bench
    # with an EXPLICIT stale marker instead of nothing.
    import glob
    import re

    best = None
    here = os.path.dirname(os.path.abspath(__file__))
    for f in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            d = json.load(open(f))
            d = d.get("parsed", d)  # driver wrapper stores the line under 'parsed'
            if isinstance(d.get("value"), (int, float)) and d["value"] > 0:
                m = re.search(r"BENCH_r(\d+)", f)
                best = (int(m.group(1)) if m else 0, d)
        except Exception:
            continue
    if best is not None:
        rnd, d = best
        print(json.dumps({**d, "stale": True,
                          "note": f"tunnel unavailable this run; value is the "
                                  f"round-{rnd} recorded measurement"}))
        return
    sys.exit(1)


if __name__ == "__main__":
    main()
