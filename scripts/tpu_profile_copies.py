"""TPU profile session: find where the non-conv time goes at 1024px.

Round-1 finding (CLAUDE.md): conv fusions ~19ms/iter, data-formatting copies
~16ms, loop fusions ~15ms @1024 b16. This script re-traces the current code
and prints (a) per-hlo_category totals, (b) the top self-time ops with their
HLO long_name (shapes + layouts) so the relayout copies can be attributed to
specific graph edges.

Run ON THE TUNNEL (ambient JAX_PLATFORMS=axon), one long process:
    timeout 3600 python scripts/tpu_profile_copies.py [batch] [imgsz]
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def tunnel_probe():
    import jax
    import jax.numpy as jnp

    a = jnp.ones((1024, 1024), jnp.bfloat16)
    t0 = time.perf_counter()
    float((a @ a)[0, 0])
    print(json.dumps({"probe_s": round(time.perf_counter() - t0, 2),
                      "devices": [str(d) for d in jax.devices()]}), flush=True)


def parse_trace(logdir):
    files = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    assert files, f"no trace under {logdir}"
    with gzip.open(files[-1], "rt") as fh:
        data = json.load(fh)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and isinstance(e.get("args"), dict)
              and "hlo_category" in e["args"]]
    by_cat = defaultdict(float)
    by_op = defaultdict(lambda: [0.0, 0, ""])
    for e in events:
        cat = e["args"]["hlo_category"]
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_cat[cat] += dur
        name = e.get("name", "?")
        rec = by_op[name]
        rec[0] += dur
        rec[1] += 1
        rec[2] = e["args"].get("long_name", "")[:700]
    return by_cat, by_op


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    imgsz = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    iters = 6
    tunnel_probe()

    import jax
    import jax.numpy as jnp

    from quan_ultralytics_tpu.models.tasks import DetectionModel
    from quan_ultralytics_tpu.ops.boxes import non_max_suppression

    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15, dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), imgsz=64)
    # device-generated input + explicit jit args: closed-over arrays embed as
    # HLO constants and blow the remote-compile request size limit (HTTP 413)
    img = jax.jit(lambda k: jax.random.uniform(k, (B, imgsz, imgsz, 3), jnp.float32))(
        jax.random.PRNGKey(1))
    jax.block_until_ready(img)

    @jax.jit
    def run(v, img):
        def body(i, acc):
            pred = model.decode(model.module.apply(v, img + acc * 1e-12, train=False))
            det, ok = non_max_suppression(pred, nc=15, rotated=True)
            return det[0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(run(v, img))
    print(json.dumps({"compile_warm_s": round(time.perf_counter() - t0, 1)}), flush=True)
    t0 = time.perf_counter()
    float(run(v, img))
    per_iter = (time.perf_counter() - t0) / iters
    print(json.dumps({"img_s": round(B / per_iter, 1), "ms_iter": round(per_iter * 1e3, 2)}),
          flush=True)

    logdir = "/tmp/qtrace"
    jax.profiler.start_trace(logdir)
    float(run(v, img))
    jax.profiler.stop_trace()

    by_cat, by_op = parse_trace(logdir)
    cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
    print(json.dumps({"per_iter_ms_by_category":
                      {k: round(vms / iters, 2) for k, vms in cats}}), flush=True)
    top = sorted(by_op.items(), key=lambda kv: -kv[1][0])[:30]
    for name, (ms, n, long_name) in top:
        print(json.dumps({"op": name, "ms_iter": round(ms / iters, 3), "count": n,
                          "long_name": long_name}), flush=True)


if __name__ == "__main__":
    main()
