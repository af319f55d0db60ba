"""Profile ONE train step and rank its data-formatting / copy ops.

Usage: python scripts/tpu_profile_train_copies.py [B] [imgsz]

Targets the round-4 lead: trainprof24 showed 46.7 ms/step of data formatting
attributed to "many 1-3 ms layout-flip copies around the packed stem
fwd+bwd". This prints per-op times with HLO long_names (shapes + layouts)
so the flips can be attributed to exact tensor boundaries before any
redesign. Same trace/parse machinery as tpu_profile_copies.py (inference).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_profile_copies import parse_trace, tunnel_probe  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    imgsz = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    os.environ.setdefault("QUAN_QCONV_IMPL", "auto")
    os.environ.setdefault("QUAN_STEM_DEEP", "1")
    os.environ.setdefault("QUAN_FUSED_ATTN", "1")
    tunnel_probe()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
    from quan_ultralytics_tpu.models.tasks import DetectionModel

    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15,
                                     dtype=jnp.bfloat16)
    cfg = TrainConfig(epochs=10, batch=B, imgsz=imgsz, nbs=B)
    trainer = Trainer(model, cfg, steps_per_epoch=100)
    state = trainer.init_state()
    step_fn = trainer.make_train_step()
    M = 64
    rnd = np.random.RandomState(0)
    batch = {
        "img": jax.jit(lambda k: jax.random.uniform(
            k, (B, imgsz, imgsz, 3), jnp.float32))(jax.random.PRNGKey(2)),
        "bboxes": jnp.asarray(rnd.rand(B, M, 5).astype(np.float32) * 0.3 + 0.1),
        "cls": jnp.zeros((B, M), jnp.int32),
        "mask": jnp.ones((B, M), bool),
    }
    t0 = time.perf_counter()
    state, loss, aux = step_fn(state, batch)
    float(loss)
    print(json.dumps({"compile_warm_s": round(time.perf_counter() - t0, 1)}),
          flush=True)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, aux = step_fn(state, batch)
    float(loss)
    per = (time.perf_counter() - t0) / iters
    print(json.dumps({"img_s": round(B / per, 1),
                      "ms_step": round(per * 1e3, 1)}), flush=True)

    logdir = "/tmp/qtrace_train"
    jax.profiler.start_trace(logdir)
    for _ in range(2):
        state, loss, aux = step_fn(state, batch)
    float(loss)
    jax.profiler.stop_trace()

    by_cat, by_op = parse_trace(logdir)
    n_steps = 2
    cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
    print(json.dumps({"per_step_ms_by_category":
                      {k: round(v / n_steps, 2) for k, v in cats}}), flush=True)
    # all ops, but surface copies/transposes/formatting first, then the rest
    fmt = [(n, r) for n, r in by_op.items()
           if any(s in n for s in ("copy", "transpose", "bitcast", "reshape"))]
    rest = [(n, r) for n, r in by_op.items() if (n, r) not in fmt]
    for title, rows in (("formatting", fmt), ("other", rest)):
        top = sorted(rows, key=lambda kv: -kv[1][0])[:25]
        for name, (ms, n, long_name) in top:
            print(json.dumps({"kind": title, "op": name,
                              "ms_step": round(ms / n_steps, 3), "count": n,
                              "long_name": long_name}), flush=True)


if __name__ == "__main__":
    main()
