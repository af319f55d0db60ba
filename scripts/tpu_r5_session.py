"""Round-5 consolidated TPU measurement session.

One long process (the tunnel degrades with process churn); every result is
appended to scripts/r5_results.jsonl immediately. Reuses the round-3/4
session helpers.

Usage: python scripts/tpu_r5_session.py [section ...]
Default order: health infercheck nmscheck stemremat topk_ab i8min trainbest
               inferprof128 trainprof24r
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import tpu_r3_session as r3
import tpu_r4_session as r4
from tpu_r3_session import (_train_step_ms, infer_pipeline_imgs, section,
                            timed_fori)

RESULTS = os.path.join(os.path.dirname(__file__), "r5_results.jsonl")


def emit(**kv):
    kv["t"] = round(time.time())
    line = json.dumps(kv)
    print(line, flush=True)
    with open(RESULTS, "a") as fh:
        fh.write(line + "\n")


r3.emit = emit
r4.emit = emit

BASE = {"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
        "QUAN_FUSED_ATTN": "1", "QUAN_STEM_L0": "fine"}


@section("health")
def s_health():
    r3.s_health()


@section("infercheck")
def s_infercheck():
    # Headline at HEAD: r4 captured 985.1 u8 b128 @1024; the deferred-argmax
    # NMS (round 5, ops/boxes.py) is now default — this IS the nms A/B
    # against that baseline.
    for b in (128,):
        try:
            ips, dt, cs = infer_pipeline_imgs(b, env=BASE, input_u8=True)
            emit(section="infercheck", cfg=f"r5-head+u8 b{b}", img_s=round(ips, 1),
                 ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="infercheck", cfg=f"r5-head+u8 b{b}", error=repr(e)[:250])


@section("nmscheck")
def s_nmscheck():
    # @640 headline recheck under the deferred-argmax NMS (r4: 1883.5 b128).
    for b in (128,):
        try:
            ips, dt, cs = infer_pipeline_imgs(
                b, imgsz=640, nc=80, yaml="yolo11n-quan.yaml", rotated=False,
                env=BASE, input_u8=True)
            emit(section="nmscheck", cfg=f"r5-head+u8 b{b} @640",
                 img_s=round(ips, 1), ms_iter=round(dt * 1e3, 1),
                 compile_s=round(cs, 1))
        except Exception as e:
            emit(section="nmscheck", cfg=f"b{b} @640", error=repr(e)[:250])


@section("nms_ab")
def s_nms_ab():
    # Deferred-argmax NMS vs the full-tensor argmax, same session/process
    # (infercheck 941.8 in a session where r4's 985.1 config needs its own
    # in-session baseline): both @1024 and @640 b128.
    for defer in ("1", "0"):
        env = {**BASE, "QUAN_NMS_DEFER_ARGMAX": defer}
        try:
            ips, dt, cs = infer_pipeline_imgs(128, env=env, input_u8=True)
            emit(section="nms_ab", cfg=f"defer={defer} b128 @1024",
                 img_s=round(ips, 1), ms_iter=round(dt * 1e3, 1),
                 compile_s=round(cs, 1))
        except Exception as e:
            emit(section="nms_ab", cfg=f"defer={defer} b128 @1024",
                 error=repr(e)[:250])
        try:
            ips, dt, cs = infer_pipeline_imgs(
                128, imgsz=640, nc=80, yaml="yolo11n-quan.yaml", rotated=False,
                env=env, input_u8=True)
            emit(section="nms_ab", cfg=f"defer={defer} b128 @640",
                 img_s=round(ips, 1), ms_iter=round(dt * 1e3, 1),
                 compile_s=round(cs, 1))
        except Exception as e:
            emit(section="nms_ab", cfg=f"defer={defer} b128 @640",
                 error=repr(e)[:250])


@section("stemremat")
def s_stemremat():
    # VERDICT r5 #4: the stem wgrad copy pair (fusion.2272 + copy.9443,
    # ~4.6 ms/step) — QUAN_STEM_REMAT=1 recomputes the RGB mapping in the
    # backward instead of storing+flipping it. A/B train b24 @1024.
    for remat_flag in ("1", "0"):
        try:
            ips, ms, cs = _train_step_ms(
                24, False, {**BASE, "QUAN_STEM_REMAT": remat_flag})
            emit(section="stemremat", cfg=f"stem_remat={remat_flag} b24",
                 img_s=round(ips, 1), ms_step=round(ms, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="stemremat", cfg=f"stem_remat={remat_flag} b24",
                 error=repr(e)[:250])


@section("topk_ab")
def s_topk_ab():
    r4.s_topk_ab()


@section("i8min")
def s_i8min():
    # VERDICT r5 #6 (one focused int8 attempt): mixed-precision serving —
    # int8 only on convs with c2 >= QUAN_INT8_MIN_C, narrow layers bf16.
    # r4: uniform static-int8 864 vs bf16 985. If no min_c wins, int8 gets
    # demoted to a documented negative result.
    import jax
    import jax.numpy as jnp

    env = dict(BASE)
    saved = {k: os.environ.get(k) for k in
             list(env) + ["QUAN_QCONV_IMPL", "QUAN_INT8_MIN_C"]}
    os.environ.update(env)
    try:
        from quan_ultralytics_tpu.models.tasks import DetectionModel
        from quan_ultralytics_tpu.ops.boxes import non_max_suppression
        from quan_ultralytics_tpu.ops.quant import calibrate_int8

        model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15,
                                         dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), imgsz=64)
        cal = [jax.jit(lambda k: jax.random.uniform(
            k, (8, 1024, 1024, 3), jnp.float32))(jax.random.PRNGKey(i))
            for i in (3, 4)]
        vq = calibrate_int8(model, variables, cal)

        shape = (128, 1024, 1024, 3)
        img = jax.jit(lambda k: jax.random.uniform(k, shape, jnp.float32))(
            jax.random.PRNGKey(1))
        jax.block_until_ready(img)

        def one(v, img, acc):
            x = img + acc * 1e-12
            out = model.module.apply(v, x, train=False)
            pred = model.decode(out)
            det, ok = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                          max_det=300, nc=15, rotated=True)
            return det.sum().astype(jnp.float32)

        for min_c in ("64", "128", "256", "0"):
            os.environ["QUAN_QCONV_IMPL"] = "int8"
            os.environ["QUAN_INT8_MIN_C"] = min_c
            try:
                dt, cs = timed_fori(one, args=(vq, img), iters=10)
                emit(section="i8min", cfg=f"int8 min_c={min_c} b128",
                     img_s=round(128 / dt, 1), ms_iter=round(dt * 1e3, 1),
                     compile_s=round(cs, 1))
            except Exception as e:
                emit(section="i8min", cfg=f"int8 min_c={min_c} b128",
                     error=repr(e)[:250])
        # bf16 baseline in the same session for a fair calib
        os.environ["QUAN_QCONV_IMPL"] = "auto"
        os.environ.pop("QUAN_INT8_MIN_C", None)
        try:
            dt, cs = timed_fori(one, args=(variables, img), iters=10)
            emit(section="i8min", cfg="bf16 auto b128",
                 img_s=round(128 / dt, 1), ms_iter=round(dt * 1e3, 1),
                 compile_s=round(cs, 1))
        except Exception as e:
            emit(section="i8min", cfg="bf16 auto b128", error=repr(e)[:250])
    finally:
        for k, vv in saved.items():
            if vv is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = vv


@section("trainbest")
def s_trainbest():
    # HEAD train throughput with whatever stemremat/topk verdicts say —
    # rerun b24/b32 at plain HEAD defaults for the round record.
    for Bt in (24, 32):
        try:
            ips, ms, cs = _train_step_ms(Bt, False, BASE)
            emit(section="trainbest", cfg=f"r5-head b{Bt}",
                 img_s=round(ips, 1), ms_step=round(ms, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="trainbest", cfg=f"r5-head b{Bt}", error=repr(e)[:250])


@section("traincombo")
def s_traincombo():
    # Combined winners attempt (run AFTER stemremat/topk_ab): stem remat +
    # iter top-k together at b24/b32.
    env = {**BASE, "QUAN_STEM_REMAT": "1", "QUAN_TOPK_IMPL": "iter"}
    for Bt in (24, 32):
        try:
            ips, ms, cs = _train_step_ms(Bt, False, env)
            emit(section="traincombo", cfg=f"remat+itertopk b{Bt}",
                 img_s=round(ips, 1), ms_step=round(ms, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="traincombo", cfg=f"remat+itertopk b{Bt}",
                 error=repr(e)[:250])


@section("inferprof128")
def s_inferprof128():
    # Fresh b128 inference profile at HEAD (deferred-argmax NMS in): name
    # the remaining loop-fusion ops (VERDICT r5 #7: NMS pred fusion 9.4,
    # RGB transpose pair 6.5, normalize 3.4 in the r3 profile128).
    import jax
    import jax.numpy as jnp

    saved = {k: os.environ.get(k) for k in BASE}
    os.environ.update(BASE)
    try:
        from quan_ultralytics_tpu.models.tasks import DetectionModel
        from quan_ultralytics_tpu.ops.boxes import non_max_suppression

        model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15,
                                         dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), imgsz=64)
        img = jax.jit(lambda k: jax.random.randint(
            k, (128, 1024, 1024, 3), 0, 256, jnp.uint8))(jax.random.PRNGKey(1))
        jax.block_until_ready(img)

        @jax.jit
        def run(v, img):
            x = (img.astype(jnp.float32) / 255.0)
            out = model.module.apply(v, x, train=False)
            pred = model.decode(out)
            det, ok = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                          max_det=300, nc=15, rotated=True)
            return det.sum().astype(jnp.float32)

        float(run(variables, img))  # compile+warm
        jax.profiler.start_trace("/tmp/qtrace_inferprof128")
        for _ in range(3):
            out = run(variables, img)
        float(out)
        jax.profiler.stop_trace()
        from tpu_profile_copies import parse_trace
        by_cat, by_op = parse_trace("/tmp/qtrace_inferprof128")
        cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
        emit(section="inferprof128",
             per_iter_ms_by_category={k: round(v / 3, 2) for k, v in cats})
        for name, (ms, n, long_name) in sorted(
                by_op.items(), key=lambda kv: -kv[1][0])[:24]:
            emit(section="inferprof128", op=name, ms_iter=round(ms / 3, 3),
                 count=n, long_name=long_name[:300])
    finally:
        for k, vv in saved.items():
            if vv is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = vv


@section("trainprof24r")
def s_trainprof24r():
    # Train profile at HEAD + stem remat: did the wgrad copy pair disappear?
    saved = os.environ.get("QUAN_STEM_REMAT")
    os.environ["QUAN_STEM_REMAT"] = "1"
    try:
        r4.s_trainprof24f(tag="trainprof24r")
    finally:
        if saved is None:
            os.environ.pop("QUAN_STEM_REMAT", None)
        else:
            os.environ["QUAN_STEM_REMAT"] = saved


def main():
    import subprocess

    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(RESULTS)).stdout.strip()
        dirty = bool(subprocess.run(["git", "diff", "--quiet"],
                                    cwd=os.path.dirname(RESULTS)).returncode)
        emit(session_rev=rev + ("+dirty" if dirty else ""))
    except Exception:
        pass
    local = {f._section: f for f in [s_health, s_infercheck, s_nmscheck,
                                     s_nms_ab, s_stemremat, s_topk_ab,
                                     s_i8min, s_trainbest, s_traincombo,
                                     s_inferprof128, s_trainprof24r]}
    names = sys.argv[1:] or ["health", "infercheck", "nmscheck", "stemremat",
                             "topk_ab", "i8min", "trainbest", "inferprof128",
                             "trainprof24r"]
    for n in names:
        t0 = time.perf_counter()
        try:
            if n in local:
                local[n]()
            else:
                fns = {f._section: f for mod in (r4, r3)
                       for f in vars(mod).values()
                       if callable(f) and hasattr(f, "_section")}
                fns[n]()
        except Exception as e:
            emit(section=n, error=repr(e)[:300])
        emit(section=n, done_s=round(time.perf_counter() - t0, 1))


if __name__ == "__main__":
    main()
