"""Round-4 consolidated TPU measurement session.

One long process (the tunnel degrades with process churn); every result is
appended to scripts/r4_results.jsonl immediately. Reuses the round-3 session
helpers (timed_fori / infer_pipeline_imgs / _train_step_ms).

Usage: python scripts/tpu_r4_session.py [section ...]
Default: health combo2 d640train segposetrain
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import tpu_r3_session as r3
from tpu_r3_session import (_task_train_step_ms, _train_step_ms,
                            infer_pipeline_imgs, section, timed_fori)

RESULTS = os.path.join(os.path.dirname(__file__), "r4_results.jsonl")


def emit(**kv):
    kv["t"] = round(time.time())
    line = json.dumps(kv)
    print(line, flush=True)
    with open(RESULTS, "a") as fh:
        fh.write(line + "\n")


r3.emit = emit  # route the shared helpers' output to r4_results.jsonl

BASE = {"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
        "QUAN_FUSED_ATTN": "1", "QUAN_STEM_L0": "fine"}


@section("health")
def s_health():
    r3.s_health()


@section("combo2")
def s_combo2():
    # VERDICT r4 #7: deep1+l0fine+u8 — the likely true headline (l0fine alone
    # 968.3; the measured combo only tried deep2 which regresses). A/B u8
    # input at the same config.
    for name, u8 in (("deep1+l0fine+u8", True), ("deep1+l0fine+f32", False)):
        try:
            ips, dt, cs = infer_pipeline_imgs(128, env=BASE, input_u8=u8)
            emit(section="combo2", cfg=f"{name} b128", img_s=round(ips, 1),
                 ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="combo2", cfg=f"{name} b128", error=repr(e)[:250])


@section("d640train")
def s_d640train():
    # BASELINE config #4 shape (COCO detect train @640, reference bs128) —
    # unblocked by the trainer init probe fix (round-4, engine/trainer.py).
    for Bt, remat in ((64, False), (128, False), (128, True)):
        try:
            ips, ms, cs = _task_train_step_ms("yolo11n-quan.yaml", None, Bt,
                                              640, BASE, remat=remat)
            emit(section="d640train", cfg=f"detect b{Bt} @640 remat={remat}",
                 img_s=round(ips, 1), ms_step=round(ms, 1),
                 compile_s=round(cs, 1))
        except Exception as e:
            emit(section="d640train", cfg=f"detect b{Bt} @640 remat={remat}",
                 error=repr(e)[:250])


@section("segposetrain")
def s_segposetrain():
    # seg/pose train @640 — also unblocked by the init probe fix.
    for yaml, extra, nc, Bt in (("yolo11n-seg-quan.yaml", "masks", 80, 64),
                                ("yolo11n-pose-quan.yaml", "keypoints", 1, 64)):
        try:
            ips, ms, cs = _task_train_step_ms(yaml, extra, Bt, 640, BASE, nc=nc)
            emit(section="segposetrain", cfg=f"{extra} train b{Bt} @640",
                 img_s=round(ips, 1), ms_step=round(ms, 1),
                 compile_s=round(cs, 1))
        except Exception as e:
            emit(section="segposetrain", cfg=f"{extra} train b{Bt} @640",
                 error=repr(e)[:250])


@section("trainbest")
def s_trainbest():
    # train batch scan at the round-4 defaults (deep1+l0fine+fusedattn +
    # bf16 assigner, now trainer-default). r3 references: b24 135.8-139.9.
    for Bt in (24, 16, 32):
        try:
            ips, ms, cs = _train_step_ms(Bt, False, BASE)
            emit(section="trainbest", cfg=f"r4-default b{Bt}",
                 img_s=round(ips, 1), ms_step=round(ms, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="trainbest", cfg=f"r4-default b{Bt}", error=repr(e)[:250])


@section("trainfold")
def s_trainfold():
    # trainprof24f: the data-formatting bucket is many ~1.2 ms layout flips
    # at the 128-grid around C=24/32 1x1 convs — suspicion: folded/grouped
    # boundary (fold_max=32 puts the boundary exactly there). A/B the
    # threshold on the TRAIN step (inference A/B said 32 > 16 > 64).
    for fm in ("16", "64", "128"):
        try:
            ips, ms, cs = _train_step_ms(24, False,
                                         {**BASE, "QUAN_QCONV_FOLD_MAX": fm})
            emit(section="trainfold", cfg=f"fold_max={fm} b24",
                 img_s=round(ips, 1), ms_step=round(ms, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="trainfold", cfg=f"fold_max={fm} b24",
                 error=repr(e)[:250])


@section("d640f")
def s_d640f():
    # COCO detect @640 under the full r4 config (l0fine unmeasured at 640;
    # the fused-attn gate auto-falls-back to XLA attention at N=400).
    for b in (128, 64):
        try:
            ips, dt, cs = infer_pipeline_imgs(
                b, imgsz=640, nc=80, yaml="yolo11n-quan.yaml", rotated=False,
                env=BASE, input_u8=True)
            emit(section="d640f", cfg=f"r4-default+u8 b{b} @640",
                 img_s=round(ips, 1), ms_iter=round(dt * 1e3, 1),
                 compile_s=round(cs, 1))
        except Exception as e:
            emit(section="d640f", cfg=f"r4-default+u8 b{b} @640",
                 error=repr(e)[:200])


@section("i8c")
def s_i8c():
    # VERDICT r4 #6: static calibrated activation scales (ops/quant.py) vs
    # the dynamic-scale int8 (767.7 r3) vs bf16 auto (917.1 r3) at the
    # b128 headline config. Calibration happens once on 2 device batches.
    import jax
    import jax.numpy as jnp

    env = dict(BASE)
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        from quan_ultralytics_tpu.models.tasks import DetectionModel
        from quan_ultralytics_tpu.ops.boxes import non_max_suppression
        from quan_ultralytics_tpu.ops.quant import calibrate_int8

        model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15,
                                         dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), imgsz=64)
        # calibrate on-device batches (small, 2x b8) — collection transfers
        # back are scalars
        cal = [jax.jit(lambda k: jax.random.uniform(
            k, (8, 1024, 1024, 3), jnp.float32))(jax.random.PRNGKey(i))
            for i in (3, 4)]
        t0 = time.perf_counter()
        vq = calibrate_int8(model, variables, cal)
        emit(section="i8c", calib_s=round(time.perf_counter() - t0, 1),
             n_scales=len(jax.tree_util.tree_leaves(vq["quant"])))

        os.environ["QUAN_QCONV_IMPL"] = "int8"
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

        for name, v in (("int8-static", vq), ("int8-dynamic", variables)):
            try:
                dt, cs = timed_fori(one, args=(v, img), iters=10)
                emit(section="i8c", cfg=f"{name} b128", img_s=round(128 / dt, 1),
                     ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))
            except Exception as e:
                emit(section="i8c", cfg=f"{name} b128", error=repr(e)[:250])
    finally:
        for k, vv in saved.items():
            if vv is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = vv


@section("infercheck")
def s_infercheck():
    # Headline sanity at HEAD defaults (expect ~985 img/s u8 b128 @1024).
    try:
        ips, dt, cs = infer_pipeline_imgs(128, env=BASE, input_u8=True)
        emit(section="infercheck", cfg="r4-default+u8 b128", img_s=round(ips, 1),
             ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))
    except Exception as e:
        emit(section="infercheck", cfg="r4-default+u8 b128", error=repr(e)[:250])


@section("trainbatch2")
def s_trainbatch2():
    # The fold-all-in-train default (d8a1d34) cut ~17 ms/step of layout flips;
    # the batch knee may have moved. Rescan b32/b40/b48 no-remat.
    for Bt in (32, 40, 48):
        try:
            ips, ms, cs = _train_step_ms(Bt, False, BASE)
            emit(section="trainbatch2", cfg=f"foldall b{Bt}",
                 img_s=round(ips, 1), ms_step=round(ms, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="trainbatch2", cfg=f"foldall b{Bt}", error=repr(e)[:250])


@section("d640train2")
def s_d640train2():
    # detect train @640 re-measure under fold-all (pre-fix: b128 698.5).
    for Bt in (128, 64):
        try:
            ips, ms, cs = _task_train_step_ms("yolo11n-quan.yaml", None, Bt,
                                              640, BASE)
            emit(section="d640train2", cfg=f"detect b{Bt} @640 foldall",
                 img_s=round(ips, 1), ms_step=round(ms, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="d640train2", cfg=f"detect b{Bt} @640 foldall",
                 error=repr(e)[:250])


@section("assign_ab")
def s_assign_ab():
    # Sparse (scan + scatter) assigner vs the dense [B,M,A] chain (VERDICT
    # r4 #4): train b24/b32 @1024 A/B, identical otherwise.
    for impl in ("sparse", "dense"):
        for Bt in (24, 32):
            try:
                ips, ms, cs = _train_step_ms(
                    Bt, False, {**BASE, "QUAN_ASSIGNER_IMPL": impl})
                emit(section="assign_ab", cfg=f"assigner={impl} b{Bt}",
                     img_s=round(ips, 1), ms_step=round(ms, 1),
                     compile_s=round(cs, 1))
            except Exception as e:
                emit(section="assign_ab", cfg=f"assigner={impl} b{Bt}",
                     error=repr(e)[:250])


@section("assign640")
def s_assign640():
    # Sparse assigner at the COCO train shape: A=8400 but b128 makes the
    # dense [B,M,A] chain ~275 MB per intermediate.
    for impl in ("sparse", "dense"):
        for Bt in (128, 64):
            try:
                ips, ms, cs = _task_train_step_ms(
                    "yolo11n-quan.yaml", None, Bt, 640,
                    {**BASE, "QUAN_ASSIGNER_IMPL": impl})
                emit(section="assign640", cfg=f"assigner={impl} b{Bt} @640",
                     img_s=round(ips, 1), ms_step=round(ms, 1),
                     compile_s=round(cs, 1))
            except Exception as e:
                emit(section="assign640", cfg=f"assigner={impl} b{Bt} @640",
                     error=repr(e)[:250])


@section("topk_ab")
def s_topk_ab():
    # Iterative argmax top-k vs the chunked two-level sort (trainprof24i:
    # sort.2 6.6 ms + sort.3 2.0 ms). Bitwise-equal outputs; A/B train b24.
    for impl in ("iter", "chunk"):
        try:
            ips, ms, cs = _train_step_ms(
                24, False, {**BASE, "QUAN_TOPK_IMPL": impl})
            emit(section="topk_ab", cfg=f"topk={impl} b24",
                 img_s=round(ips, 1), ms_step=round(ms, 1),
                 compile_s=round(cs, 1))
        except Exception as e:
            emit(section="topk_ab", cfg=f"topk={impl} b24",
                 error=repr(e)[:250])


@section("d640batch")
def s_d640batch():
    # @640 inference knee: b128 measured 1883.5; the @1024 knee was at the
    # HBM spill. Per-image footprint at 640 is 2.56x smaller — scan up.
    for b in (192, 256):
        try:
            ips, dt, cs = infer_pipeline_imgs(
                b, imgsz=640, nc=80, yaml="yolo11n-quan.yaml", rotated=False,
                env=BASE, input_u8=True)
            emit(section="d640batch", cfg=f"r4-default+u8 b{b} @640",
                 img_s=round(ips, 1), ms_iter=round(dt * 1e3, 1),
                 compile_s=round(cs, 1))
        except Exception as e:
            emit(section="d640batch", cfg=f"r4-default+u8 b{b} @640",
                 error=repr(e)[:250])


@section("trainprof24f")
def s_trainprof24f(tag="trainprof24f"):
    # b24 no-remat train profile under the FULL winning config (incl.
    # l0=fine, which r3's trainprof24 predates): name the layout-flip copies
    # behind the 46.3 ms data-formatting bucket (VERDICT r4 #5).
    import numpy as np
    import jax
    import jax.numpy as jnp

    saved = {k: os.environ.get(k) for k in BASE}
    os.environ.update(BASE)
    try:
        from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
        from quan_ultralytics_tpu.models.tasks import DetectionModel

        Bt = 24
        model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15,
                                         dtype=jnp.bfloat16, remat=False)
        cfg = TrainConfig(epochs=10, batch=Bt, imgsz=1024, nbs=Bt)
        trainer = Trainer(model, cfg, steps_per_epoch=100)
        state = trainer.init_state()
        step_fn = trainer.make_train_step()
        M = 64
        batch = {
            "img": jax.jit(lambda k: jax.random.uniform(
                k, (Bt, 1024, 1024, 3), jnp.float32))(jax.random.PRNGKey(2)),
            "bboxes": jnp.asarray(np.random.rand(Bt, M, 5).astype(np.float32) * 0.3 + 0.1),
            "cls": jnp.zeros((Bt, M), jnp.int32),
            "mask": jnp.ones((Bt, M), bool),
        }
        state, loss, aux = step_fn(state, batch)
        float(loss)  # compile + warm
        jax.profiler.start_trace(f"/tmp/qtrace_{tag}")
        for _ in range(3):
            state, loss, aux = step_fn(state, batch)
        float(loss)
        jax.profiler.stop_trace()
        from tpu_profile_copies import parse_trace
        by_cat, by_op = parse_trace(f"/tmp/qtrace_{tag}")
        cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
        emit(section=tag,
             per_iter_ms_by_category={k: round(v / 3, 2) for k, v in cats})
        for name, (ms, n, long_name) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:24]:
            emit(section=tag, op=name, ms_iter=round(ms / 3, 3),
                 count=n, long_name=long_name[:300])
    finally:
        for k, vv in saved.items():
            if vv is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = vv


@section("trainprof24i")
def s_trainprof24i():
    # Fresh train profile at HEAD (fold-all-in-train default, d8a1d34):
    # which buckets remain after the layout flips went away?
    s_trainprof24f(tag="trainprof24i")


@section("trainprof24s")
def s_trainprof24s():
    # Train profile with the sparse assigner: how much of the loop-fusion
    # bucket does retiring the dense [B,M,A] chain recover?
    saved = os.environ.get("QUAN_ASSIGNER_IMPL")
    os.environ["QUAN_ASSIGNER_IMPL"] = "sparse"
    try:
        s_trainprof24f(tag="trainprof24s")
    finally:
        if saved is None:
            os.environ.pop("QUAN_ASSIGNER_IMPL", None)
        else:
            os.environ["QUAN_ASSIGNER_IMPL"] = saved


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
    secs = {f._section: f for f in [s_health, s_combo2, s_d640train,
                                    s_segposetrain, s_trainprof24f, s_i8c,
                                    s_trainbest, s_trainfold, s_d640f,
                                    s_infercheck, s_trainbatch2,
                                    s_d640train2, s_assign_ab,
                                    s_trainprof24i, s_assign640,
                                    s_trainprof24s, s_d640batch,
                                    s_topk_ab]}
    names = sys.argv[1:] or ["health", "combo2", "d640train", "segposetrain",
                             "trainprof24f"]
    for n in names:
        t0 = time.perf_counter()
        try:
            if n in secs:
                secs[n]()
            else:
                # fall through to any round-3 section by name
                fns = {f._section: f for f in vars(r3).values()
                       if callable(f) and hasattr(f, "_section")}
                fns[n]()
        except Exception as e:
            emit(section=n, error=repr(e)[:300])
        emit(section=n, done_s=round(time.perf_counter() - t0, 1))


if __name__ == "__main__":
    main()
