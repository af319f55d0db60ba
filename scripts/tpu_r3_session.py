"""Round-3 consolidated TPU measurement session.

One long process (the tunnel degrades with process churn). Sections run in
priority order, each wrapped so a failure doesn't kill the rest; every
result is appended to scripts/r3_results.jsonl IMMEDIATELY (a piped `tail`
loses everything when timeout kills the run).

Usage: python scripts/tpu_r3_session.py [section ...]
Sections: health base deep batch fold packedimpl train
Default: health base deep batch

Methodology (CLAUDE.md): K iterations inside ONE jitted fori_loop with a
carry-dependent input; sync by fetching a scalar. Inputs generated ON
DEVICE (host transfers ride the TCP relay).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # tpu_profile_copies
RESULTS = os.path.join(os.path.dirname(__file__), "r3_results.jsonl")


def emit(**kv):
    kv["t"] = round(time.time())
    line = json.dumps(kv)
    print(line, flush=True)
    with open(RESULTS, "a") as fh:
        fh.write(line + "\n")


def section(name):
    def deco(fn):
        fn._section = name
        return fn
    return deco


def timed_fori(fn_one, args=(), iters=10, warmups=1):
    """Time `iters` calls of fn_one(*args, acc) inside one jitted fori_loop.

    CRITICAL: `args` are passed as jit ARGUMENTS — closing over big concrete
    arrays embeds them as HLO constants and blows the remote-compile request
    size limit (CLAUDE.md remote-compile constraints; a [96,1024,1024,3] f32
    input is 1.2 GB)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(i, acc):
            return fn_one(*a, acc)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(run(*args))  # compile + warmup (real execution)
    compile_s = time.perf_counter() - t0
    for _ in range(warmups - 1):
        float(run(*args))
    t0 = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t0) / iters
    return dt, compile_s


def infer_pipeline_imgs(batch, imgsz=1024, iters=10, env=None, nc=15,
                        yaml="yolo11n-obb-quan.yaml", rotated=True,
                        input_u8=False):
    """Full pipeline img/s: forward + decode + NMS at given config.

    env: dict of QUAN_* overrides applied for model construction + trace.
    input_u8: feed device-resident uint8 frames and normalize in-pipeline
    (predictor semantics; the u8 HBM read is 4x smaller than f32).
    """
    import jax
    import jax.numpy as jnp

    saved = {}
    for k, v in (env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        from quan_ultralytics_tpu.models.tasks import DetectionModel
        from quan_ultralytics_tpu.ops.boxes import non_max_suppression

        model = DetectionModel.from_yaml(yaml, nc=nc, dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), imgsz=64)
        shape = (batch, imgsz, imgsz, 3)
        if input_u8:
            img = jax.jit(lambda k: jax.random.randint(k, shape, 0, 256, jnp.uint8))(
                jax.random.PRNGKey(1))
        else:
            img = jax.jit(lambda k: jax.random.uniform(k, shape, jnp.float32))(
                jax.random.PRNGKey(1))
        jax.block_until_ready(img)

        def one(variables, img, acc):
            if input_u8:
                x = img + (acc * 1e-12).astype(jnp.uint8)  # carry dep, runtime 0
                x = x.astype(jnp.float32) / 255.0          # predictor.py:82
            else:
                x = img + acc * 1e-12
            out = model.module.apply(variables, x, train=False)
            pred = model.decode(out)
            det, ok = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                          max_det=300, nc=nc, rotated=rotated)
            return det.sum().astype(jnp.float32)

        dt, compile_s = timed_fori(one, args=(variables, img), iters=iters)
        return batch / dt, dt, compile_s
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@section("health")
def s_health():
    import numpy as np
    import jax
    import jax.numpy as jnp

    emit(section="health", devices=[str(d) for d in jax.devices()])
    a = jnp.asarray(np.random.randn(1024, 1024).astype(np.float32))
    t0 = time.perf_counter()
    float((a @ a)[0, 0])
    emit(section="health", matmul1024_s=round(time.perf_counter() - t0, 1))
    N = 4096
    b = jnp.asarray(np.random.randn(N, N).astype(np.float32)).astype(jnp.bfloat16)
    c = jnp.asarray(np.random.randn(N, N).astype(np.float32)).astype(jnp.bfloat16)

    def mm(b, c, acc):
        return ((b + acc.astype(jnp.bfloat16) * 1e-12) @ c)[0, 0].astype(jnp.float32)

    dt, _ = timed_fori(mm, args=(b, c), iters=50)
    emit(section="health", matmul4096_tflops=round(2 * N ** 3 / dt / 1e12, 1))


@section("base")
def s_base():
    ips, dt, cs = infer_pipeline_imgs(96, env={"QUAN_QCONV_IMPL": "auto"})
    emit(section="base", cfg="auto+s2d b96", img_s=round(ips, 1),
         ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))


@section("deep")
def s_deep():
    ips, dt, cs = infer_pipeline_imgs(
        96, env={"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1"})
    emit(section="deep", cfg="auto+deep b96", img_s=round(ips, 1),
         ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))


@section("batch")
def s_batch():
    # under fused attention the [B,4,8,N,N] score tensor no longer lives in
    # HBM, so batches beyond 96 may newly fit
    for b in (128, 112, 104):
        try:
            ips, dt, cs = infer_pipeline_imgs(
                b, env={"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
                        "QUAN_FUSED_ATTN": "1"})
            emit(section="batch", cfg=f"auto+deep+attn b{b}", img_s=round(ips, 1),
                 ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))
        except Exception as e:  # OOM etc - keep going
            emit(section="batch", cfg=f"auto+deep+attn b{b}", error=repr(e)[:200])


@section("attn")
def s_attn():
    ips, dt, cs = infer_pipeline_imgs(
        96, env={"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
                 "QUAN_FUSED_ATTN": "1"})
    emit(section="attn", cfg="auto+deep+fusedattn b96", img_s=round(ips, 1),
         ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))


@section("fold")
def s_fold():
    for fm in ("16", "64"):
        ips, dt, cs = infer_pipeline_imgs(
            96, env={"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
                     "QUAN_QCONV_FOLD_MAX": fm})
        emit(section="fold", cfg=f"deep fold_max={fm} b96", img_s=round(ips, 1),
             ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))


@section("packedimpl")
def s_packedimpl():
    ips, dt, cs = infer_pipeline_imgs(
        96, env={"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
                 "QUAN_PACKED_IMPL": "grouped"})
    emit(section="packedimpl", cfg="deep packed=grouped b96", img_s=round(ips, 1),
         ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))


@section("bench128")
def s_bench128():
    # combined effect: deep + fused attn + NMS narrow-gather + one-transpose
    # RGB packing, at the new default batch
    ips, dt, cs = infer_pipeline_imgs(
        128, env={"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
                  "QUAN_FUSED_ATTN": "1"})
    emit(section="bench128", cfg="deep+attn+microopts b128", img_s=round(ips, 1),
         ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))


@section("train2")
def s_train2():
    import numpy as np
    import jax
    import jax.numpy as jnp

    os.environ["QUAN_QCONV_IMPL"] = "auto"
    os.environ["QUAN_STEM_DEEP"] = "1"
    from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
    from quan_ultralytics_tpu.models.tasks import DetectionModel

    for Bt, remat in ((16, False), (24, True), (12, False)):
        try:
            model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15,
                                             dtype=jnp.bfloat16, remat=remat)
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
            t0 = time.perf_counter()
            state, loss, aux = step_fn(state, batch)
            float(loss)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(5):
                state, loss, aux = step_fn(state, batch)
            float(loss)
            dt = (time.perf_counter() - t0) / 5
            emit(section="train2", cfg=f"deep=1 b{Bt} remat={remat}",
                 img_s=round(Bt / dt, 1), ms_step=round(dt * 1e3, 1),
                 compile_s=round(compile_s, 1))
        except Exception as e:
            emit(section="train2", cfg=f"deep=1 b{Bt} remat={remat}", error=repr(e)[:250])


def _train_step_ms(Bt, remat, env, iters=5):
    """Compile + time one train-step config; returns (img_s, ms_step, compile_s)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    saved = {}
    for k, v in (env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
        from quan_ultralytics_tpu.models.tasks import DetectionModel

        model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15,
                                         dtype=jnp.bfloat16, remat=remat)
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
        t0 = time.perf_counter()
        state, loss, aux = step_fn(state, batch)
        float(loss)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss, aux = step_fn(state, batch)
        float(loss)
        dt = (time.perf_counter() - t0) / iters
        return Bt / dt, dt * 1e3, compile_s
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@section("trainattn")
def s_trainattn():
    # flash backward (custom VJP, e0eebf0) on chip: does the fused attention
    # kernel help the train step, and does the freed HBM admit larger
    # no-remat batches?
    env = {"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
           "QUAN_FUSED_ATTN": "1", "QUAN_FUSED_ATTN_TRAIN": "1"}
    for Bt, remat in ((16, False), (8, False), (24, False), (32, False)):
        try:
            ips, ms, cs = _train_step_ms(Bt, remat, env)
            emit(section="trainattn", cfg=f"attn b{Bt} remat={remat}",
                 img_s=round(ips, 1), ms_step=round(ms, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="trainattn", cfg=f"attn b{Bt} remat={remat}",
                 error=repr(e)[:250])


@section("d640")
def s_d640():
    # COCO-style detect headline @640 under the round-3 opts (deep stem +
    # micro-opts; fused attention gates off at N=400). Round-2: 1102-1168.
    for b in (64, 128):
        try:
            ips, dt, cs = infer_pipeline_imgs(
                b, imgsz=640, nc=80, yaml="yolo11n-quan.yaml", rotated=False,
                env={"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
                     "QUAN_FUSED_ATTN": "1"})
            emit(section="d640", cfg=f"auto+deep b{b} @640", img_s=round(ips, 1),
                 ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="d640", cfg=f"auto+deep b{b} @640", error=repr(e)[:200])


@section("d640ab")
def s_d640ab():
    # is the padded fused attention (N=400->512) a win at 640, or is XLA's
    # materialized path fine at the smaller score tensor?
    for attn in ("1", "0"):
        for b in (64, 128):
            try:
                ips, dt, cs = infer_pipeline_imgs(
                    b, imgsz=640, nc=80, yaml="yolo11n-quan.yaml", rotated=False,
                    env={"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
                         "QUAN_FUSED_ATTN": attn})
                emit(section="d640ab", cfg=f"attn={attn} b{b} @640",
                     img_s=round(ips, 1), ms_iter=round(dt * 1e3, 1),
                     compile_s=round(cs, 1))
            except Exception as e:
                emit(section="d640ab", cfg=f"attn={attn} b{b} @640",
                     error=repr(e)[:200])


@section("batch3")
def s_batch3():
    # beyond 128: fused attention freed the score tensor; find the knee
    for b in (144, 160, 192):
        try:
            ips, dt, cs = infer_pipeline_imgs(
                b, env={"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
                        "QUAN_FUSED_ATTN": "1"})
            emit(section="batch3", cfg=f"auto+deep+attn b{b}", img_s=round(ips, 1),
                 ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="batch3", cfg=f"auto+deep+attn b{b}", error=repr(e)[:200])


def _profile_categories(run_fn, args, iters, tag, top_n=12):
    """Trace run_fn(*args), emit per-hlo_category ms/iter + top self-time ops."""
    import jax

    from tpu_profile_copies import parse_trace

    logdir = f"/tmp/qtrace_{tag}"
    jax.profiler.start_trace(logdir)
    float(run_fn(*args))
    jax.profiler.stop_trace()
    by_cat, by_op = parse_trace(logdir)
    cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
    emit(section=tag, per_iter_ms_by_category={k: round(v / iters, 2) for k, v in cats})
    for name, (ms, n, long_name) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:top_n]:
        emit(section=tag, op=name, ms_iter=round(ms / iters, 3), count=n,
             long_name=long_name[:300])


@section("profile128")
def s_profile128():
    import jax
    import jax.numpy as jnp

    env = {"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1", "QUAN_FUSED_ATTN": "1"}
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        from quan_ultralytics_tpu.models.tasks import DetectionModel
        from quan_ultralytics_tpu.ops.boxes import non_max_suppression

        B, imgsz, iters = 128, 1024, 6
        model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15, dtype=jnp.bfloat16)
        v = model.init(jax.random.PRNGKey(0), imgsz=64)
        img = jax.jit(lambda k: jax.random.uniform(k, (B, imgsz, imgsz, 3), jnp.float32))(
            jax.random.PRNGKey(1))
        jax.block_until_ready(img)

        @jax.jit
        def run(v, img):
            def body(i, acc):
                pred = model.decode(model.module.apply(v, img + acc * 1e-12, train=False))
                det, ok = non_max_suppression(pred, nc=15, rotated=True)
                return det.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        float(run(v, img))  # compile + warm
        _profile_categories(run, (v, img), iters, "profile128")
    finally:
        for k, vv in saved.items():
            if vv is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = vv


@section("trainprof24")
def s_trainprof24():
    # post-loss-fix profile at the measured-best train config (b24 no-remat,
    # fused attention fwd+bwd): what remains of the 184.8 ms/step?
    import numpy as np
    import jax
    import jax.numpy as jnp

    env = {"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
           "QUAN_FUSED_ATTN": "1"}
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
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
        jax.profiler.start_trace("/tmp/qtrace_trainprof24")
        for _ in range(3):
            state, loss, aux = step_fn(state, batch)
        float(loss)
        jax.profiler.stop_trace()
        from tpu_profile_copies import parse_trace
        by_cat, by_op = parse_trace("/tmp/qtrace_trainprof24")
        cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
        emit(section="trainprof24",
             per_iter_ms_by_category={k: round(v / 3, 2) for k, v in cats})
        for name, (ms, n, long_name) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:12]:
            emit(section="trainprof24", op=name, ms_iter=round(ms / 3, 3), count=n,
                 long_name=long_name[:300])
    finally:
        for k, vv in saved.items():
            if vv is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = vv


@section("trainprof16")
def s_trainprof16():
    # where does the b16 no-remat train step spend its 187 ms?
    import numpy as np
    import jax
    import jax.numpy as jnp

    env = {"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1"}
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
        from quan_ultralytics_tpu.models.tasks import DetectionModel

        Bt = 16
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

        def run_once(state, batch):
            s2, l2, _ = step_fn(state, batch)
            return l2

        import jax as _jax
        _jax.profiler.start_trace("/tmp/qtrace_trainprof16")
        for _ in range(3):
            state, loss, aux = step_fn(state, batch)
        float(loss)
        _jax.profiler.stop_trace()
        from tpu_profile_copies import parse_trace
        by_cat, by_op = parse_trace("/tmp/qtrace_trainprof16")
        cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
        emit(section="trainprof16",
             per_iter_ms_by_category={k: round(v / 3, 2) for k, v in cats})
        for name, (ms, n, long_name) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:12]:
            emit(section="trainprof16", op=name, ms_iter=round(ms / 3, 3), count=n,
                 long_name=long_name[:300])
    finally:
        for k, vv in saved.items():
            if vv is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = vv


@section("opt5")
def s_opt5():
    # attention fwd: exp2 + normalize-on-[N,dv] (no [N,N] normalize pass);
    # rotated NMS thresholded in the bd domain (no per-pair exp/sqrt).
    # Reference points (226-240 TFLOP/s calib): b128 903.2, b96 ~700.
    for b in (128, 96):
        try:
            ips, dt, cs = infer_pipeline_imgs(
                b, env={"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
                        "QUAN_FUSED_ATTN": "1"})
            emit(section="opt5", cfg=f"attnv2+nmsbd b{b}", img_s=round(ips, 1),
                 ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="opt5", cfg=f"attnv2+nmsbd b{b}", error=repr(e)[:200])


@section("l0fine")
def s_l0fine():
    # layer-0 A/B: QUAN_STEM_L0=fine (k5/s4 conv on the mapped fine grid,
    # ~2.6x fewer L0 FLOPs, no pack transpose — the 6.5 ms/iter
    # maximum_bitcast+copy pair at b128) vs the default r=4 pre-pack.
    base = {"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
            "QUAN_FUSED_ATTN": "1"}
    for name, env in (("fine", {**base, "QUAN_STEM_L0": "fine"}),
                      ("prepack", base)):
        try:
            ips, dt, cs = infer_pipeline_imgs(128, env=env)
            emit(section="l0fine", cfg=f"l0={name} b128", img_s=round(ips, 1),
                 ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="l0fine", cfg=f"l0={name} b128", error=repr(e)[:200])


@section("abf16")
def s_abf16():
    # bf16 assigner metric chain (QUAN_ASSIGNER_BF16=1): the dense [B,M,A]
    # metric/IoU tensors are the train step's largest HBM intermediates
    # (~132 MB each at b24); selection-only heuristic, no grads. A/B vs the
    # exact f32 default at the best train config.
    base = {"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
            "QUAN_FUSED_ATTN": "1"}
    for name, env in (("bf16", {**base, "QUAN_ASSIGNER_BF16": "1"}),
                      ("f32", base)):
        for Bt in (24,):
            try:
                ips, ms, cs = _train_step_ms(Bt, False, env)
                emit(section="abf16", cfg=f"assigner={name} b{Bt}",
                     img_s=round(ips, 1), ms_step=round(ms, 1),
                     compile_s=round(cs, 1))
            except Exception as e:
                emit(section="abf16", cfg=f"assigner={name} b{Bt}",
                     error=repr(e)[:250])


@section("i8")
def s_i8():
    # opt-in int8 PTQ conv path (ops/qconv.py qconv2d_int8): s8 MXU peak is
    # 2x bf16 on v5e and the conv bucket is ~41 ms of 140 at b128. A/B at
    # the headline config; serving-only (accuracy unvalidated in this env).
    base = {"QUAN_STEM_DEEP": "1", "QUAN_FUSED_ATTN": "1"}
    for name, env in (("int8", {**base, "QUAN_QCONV_IMPL": "int8"}),
                      ("auto", {**base, "QUAN_QCONV_IMPL": "auto"})):
        try:
            ips, dt, cs = infer_pipeline_imgs(128, env=env)
            emit(section="i8", cfg=f"impl={name} b128", img_s=round(ips, 1),
                 ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="i8", cfg=f"impl={name} b128", error=repr(e)[:200])


@section("l0train")
def s_l0train():
    # train-side A/B of QUAN_STEM_L0=fine: the input pack chain appears in
    # the b24 train profile as maximum_bitcast_fusion+copy (~5.3 ms/step).
    base = {"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
            "QUAN_FUSED_ATTN": "1"}
    for name, env in (("fine", {**base, "QUAN_STEM_L0": "fine"}),
                      ("prepack", base)):
        try:
            ips, ms, cs = _train_step_ms(24, False, env)
            emit(section="l0train", cfg=f"l0={name} b24 train",
                 img_s=round(ips, 1), ms_step=round(ms, 1),
                 compile_s=round(cs, 1))
        except Exception as e:
            emit(section="l0train", cfg=f"l0={name} b24 train",
                 error=repr(e)[:250])


@section("combo")
def s_combo():
    # candidate winning configuration if the individual A/Bs (deep2,
    # l0fine, u8in) each win: measure the combination so the headline
    # default is a measured point, not a sum of deltas.
    base = {"QUAN_QCONV_IMPL": "auto", "QUAN_FUSED_ATTN": "1",
            "QUAN_STEM_DEEP": "2", "QUAN_STEM_L0": "fine"}
    try:
        ips, dt, cs = infer_pipeline_imgs(128, env=base, input_u8=True)
        emit(section="combo", cfg="deep2+l0fine+u8 b128", img_s=round(ips, 1),
             ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))
    except Exception as e:
        emit(section="combo", cfg="deep2+l0fine+u8 b128", error=repr(e)[:200])
    try:
        ips, ms, cs = _train_step_ms(24, False, base)
        emit(section="combo", cfg="deep2+l0fine b24 train", img_s=round(ips, 1),
             ms_step=round(ms, 1), compile_s=round(cs, 1))
    except Exception as e:
        emit(section="combo", cfg="deep2+l0fine b24 train", error=repr(e)[:250])


@section("d640train")
def s_d640train():
    # BASELINE config #4 shape: COCO detect train @640 (reference bs128).
    # b128 may need remat at 640 (pixel volume ~ b50 @1024; b32 is the
    # @1024 no-remat ceiling).
    env = {"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
           "QUAN_FUSED_ATTN": "1"}
    for Bt, remat in ((64, False), (128, False), (128, True)):
        try:
            ips, ms, cs = _task_train_step_ms("yolo11n-quan.yaml", None, Bt,
                                              640, env, remat=remat)
            emit(section="d640train", cfg=f"detect b{Bt} @640 remat={remat}",
                 img_s=round(ips, 1), ms_step=round(ms, 1),
                 compile_s=round(cs, 1))
        except Exception as e:
            emit(section="d640train", cfg=f"detect b{Bt} @640 remat={remat}",
                 error=repr(e)[:250])


@section("lat")
def s_lat():
    # serving latency at small batch (docs/SERVING.md operating points):
    # full pipeline ms/batch at b1/b4/b8, 640 and 1024.
    env = {"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
           "QUAN_FUSED_ATTN": "1"}
    for imgsz, nc, yaml, rot in ((640, 80, "yolo11n-quan.yaml", False),
                                 (1024, 15, "yolo11n-obb-quan.yaml", True)):
        for b in (1, 4, 8):
            try:
                ips, dt, cs = infer_pipeline_imgs(
                    b, imgsz=imgsz, nc=nc, yaml=yaml, rotated=rot, env=env)
                emit(section="lat", cfg=f"b{b} @{imgsz}",
                     ms_batch=round(dt * 1e3, 2), img_s=round(ips, 1),
                     compile_s=round(cs, 1))
            except Exception as e:
                emit(section="lat", cfg=f"b{b} @{imgsz}", error=repr(e)[:200])


@section("deep2")
def s_deep2():
    # deep packing level 2 (QUAN_STEM_DEEP=2): packed region through layer
    # 4's C3k2, saved P3 tap unpacked once — targets the stride-8
    # W-minor<->C-minor flip copies (~7.5 ms/step train b24, part of the
    # 11.8 ms data-formatting bucket at b128 inference). 4x FLOPs on L4's
    # 1x1s at 4x MXU occupancy; must measure.
    base = {"QUAN_QCONV_IMPL": "auto", "QUAN_FUSED_ATTN": "1"}
    for name, env in (("deep2", {**base, "QUAN_STEM_DEEP": "2"}),
                      ("deep1", {**base, "QUAN_STEM_DEEP": "1"}),
                      ("deep3", {**base, "QUAN_STEM_DEEP": "3"})):
        try:
            ips, dt, cs = infer_pipeline_imgs(128, env=env)
            emit(section="deep2", cfg=f"{name} b128", img_s=round(ips, 1),
                 ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="deep2", cfg=f"{name} b128", error=repr(e)[:200])
    for name, env in (("deep2", {**base, "QUAN_STEM_DEEP": "2"}),
                      ("deep1", {**base, "QUAN_STEM_DEEP": "1"}),
                      ("deep3", {**base, "QUAN_STEM_DEEP": "3"})):
        try:
            ips, ms, cs = _train_step_ms(24, False, env)
            emit(section="deep2", cfg=f"{name} b24 train", img_s=round(ips, 1),
                 ms_step=round(ms, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="deep2", cfg=f"{name} b24 train", error=repr(e)[:250])


@section("u8in")
def s_u8in():
    # uint8 device input + in-pipeline /255 (predictor semantics): the input
    # HBM read drops 1.2 GB at b128 IF XLA fuses the convert into the
    # mapping chain. A/B against the f32-input opt5 number.
    try:
        ips, dt, cs = infer_pipeline_imgs(
            128, env={"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
                      "QUAN_FUSED_ATTN": "1"}, input_u8=True)
        emit(section="u8in", cfg="u8 input b128", img_s=round(ips, 1),
             ms_iter=round(dt * 1e3, 1), compile_s=round(cs, 1))
    except Exception as e:
        emit(section="u8in", cfg="u8 input b128", error=repr(e)[:200])


@section("trainopt")
def s_trainopt():
    # new flash backward (unnormalized-E folding, bf16 dP matmul) on chip.
    # Reference points: b16 125.6->134.7, b24 129.8->135.8 (fourth session).
    env = {"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
           "QUAN_FUSED_ATTN": "1"}
    for Bt in (24, 16, 32):
        try:
            ips, ms, cs = _train_step_ms(Bt, False, env)
            emit(section="trainopt", cfg=f"attnv2 b{Bt}", img_s=round(ips, 1),
                 ms_step=round(ms, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="trainopt", cfg=f"attnv2 b{Bt}", error=repr(e)[:250])


def _task_train_step_ms(yaml, task_extra, Bt, imgsz, env, iters=5, nc=80, remat=False):
    """Train-step timing for seg/pose (task read from the YAML's head)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    saved = {}
    for k, v in (env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
        from quan_ultralytics_tpu.models.tasks import DetectionModel

        model = DetectionModel.from_yaml(yaml, nc=nc, dtype=jnp.bfloat16,
                                         remat=remat)
        cfg = TrainConfig(epochs=10, batch=Bt, imgsz=imgsz, nbs=Bt)
        trainer = Trainer(model, cfg, steps_per_epoch=100)
        state = trainer.init_state()
        step_fn = trainer.make_train_step()
        M = 32
        rnd = np.random.RandomState(0)
        batch = {
            "img": jax.jit(lambda k: jax.random.uniform(
                k, (Bt, imgsz, imgsz, 3), jnp.float32))(jax.random.PRNGKey(2)),
            "bboxes": jnp.asarray(rnd.rand(Bt, M, 4).astype(np.float32) * 0.3 + 0.1),
            "cls": jnp.zeros((Bt, M), jnp.int32),
            "mask": jnp.ones((Bt, M), bool),
        }
        if task_extra == "masks":
            Hp = imgsz // 4
            batch["masks"] = jnp.asarray(
                (rnd.rand(Bt, M, Hp, Hp) > 0.7).astype(np.float32))
        elif task_extra == "keypoints":
            k = rnd.rand(Bt, M, 17, 3).astype(np.float32)
            k[..., 2] = 1.0
            batch["keypoints"] = jnp.asarray(k)
        t0 = time.perf_counter()
        state, loss, aux = step_fn(state, batch)
        float(loss)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss, aux = step_fn(state, batch)
        float(loss)
        dt = (time.perf_counter() - t0) / iters
        return Bt / dt, dt * 1e3, compile_s
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@section("segpose")
def s_segpose():
    # seg/pose task coverage on chip: full-pipeline inference @640 + one
    # train-step config each (COCO-style nc=80/nc=1-kpt heads).
    env = {"QUAN_QCONV_IMPL": "auto", "QUAN_STEM_DEEP": "1",
           "QUAN_FUSED_ATTN": "1"}
    for yaml, task, nc in (("yolo11n-seg-quan.yaml", "segment", 80),
                           ("yolo11n-pose-quan.yaml", "pose", 1)):
        try:
            ips, dt, cs = infer_pipeline_imgs(
                128, imgsz=640, env=env, nc=nc, yaml=yaml, rotated=False)
            emit(section="segpose", cfg=f"{task} infer b128 @640",
                 img_s=round(ips, 1), ms_iter=round(dt * 1e3, 1),
                 compile_s=round(cs, 1))
        except Exception as e:
            emit(section="segpose", cfg=f"{task} infer b128 @640",
                 error=repr(e)[:250])
    for yaml, extra, nc, Bt in (("yolo11n-seg-quan.yaml", "masks", 80, 64),
                                ("yolo11n-pose-quan.yaml", "keypoints", 1, 64)):
        try:
            ips, ms, cs = _task_train_step_ms(yaml, extra, Bt, 640, env, nc=nc)
            emit(section="segpose", cfg=f"{extra} train b{Bt} @640",
                 img_s=round(ips, 1), ms_step=round(ms, 1), compile_s=round(cs, 1))
        except Exception as e:
            emit(section="segpose", cfg=f"{extra} train b{Bt} @640",
                 error=repr(e)[:250])


@section("cls")
def s_cls():
    # classification stack on chip: Q-WRN-16-2 CIFAR-shape train + eval
    # throughput (the reference's cls headlines are accuracy-only; these are
    # the first TPU wall-clock numbers for the stack).
    import numpy as np
    import jax
    import jax.numpy as jnp

    from quan_ultralytics_tpu.classification.train import ClsConfig, ClsTrainer

    for model_name, bs in (("qwrn16_2", 1024), ("qwrn16_2", 512),
                           ("qrn18", 512)):
        try:
            cfg = ClsConfig(model=model_name, batch_size=bs, num_classes=10)
            trainer = ClsTrainer(cfg, steps_per_epoch=100)
            state = trainer.init_state(input_size=32)
            step_fn = trainer.make_train_step()
            rng = jax.random.PRNGKey(0)
            batch = {
                "img": jax.jit(lambda k: jax.random.uniform(
                    k, (bs, 32, 32, 3), jnp.float32))(jax.random.PRNGKey(3)),
                "label": jnp.zeros((bs,), jnp.int32),
            }
            t0 = time.perf_counter()
            state, loss, acc = step_fn(state, batch, rng)
            float(loss)
            cs = time.perf_counter() - t0
            t0 = time.perf_counter()
            iters = 20
            for _ in range(iters):
                state, loss, acc = step_fn(state, batch, rng)
            float(loss)
            dt = (time.perf_counter() - t0) / iters
            emit(section="cls", cfg=f"{model_name} train b{bs} @32",
                 img_s=round(bs / dt, 1), ms_step=round(dt * 1e3, 2),
                 compile_s=round(cs, 1))
        except Exception as e:
            emit(section="cls", cfg=f"{model_name} train b{bs} @32",
                 error=repr(e)[:250])


@section("train")
def s_train():
    import numpy as np
    import jax
    import jax.numpy as jnp

    for deep in ("0", "1"):
        os.environ["QUAN_QCONV_IMPL"] = "auto"
        os.environ["QUAN_STEM_DEEP"] = deep
        try:
            from quan_ultralytics_tpu.engine.trainer import TrainConfig, Trainer
            from quan_ultralytics_tpu.models.tasks import DetectionModel

            for Bt in (8, 16):
                model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15,
                                                 dtype=jnp.bfloat16,
                                                 remat=(Bt == 16))
                cfg = TrainConfig(epochs=10, batch=Bt, imgsz=1024, nbs=Bt)
                trainer = Trainer(model, cfg, steps_per_epoch=100)
                state = trainer.init_state()
                step_fn = trainer.make_train_step()
                M = 64
                key = jax.random.PRNGKey(2)
                batch = {
                    "img": jax.jit(lambda k: jax.random.uniform(
                        k, (Bt, 1024, 1024, 3), jnp.float32))(key),
                    "bboxes": jnp.asarray(np.random.rand(Bt, M, 5).astype(np.float32) * 0.3 + 0.1),
                    "cls": jnp.zeros((Bt, M), jnp.int32),
                    "mask": jnp.ones((Bt, M), bool),
                }
                t0 = time.perf_counter()
                state, loss, aux = step_fn(state, batch)
                float(loss)
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(5):
                    state, loss, aux = step_fn(state, batch)
                float(loss)
                dt = (time.perf_counter() - t0) / 5
                emit(section="train", cfg=f"deep={deep} b{Bt} remat={Bt == 16}",
                     img_s=round(Bt / dt, 1), ms_step=round(dt * 1e3, 1),
                     compile_s=round(compile_s, 1), loss=round(float(loss), 3))
        except Exception as e:
            emit(section="train", cfg=f"deep={deep}", error=repr(e)[:300])


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
    names = sys.argv[1:] or ["health", "base", "deep", "batch"]
    fns = {f._section: f for f in [s_health, s_base, s_deep, s_batch, s_attn,
                                   s_fold, s_packedimpl, s_train, s_bench128,
                                   s_train2, s_trainattn, s_batch3,
                                   s_profile128, s_trainprof16, s_trainprof24,
                                   s_d640, s_d640ab, s_opt5, s_trainopt, s_l0fine, s_abf16, s_i8, s_l0train,
                                   s_u8in, s_deep2, s_combo, s_lat, s_d640train, s_segpose, s_cls]}
    for n in names:
        t0 = time.perf_counter()
        try:
            fns[n]()
        except Exception as e:
            emit(section=n, error=repr(e)[:300])
        emit(section=n, done_s=round(time.perf_counter() - t0, 1))


if __name__ == "__main__":
    main()
