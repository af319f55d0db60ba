"""Tests for aux components: config, tuner, DOTA tooling, metrics, plotting."""

import json
import math
from pathlib import Path

import numpy as np
import pytest


def test_get_cfg_defaults_and_overrides():
    from quan_ultralytics_tpu.cfg import get_cfg

    cfg = get_cfg()
    assert cfg.lr0 == 0.01 and cfg.box == 7.5 and cfg.epochs == 100
    cfg = get_cfg({"epochs": "50", "mosaic": 0.5})
    assert cfg.epochs == 50 and cfg.mosaic == 0.5
    with pytest.raises(KeyError):
        get_cfg({"not_a_key": 1})
    with pytest.raises(ValueError):
        get_cfg({"mosaic": 1.5})


def test_cfg_full_reference_key_surface():
    """Every key of the reference default.yaml is accepted and validated
    (reference cfg/__init__.py get_cfg type/range checks)."""
    import yaml
    from quan_ultralytics_tpu.cfg import CFG_PATH, get_cfg, validate_overrides

    ours = yaml.safe_load(open(CFG_PATH))
    ref_keys = [
        "task", "mode", "model", "data", "epochs", "time", "patience", "batch",
        "imgsz", "save", "save_period", "cache", "device", "workers", "project",
        "name", "exist_ok", "pretrained", "optimizer", "verbose", "seed",
        "deterministic", "single_cls", "rect", "cos_lr", "close_mosaic",
        "resume", "amp", "fraction", "profile", "freeze", "multi_scale",
        "overlap_mask", "mask_ratio", "dropout", "val", "split", "save_json",
        "save_hybrid", "conf", "iou", "max_det", "half", "dnn", "plots",
        "source", "vid_stride", "stream_buffer", "visualize", "augment",
        "agnostic_nms", "classes", "retina_masks", "embed", "show",
        "save_frames", "save_txt", "save_conf", "save_crop", "show_labels",
        "show_conf", "show_boxes", "line_width", "format", "keras", "optimize",
        "int8", "dynamic", "simplify", "opset", "workspace", "nms", "lr0",
        "lrf", "momentum", "weight_decay", "warmup_epochs", "warmup_momentum",
        "warmup_bias_lr", "box", "cls", "dfl", "pose", "kobj", "nbs", "hsv_h",
        "hsv_s", "hsv_v", "degrees", "translate", "scale", "shear",
        "perspective", "flipud", "fliplr", "bgr", "mosaic", "mixup",
        "copy_paste", "copy_paste_mode", "auto_augment", "erasing",
        "crop_fraction", "cfg", "tracker",
    ]
    missing = [k for k in ref_keys if k not in ours]
    assert not missing, f"default.yaml missing reference keys: {missing}"
    # typed coercion / rejection on the new keys
    cfg = get_cfg({"rect": "true", "cache": True, "mask_ratio": "8"})
    assert cfg.rect is True and cfg.cache == "ram" and cfg.mask_ratio == 8
    with pytest.raises(ValueError):
        get_cfg({"cache": "sometimes"})
    with pytest.raises(ValueError):
        get_cfg({"copy_paste_mode": "rotate"})
    with pytest.raises(ValueError):
        get_cfg({"dropout": 1.5})
    # sparse validation path used by the CLI
    ov = validate_overrides({"cos_lr": "1", "save_dir": "/tmp/x"})
    assert ov["cos_lr"] is True
    with pytest.raises(KeyError):
        validate_overrides({"learning_rate": 0.1})


def test_tuner_improves_fitness(tmp_path):
    from quan_ultralytics_tpu.engine.tuner import Tuner

    # toy objective: best at lr0=0.02, box=5
    def train_fn(hyp):
        return -((math.log10(hyp["lr0"]) + 1.7) ** 2) - ((hyp["box"] - 5) / 5) ** 2

    t = Tuner(train_fn, {"lr0": 0.001, "box": 7.5}, save_dir=str(tmp_path))
    best = t(iterations=25)
    assert t.history[0]["fitness"] <= max(h["fitness"] for h in t.history)
    assert (tmp_path / "best_hyperparameters.json").exists()


def test_dota_windows():
    from quan_ultralytics_tpu.data.split_dota import get_windows, window_label_iof

    w = get_windows((2000, 3000), (1024,), (200,))
    assert len(w) > 0
    assert ((w[:, 2] - w[:, 0]) == 1024).all()
    # windows tile the image
    assert w[:, 0].min() == 0 and w[:, 2].max() >= 3000 - 1024
    corners = np.array([[100, 100, 200, 100, 200, 200, 100, 200]], np.float32)
    iof = window_label_iof(corners, w)
    assert iof.shape == (1, len(w))
    assert iof.max() == 1.0  # the box fully inside at least one window


def test_dota_submission_merge(tmp_path):
    from quan_ultralytics_tpu.engine.dota_eval import DOTASubmission

    sub = DOTASubmission(["plane", "ship"])
    # same physical box predicted in two overlapping patches
    sub.add_patch("P0001__0_0", np.array([[900.0, 900.0, 50, 30, 0.2]]),
                  np.array([0.9]), np.array([0.0]))
    sub.add_patch("P0001__824_824", np.array([[76.0, 76.0, 50, 30, 0.2]]),
                  np.array([0.8]), np.array([0.0]))
    merged = sub.merge(iou_thr=0.3)
    assert len(merged["P0001"]) == 1  # cross-patch NMS removed the dup
    files = sub.write(str(tmp_path))
    assert (tmp_path / "Task1_plane.txt").read_text().startswith("P0001 0.9")


def test_metrics_perfect_predictions():
    from quan_ultralytics_tpu.utils.metrics import DetMetrics

    m = DetMetrics(nc=2, rotated=True)
    gt = np.array([[50, 50, 20, 10, 0.3], [100, 100, 30, 15, 1.0]], np.float32)
    m.update(gt.copy(), np.array([0.9, 0.8]), np.array([0.0, 1.0]),
             gt, np.array([0.0, 1.0]))
    res = m.compute()
    assert res["mAP50"] > 0.99 and res["mAP50-95"] > 0.99


def test_metrics_no_overlap():
    from quan_ultralytics_tpu.utils.metrics import DetMetrics

    m = DetMetrics(nc=1)
    m.update(np.array([[0, 0, 10, 10]], np.float32), np.array([0.9]), np.array([0.0]),
             np.array([[50, 50, 60, 60]], np.float32), np.array([0.0]))
    assert m.compute()["mAP50"] == 0.0


def test_confusion_matrix():
    from quan_ultralytics_tpu.utils.metrics import ConfusionMatrix

    # perfect: two boxes, right classes -> diagonal
    cm = ConfusionMatrix(nc=2, conf=0.001)  # 0.001 -> 0.25 substitution
    assert cm.conf == 0.25
    boxes = np.array([[0, 0, 10, 10], [50, 50, 80, 80]], np.float32)
    cm.process_batch(boxes, np.array([0.9, 0.8]), np.array([0, 1]),
                     boxes, np.array([0, 1]))
    assert cm.matrix[0, 0] == 1 and cm.matrix[1, 1] == 1 and cm.matrix.sum() == 2
    tp, fp = cm.tp_fp()
    assert list(tp) == [1, 1] and list(fp) == [0, 0]

    # no overlap: FP into background col, FN into background row
    cm = ConfusionMatrix(nc=1)
    cm.process_batch(np.array([[0, 0, 10, 10]], np.float32), np.array([0.9]),
                     np.array([0]), np.array([[50, 50, 60, 60]], np.float32),
                     np.array([0]))
    assert cm.matrix[0, 1] == 1  # predicted on background
    assert cm.matrix[1, 0] == 1  # missed gt
    # wrong class at right location -> off-diagonal
    cm = ConfusionMatrix(nc=2)
    cm.process_batch(np.array([[0, 0, 10, 10]], np.float32), np.array([0.9]),
                     np.array([1]), np.array([[0, 0, 10, 10]], np.float32),
                     np.array([0]))
    assert cm.matrix[1, 0] == 1
    # low-conf detections dropped; empty gt + empty pred is a no-op
    cm = ConfusionMatrix(nc=1)
    cm.process_batch(np.array([[0, 0, 10, 10]], np.float32), np.array([0.1]),
                     np.array([0]), np.zeros((0, 4), np.float32), np.zeros((0,)))
    assert cm.matrix.sum() == 0
    # rotated (probiou) path
    cm = ConfusionMatrix(nc=1)
    rb = np.array([[50, 50, 20, 10, 0.4]], np.float32)
    cm.process_batch(rb, np.array([0.9]), np.array([0]), rb, np.array([0]),
                     rotated=True)
    assert cm.matrix[0, 0] == 1
    s = cm.summary(names=["plane"])
    assert "plane" in s and "bg" in s


def test_val_surface_artifacts(tmp_path):
    """Per-class AP table + PR/F1/P/R curve PNGs + confusion-matrix images
    (reference utils/metrics.py:397-520 val artifacts)."""
    from quan_ultralytics_tpu.utils.metrics import ConfusionMatrix, DetMetrics

    m = DetMetrics(nc=2)
    boxes = np.array([[0, 0, 10, 10], [50, 50, 80, 80]], np.float32)
    m.update(boxes, np.array([0.9, 0.8]), np.array([0.0, 1.0]),
             boxes, np.array([0.0, 1.0]))
    # a miss for class 0 on another image
    m.update(np.zeros((0, 4), np.float32), np.zeros(0), np.zeros(0),
             np.array([[5, 5, 15, 15]], np.float32), np.array([0.0]))
    res = m.compute()
    table = m.per_class_table({0: "cat", 1: "dog"})
    assert "cat" in table and "dog" in table and "all" in table
    # class 1 is perfect; class 0 has 1 TP / 2 GT
    lines = {l.split()[0]: l.split() for l in table.strip().splitlines()[1:]}
    assert float(lines["dog"][4]) > 0.99          # mAP50
    assert int(lines["cat"][1]) == 2              # instances
    assert int(lines["all"][1]) == 3
    paths = m.plot(tmp_path, {0: "cat", 1: "dog"})
    assert {p.name for p in paths} == {"PR_curve.png", "F1_curve.png",
                                       "P_curve.png", "R_curve.png"}
    assert all(p.exists() and p.stat().st_size > 0 for p in paths)

    cm = ConfusionMatrix(nc=2)
    cm.process_batch(boxes, np.array([0.9, 0.8]), np.array([0, 1]),
                     boxes, np.array([0, 1]))
    p1 = cm.plot(tmp_path, ["cat", "dog"], normalize=False)
    p2 = cm.plot(tmp_path, ["cat", "dog"], normalize=True)
    assert p1.name == "confusion_matrix.png" and p1.exists()
    assert p2.name == "confusion_matrix_normalized.png" and p2.exists()


def test_plotting(tmp_path):
    from quan_ultralytics_tpu.utils.plotting import Annotator, plot_curves

    im = np.zeros((64, 64, 3), np.uint8)
    ann = Annotator(im, ["a"])
    ann.box_label([10, 10, 40, 40], "a 0.9", 0)
    ann.obb_label([32, 32, 20, 10, 0.5], "a 0.5", 1)
    assert ann.result().sum() > 0
    p = plot_curves([{"epoch": 0, "loss": 1.0}, {"epoch": 1, "loss": 0.5}],
                    str(tmp_path / "r.png"))
    if p:
        assert Path(p).exists()


def test_converter_coco(tmp_path):
    from quan_ultralytics_tpu.data.converter import convert_coco_to_yolo

    coco = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 100, "height": 200}],
        "categories": [{"id": 7}],
        "annotations": [{"image_id": 1, "category_id": 7, "bbox": [10, 20, 30, 40], "iscrowd": 0}],
    }
    j = tmp_path / "ann.json"
    j.write_text(json.dumps(coco))
    n = convert_coco_to_yolo(str(j), str(tmp_path / "labels"))
    assert n == 1
    line = (tmp_path / "labels" / "a.txt").read_text().split()
    assert line[0] == "0"
    np.testing.assert_allclose([float(v) for v in line[1:]], [0.25, 0.2, 0.3, 0.2], atol=1e-5)


def test_autobatch():
    from quan_ultralytics_tpu.models.tasks import DetectionModel
    from quan_ultralytics_tpu.utils.autobatch import auto_batch

    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15)
    b = auto_batch(model, imgsz=1024)
    assert 1 <= b <= 1024 and (b & (b - 1)) == 0  # power of two


def test_quaternion_chi_init_statistics():
    import jax
    from quan_ultralytics_tpu.ops.qinit import quaternion_chi_init

    w = quaternion_chi_init("he")(jax.random.PRNGKey(0), (4, 3, 3, 16, 32))
    w = np.asarray(w)
    assert w.shape == (4, 3, 3, 16, 32)
    mags = np.sqrt((w ** 2).sum(axis=0))
    # chi(4) scaled by 1/sqrt(2 fan_in): E[mag^2] = 4 sigma^2 = 2/fan_in
    fan_in = 3 * 3 * 16
    np.testing.assert_allclose((mags ** 2).mean(), 2.0 / fan_in, rtol=0.05)


def test_activations():
    import jax.numpy as jnp
    from quan_ultralytics_tpu.ops.activations import qrerelu, qsilu

    x = jnp.asarray(np.random.randn(2, 3, 3, 4, 8).astype(np.float32))
    assert qsilu(x).shape == x.shape
    y = qrerelu(x)
    # phase preserved: y parallel to x per quaternion
    xn = np.asarray(x)
    yn = np.asarray(y)
    cross = np.abs(xn * yn[..., ::-1, :]).sum()  # crude sanity
    assert yn.shape == xn.shape


def test_instances_algebra():
    from quan_ultralytics_tpu.utils.instance import Bboxes, Instances

    b = Bboxes(np.array([[10, 10, 30, 40]], np.float32), "xyxy")
    b.convert("xywh")
    np.testing.assert_allclose(b.bboxes, [[20, 25, 20, 30]])
    b.convert("ltwh")
    np.testing.assert_allclose(b.bboxes, [[10, 10, 20, 30]])
    b.convert("xyxy")
    np.testing.assert_allclose(b.bboxes, [[10, 10, 30, 40]])
    assert b.areas()[0] == 600

    inst = Instances(np.array([[0.5, 0.5, 0.2, 0.4]], np.float32),
                     bbox_format="xywh", normalized=True)
    inst.denormalize(100, 200)
    np.testing.assert_allclose(inst.bboxes, [[50, 100, 20, 80]])
    inst.fliplr(100)
    np.testing.assert_allclose(inst.bboxes, [[50, 100, 20, 80]])  # centered box unchanged
    inst.convert_bbox("xyxy")
    inst.clip(45, 200)  # clip cuts the box at x=45
    assert inst.bboxes[0, 2] == 45
    inst.convert_bbox("xywh")
    keep = inst.remove_zero_area_boxes()
    assert keep.all() and len(inst) == 1


def test_results_api(tmp_path):
    """Results user surface: plot/verbose/save_txt/summary/tojson
    (reference engine/results.py:484,599,620,700,735)."""
    import json

    from quan_ultralytics_tpu.engine.predictor import Results

    im = np.zeros((80, 100, 3), np.uint8)
    boxes = np.array([[10, 20, 50, 60, 0.9, 1], [30, 30, 70, 70, 0.8, 1],
                      [5, 5, 20, 20, 0.7, 0]], np.float32)
    r = Results((80, 100), boxes, names=["cat", "dog"], task="detect", orig_img=im)
    assert r.verbose() == "1 cat, 2 dogs, "
    out = r.plot(filename=str(tmp_path / "ann.jpg"))
    assert out.shape == im.shape and (tmp_path / "ann.jpg").exists()
    assert out.any(), "plot drew nothing"
    txt = tmp_path / "labels.txt"
    r.save_txt(txt, save_conf=True)
    lines = txt.read_text().strip().split("\n")
    assert len(lines) == 3
    c, xc, yc, w, h, conf = lines[0].split()
    assert (int(c), float(conf)) == (1, 0.9)
    np.testing.assert_allclose([float(xc), float(yc), float(w), float(h)],
                               [30 / 100, 40 / 80, 40 / 100, 40 / 80], atol=1e-5)
    s = json.loads(r.tojson())
    assert s[0]["name"] == "dog" and s[0]["box"]["x2"] == 50.0

    # OBB: normalized 8-corner rows, axis-aligned case is checkable by hand
    ob = np.array([[50, 40, 20, 10, 0.0, 0.95, 0]], np.float32)
    ro = Results((80, 100), ob, names=["plane"], task="obb", orig_img=im)
    ro.save_txt(tmp_path / "obb.txt")
    vals = [float(v) for v in (tmp_path / "obb.txt").read_text().split()]
    assert vals[0] == 0 and len(vals) == 9
    xs, ys = vals[1::2], vals[2::2]
    np.testing.assert_allclose(sorted(set(np.round(xs, 5))), [0.4, 0.6], atol=1e-5)
    np.testing.assert_allclose(sorted(set(np.round(ys, 5))), [35 / 80, 45 / 80], atol=1e-5)
    assert ro.summary()[0]["name"] == "plane"
    # empty results
    r0 = Results((80, 100), np.zeros((0, 6), np.float32), task="detect", orig_img=im)
    assert r0.verbose() == "(no detections), "
    r0.save_txt(tmp_path / "empty.txt")
