"""Module-level and full-graph model tests (shape + statistics behavior)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quan_ultralytics_tpu.models.conv import Conv, IQBN, QConv2D, QDense
from quan_ultralytics_tpu.models.block import C3k2, QC2PSA, QSPPF, QAttention
from quan_ultralytics_tpu.models.tasks import DetectionModel, parse_model, resolve_model_cfg


def n_params(tree):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(tree))


class TestConvModules:
    def test_qconv_first_layer_rgb(self):
        m = QConv2D(3, 16, 3, 2, use_bias=False)
        x = jnp.asarray(np.random.rand(2, 32, 32, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == (2, 16, 16, 4, 4)

    def test_conv_block_shapes_and_bn_stats(self):
        m = Conv(16, 32, 3, 2)
        x = jnp.asarray(np.random.randn(2, 16, 16, 4, 4).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        y, updates = m.apply(v, x, train=True, mutable=["batch_stats"])
        assert y.shape == (2, 8, 8, 4, 8)
        # running stats moved toward batch stats
        assert not np.allclose(np.asarray(updates["batch_stats"]["bn"]["mean"]), 0.0)

    def test_iqbn_normalizes_per_component_channel(self):
        m = IQBN(16)
        x = np.random.randn(8, 6, 6, 4, 4).astype(np.float32) * 3 + 1.5
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
        y, _ = m.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
        y = np.asarray(y, dtype=np.float64)
        np.testing.assert_allclose(y.mean(axis=(0, 1, 2)), 0.0, atol=1e-3)
        np.testing.assert_allclose(y.std(axis=(0, 1, 2)), 1.0, atol=1e-2)

    def test_qdense_shape(self):
        m = QDense(64, 40)
        x = jnp.asarray(np.random.randn(3, 4, 16).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (3, 4, 10)


class TestBlocks:
    @pytest.mark.parametrize("c3k", [False, True])
    def test_c3k2(self, c3k):
        m = C3k2(32, 64, n=1, c3k=c3k, e=0.25)
        x = jnp.asarray(np.random.randn(1, 8, 8, 4, 8).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        assert m.apply(v, x).shape == (1, 8, 8, 4, 16)

    def test_qsppf(self):
        m = QSPPF(64, 64, 5)
        x = jnp.asarray(np.random.randn(1, 8, 8, 4, 16).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        assert m.apply(v, x).shape == (1, 8, 8, 4, 16)

    def test_qattention_per_component_independence(self):
        """Attention softmax must act independently per quaternion component."""
        m = QAttention(32, num_heads=2, attn_ratio=0.5)
        x = np.random.randn(1, 4, 4, 4, 8).astype(np.float32)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = m.apply(v, jnp.asarray(x))
        assert y.shape == x.shape

    def test_qc2psa(self):
        m = QC2PSA(64, 64, n=1)
        x = jnp.asarray(np.random.randn(1, 4, 4, 4, 16).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        assert m.apply(v, x).shape == (1, 4, 4, 4, 16)


class TestFullModel:
    def test_parse_model_channels_and_strides(self):
        cfg, scale = resolve_model_cfg("yolo11n-obb-quan.yaml")
        specs, save, nc = parse_model(cfg, scale, nc=15)
        assert nc == 15
        # n-scale widths: 64*0.25=16, ..., 1024*0.25=256
        assert specs[0].c2 == 16 and specs[0].stride == 2
        assert specs[7].c2 == 256 and specs[7].stride == 32
        head = specs[-1]
        assert head.module == "OBB"
        assert head.args[-1] == (8, 16, 32)  # P3, P4, P5 strides
        assert head.args[-2] == (64, 128, 256)  # level channels

    def test_obb_model_forward_and_decode(self):
        model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15)
        v = model.init(jax.random.PRNGKey(0), imgsz=64)
        x = jnp.asarray(np.random.rand(1, 64, 64, 3).astype(np.float32))
        feats, angles = model.apply(v, x)
        assert len(feats) == 3 and len(angles) == 3
        assert feats[0].shape == (1, 8, 8, 64 + 15)  # 4*reg_max + nc
        assert feats[2].shape == (1, 2, 2, 79)
        assert angles[0].shape == (1, 8, 8, 1)
        # angle range [-pi/4, 3pi/4]
        a = np.asarray(angles[0])
        assert a.min() > -np.pi / 4 - 1e-5 and a.max() < 3 * np.pi / 4 + 1e-5
        pred = model.decode((feats, angles))
        assert pred.shape == (1, 8 * 8 + 4 * 4 + 2 * 2, 4 + 15 + 1)
        assert np.isfinite(np.asarray(pred)).all()

    def test_detect_model_forward(self):
        model = DetectionModel.from_yaml("yolo11n-quan.yaml", nc=80)
        v = model.init(jax.random.PRNGKey(0), imgsz=64)
        x = jnp.asarray(np.random.rand(1, 64, 64, 3).astype(np.float32))
        feats = model.apply(v, x)
        assert len(feats) == 3
        pred = model.decode(feats)
        assert pred.shape == (1, 84, 84)

    def test_param_count_matches_reference(self):
        """Parameter-count parity with the PyTorch reference.

        Reference OBBModel('yolo11-obb-quan.yaml', nc=15) has 693,840
        parameters (measured from /root/reference). We have 693,568: the 272
        delta is exactly the reference's *unused* IQLN inside QAttention
        (2 x [32,4] = 256 params, defined but never called,
        block.py:1508/1534) plus the frozen DFL arange conv (16 params,
        block.py:73-76) which we keep as a constant instead."""
        model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15)
        v = model.init(jax.random.PRNGKey(0), imgsz=64)
        n = n_params(v["params"])
        assert n == 693840 - 256 - 16, f"param count {n}"


def test_model_scales_parse_and_run():
    """The s/m scale variants (reference yolo11.yaml:11-15 scales table)
    resolve to correct widths/depths and run a forward pass."""
    import jax
    import jax.numpy as jnp

    from quan_ultralytics_tpu.models.tasks import (DetectionModel, parse_model,
                                                   resolve_model_cfg)

    cfg, scale = resolve_model_cfg("yolo11s-obb-quan.yaml")
    assert scale == "s"
    specs, save, nc = parse_model(cfg, scale, nc=15)
    # s-scale width 0.50: layer 0 = 64*0.50 = 32 total quaternion channels
    assert specs[0].args[1] == 32
    # m-scale: width 1.00 with max_channels 512 caps layer 7/8 at 512
    cfg_m, _ = resolve_model_cfg("yolo11m-obb-quan.yaml")
    specs_m, _, _ = parse_model(cfg_m, "m", nc=15)
    assert specs_m[7].args[1] == 512

    m = DetectionModel.from_yaml("yolo11s-obb-quan.yaml", nc=15)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    feats, angles = m.module.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    assert len(feats) == 3 and angles[0].shape[0] == 1


def test_features_embed_and_visualization(tmp_path):
    """Intermediate capture + embed + feature_visualization (reference
    nn/tasks.py:140 _predict_once embed/visualize, engine/model.py:465
    Model.embed, utils/plotting.py:1346 feature_visualization)."""
    from quan_ultralytics_tpu.engine.model import YOLO
    from quan_ultralytics_tpu.utils.plotting import feature_visualization

    model = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=15)
    v = model.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.asarray(np.random.rand(2, 64, 64, 3).astype(np.float32))

    out, feats = model.features(v, x)
    # every non-head layer captured; tensors are BHWQC
    n_layers = len(model.specs)
    assert set(feats) >= {0, 1, n_layers - 2}
    f = feats[n_layers - 2]
    assert f.ndim == 5 and f.shape[0] == 2 and f.shape[3] == 4
    # capture must not perturb the forward
    feats2, angles2 = model.apply(v, x)
    assert np.allclose(np.asarray(out[0][0]), np.asarray(feats2[0]), atol=1e-5)
    # layer filter
    _, only3 = model.features(v, x, layers=[3])
    assert set(only3) == {3}

    # init must not leak an "intermediates" collection into checkpoints
    assert "intermediates" not in v

    # YOLO.embed: default second-to-last layer, pooled + concatenated
    y = YOLO("yolo11n-obb-quan.yaml", nc=15)
    y.variables = y.model.init(jax.random.PRNGKey(0), imgsz=64)
    im = (np.random.rand(48, 64, 3) * 255).astype(np.uint8)
    emb = y.embed([im, im], imgsz=64)
    assert emb.shape[0] == 2 and emb.shape[1] == int(np.prod(f.shape[3:]))
    assert np.allclose(emb[0], emb[1])  # identical inputs -> identical embeddings
    assert np.isfinite(emb).all()

    # feature grid PNG
    p = feature_visualization(f, tmp_path / "feat.png", n=9)
    import cv2
    g = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
    assert g is not None and g.shape == (3 * 96, 3 * 96)


def test_features_unpacked_across_stem_modes():
    """Captured features are the public [B,H,W,4,C] form regardless of the
    stem/deep packing knobs (sown tensors are depth-to-spaced): same params
    => same per-layer features."""
    from quan_ultralytics_tpu.models.tasks import QUANYOLO

    m = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=3)
    x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3).astype(np.float32))
    mod_off = QUANYOLO(m.module.specs, m.module.save, stem_s2d=False, capture=True)
    v = mod_off.init(jax.random.PRNGKey(0), x, train=False)
    variants = [QUANYOLO(m.module.specs, m.module.save, capture=True),  # s2d
                QUANYOLO(m.module.specs, m.module.save, stem_deep=1, capture=True),
                QUANYOLO(m.module.specs, m.module.save, stem_deep=2, capture=True)]
    _, st0 = mod_off.apply(v, x, train=False, mutable=["intermediates"])
    ref = {k: np.asarray(t[0]) for k, t in st0["intermediates"].items()}
    for mod in variants:
        _, st = mod.apply(v, x, train=False, mutable=["intermediates"])
        for k, t in st["intermediates"].items():
            got = np.asarray(t[0])
            assert got.shape == ref[k].shape, (k, got.shape, ref[k].shape)
            np.testing.assert_allclose(got, ref[k], rtol=2e-3, atol=2e-3,
                                       err_msg=k)
