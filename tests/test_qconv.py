"""Numeric parity tests for the quaternion core ops.

The oracle is an independent NumPy direct-convolution implementing the
reference CUDA semantics (quaternion_ops.cu:42-181): per-component
cross-correlation, Zhou-separable mixing, real bias pre-mixing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quan_ultralytics_tpu.ops.mixing import MIX_MATRIX, mix_components
from quan_ultralytics_tpu.ops.qconv import qconv2d, qconv2d_folded, fold_dense_kernel, qdense
from quan_ultralytics_tpu.ops.mappings import rgb_to_quaternion


def ref_qconv_numpy(x, w, bias=None, stride=1, pad=0, dilation=1, groups=1):
    """Direct-loop oracle. x: [B,H,W,4,Cin], w: [4,kh,kw,Cin/g,Cout]."""
    B, H, W, _, Cin = x.shape
    _, kh, kw, cin_pg, Cout = w.shape
    sh = sw = stride
    Ho = (H + 2 * pad - dilation * (kh - 1) - 1) // sh + 1
    Wo = (W + 2 * pad - dilation * (kw - 1) - 1) // sw + 1
    xp = np.zeros((B, H + 2 * pad, W + 2 * pad, 4, Cin), dtype=np.float64)
    xp[:, pad : pad + H, pad : pad + W] = x
    s = np.zeros((B, Ho, Wo, 4, Cout), dtype=np.float64)
    cout_pg = Cout // groups
    for b in range(B):
        for ho in range(Ho):
            for wo in range(Wo):
                for d in range(4):
                    for co in range(Cout):
                        g = co // cout_pg
                        acc = 0.0
                        for ci in range(cin_pg):
                            for i in range(kh):
                                for j in range(kw):
                                    acc += (
                                        xp[b, ho * sh + i * dilation, wo * sw + j * dilation, d, g * cin_pg + ci]
                                        * w[d, i, j, ci, co]
                                    )
                        s[b, ho, wo, d, co] = acc
    if bias is not None:
        s[..., 0, :] += bias  # real bias added pre-mixing (quaternion_ops.cu:87)
    # Zhou-separable mixing
    y = np.einsum("qd,bhwdc->bhwqc", MIX_MATRIX.astype(np.float64), s)
    return y


def test_mixing_matrix_is_scaled_orthogonal():
    m = MIX_MATRIX
    assert np.allclose(m @ m.T, 4 * np.eye(4))


def test_mix_components_matches_matrix():
    s = np.random.randn(2, 3, 3, 4, 5).astype(np.float32)
    got = np.asarray(mix_components(jnp.asarray(s), axis=-2))
    want = np.einsum("qd,bhwdc->bhwqc", MIX_MATRIX, s)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize(
    "stride,pad,groups,k,cin,cout",
    [
        (1, 1, 1, 3, 4, 8),
        (2, 1, 1, 3, 8, 4),
        (1, 0, 1, 1, 8, 8),
        (1, 1, 2, 3, 4, 4),   # grouped (DWConv-style)
        (1, 2, 1, 5, 4, 4),
    ],
)
def test_qconv2d_matches_oracle(stride, pad, groups, k, cin, cout):
    x = np.random.randn(2, 8, 8, 4, cin).astype(np.float32)
    w = (np.random.randn(4, k, k, cin // groups, cout) * 0.2).astype(np.float32)
    b = np.random.randn(cout).astype(np.float32)
    got = np.asarray(qconv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                             stride=stride, padding=pad, groups=groups))
    want = ref_qconv_numpy(x.astype(np.float64), w.astype(np.float64), b.astype(np.float64),
                           stride=stride, pad=pad, groups=groups)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_qconv2d_folded_matches_separable():
    x = np.random.randn(2, 8, 8, 4, 8).astype(np.float32)
    w = (np.random.randn(4, 3, 3, 8, 12) * 0.2).astype(np.float32)
    b = np.random.randn(12).astype(np.float32)
    y1 = qconv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=1, padding=1)
    dk = fold_dense_kernel(jnp.asarray(w), jnp.asarray(MIX_MATRIX))
    y2 = qconv2d_folded(jnp.asarray(x), dk, jnp.asarray(b), stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-4)


def test_qconv2d_gradients_finite_difference():
    """Autodiff == the reference 'Correct Left Conj' backward (which is the
    exact VJP): spot-check with central finite differences (x64 for FD
    stability)."""
    with jax.enable_x64(True):
        x = np.random.randn(1, 5, 5, 4, 4)
        w = np.random.randn(4, 3, 3, 4, 4) * 0.3

        def loss(w_):
            y = qconv2d(jnp.asarray(x), w_, stride=1, padding=1)
            return jnp.sum(jnp.sin(y))

        g = np.asarray(jax.grad(loss)(jnp.asarray(w)))
        eps = 1e-6
        for idx in [(0, 0, 0, 0, 0), (1, 1, 2, 3, 1), (3, 2, 1, 0, 2), (2, 0, 1, 2, 3)]:
            wp, wm = w.copy(), w.copy()
            wp[idx] += eps
            wm[idx] -= eps
            fd = (loss(jnp.asarray(wp)) - loss(jnp.asarray(wm))) / (2 * eps)
            np.testing.assert_allclose(g[idx], fd, rtol=1e-5, atol=1e-8)


def test_input_grad_matches_transpose_mixing_formula():
    """grad_x_d = conv_transpose((M^T g)_d, w_d) — the reference backward
    input kernel (quaternion_ops.cu:278-281). Verified by linearity: the VJP
    of y = M @ conv(x) applied to cotangent g equals conv_T(M^T g)."""
    x = np.random.randn(1, 6, 6, 4, 4)
    w = np.random.randn(4, 3, 3, 4, 4) * 0.3
    g = np.random.randn(1, 6, 6, 4, 4)

    _, vjp = jax.vjp(lambda x_: qconv2d(x_, jnp.asarray(w), stride=1, padding=1), jnp.asarray(x))
    (got,) = vjp(jnp.asarray(g))

    # independent construction: mix cotangent with M^T, then per-component
    # correlation-transpose done by autodiff of a plain conv
    gt = np.einsum("qd,bhwqc->bhwdc", MIX_MATRIX, g)  # (M^T g)[d] = sum_q M[q,d] g[q]

    def per_comp_conv(x_):
        from quan_ultralytics_tpu.ops.qconv import qconv2d as _q
        # plain separable conv without mixing: use lax directly
        import jax.numpy as jnp_
        from jax import lax
        B, H, W, _, cin = x_.shape
        xf = x_.reshape(B, H, W, 4 * cin)
        kern = jnp_.transpose(jnp.asarray(w), (1, 2, 3, 0, 4)).reshape(3, 3, cin, 4 * w.shape[-1])
        s = lax.conv_general_dilated(xf, kern, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     feature_group_count=4,
                                     precision=lax.Precision.HIGHEST)
        return s.reshape(B, H, W, 4, w.shape[-1])

    _, vjp2 = jax.vjp(per_comp_conv, jnp.asarray(x))
    (want,) = vjp2(jnp.asarray(gt))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_qdense_matches_hamilton_oracle():
    x = np.random.randn(3, 4, 6)
    w = np.random.randn(4, 6, 5) * 0.3
    b = np.random.randn(4, 5) * 0.1
    got = np.asarray(qdense(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))

    # oracle: a_d(xc) = x_c @ w_d + b_d, Hamilton combination
    a = {}
    for ci, cn in enumerate("rijk"):
        for di, dn in enumerate("rijk"):
            a[cn + dn] = x[:, ci] @ w[di] + b[di]
    out_r = a["rr"] - a["ii"] - a["jj"] - a["kk"]
    out_i = a["ri"] + a["ir"] + a["jk"] - a["kj"]
    out_j = a["rj"] - a["ik"] + a["jr"] + a["ki"]
    out_k = a["rk"] + a["ij"] - a["ji"] + a["kr"]
    want = np.stack([out_r, out_i, out_j, out_k], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestMappings:
    def test_poincare_unit_norm_inside_ball(self):
        x = np.random.rand(2, 4, 4, 3) * 0.5  # inside unit ball
        q = np.asarray(rgb_to_quaternion(jnp.asarray(x), "poincare"))
        assert q.shape == (2, 4, 4, 4, 1)
        norms = np.linalg.norm(q[..., 0], axis=-1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    def test_poincare_formula(self):
        x = np.random.rand(1, 2, 2, 3)
        q = np.asarray(rgb_to_quaternion(jnp.asarray(x), "poincare"))[..., 0]
        n = (x ** 2).sum(-1)
        np.testing.assert_allclose(q[..., 0], (1 - n) / (1 + n), rtol=1e-6)
        for i in range(3):
            np.testing.assert_allclose(q[..., 1 + i], 2 * x[..., i] / (1 + n), rtol=1e-6)

    def test_hamilton(self):
        x = np.random.rand(1, 2, 2, 3)
        q = np.asarray(rgb_to_quaternion(jnp.asarray(x), "hamilton"))[..., 0]
        np.testing.assert_allclose(q[..., 0], 0.0)
        np.testing.assert_allclose(q[..., 1:], x, rtol=1e-6)

    def test_luminance(self):
        x = np.random.rand(1, 3, 3, 3)
        q = np.asarray(rgb_to_quaternion(jnp.asarray(x), "luminance"))[..., 0]
        luma = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
        np.testing.assert_allclose(q[..., 0], luma, rtol=1e-5)

    def test_all_mappings_shapes(self):
        x = np.random.rand(2, 4, 4, 3)
        for m in ["poincare", "hamilton", "luminance", "mean_brightness", "raw_normalized"]:
            q = rgb_to_quaternion(jnp.asarray(x), m)
            assert q.shape == (2, 4, 4, 4, 1)


def test_qconv2d_int8_close_to_f32():
    """Opt-in PTQ conv (per-channel weights, per-tensor dynamic activations):
    within ~2% relative error of the f32 folded conv on random data."""
    import jax
    from quan_ultralytics_tpu.ops.mixing import MIX_MATRIX
    from quan_ultralytics_tpu.ops.qconv import (fold_dense_kernel, qconv2d_folded,
                                                qconv2d_int8)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((4, 3, 3, 8, 12)).astype(np.float32) * 0.1)
    dk = fold_dense_kernel(w, jnp.asarray(MIX_MATRIX))
    ref = np.asarray(qconv2d_folded(x, dk, stride=1, padding=1))
    got = np.asarray(qconv2d_int8(x, dk, stride=1, padding=1))
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.02, f"int8 rel err {rel}"


def test_model_forward_int8_impl(monkeypatch):
    """Full-graph eval under QUAN_QCONV_IMPL=int8 runs and correlates with
    the f32 graph (PTQ error compounds; exactness is not the contract)."""
    import jax
    from quan_ultralytics_tpu.models.tasks import DetectionModel

    m = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.asarray(np.random.default_rng(7).random((1, 64, 64, 3), np.float32))
    ref = np.asarray(m.decode(m.module.apply(v, x, train=False)))
    monkeypatch.setenv("QUAN_QCONV_IMPL", "int8")
    got = np.asarray(m.decode(m.module.apply(v, x, train=False)))
    assert got.shape == ref.shape and np.isfinite(got).all()
    # decoded box coords (first 5 columns) track the f32 graph
    c = np.corrcoef(got[..., :5].ravel(), ref[..., :5].ravel())[0, 1]
    assert c > 0.99, f"int8 graph decorrelated: r={c}"


def test_packed_conv_int8_close_to_folded():
    """int8 impl of the packed conv stays within PTQ tolerance of folded."""
    import jax
    from quan_ultralytics_tpu.ops.qconv import qconv2d_packed

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4, 8 * 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((4, 3, 3, 8, 12)).astype(np.float32) * 0.1)
    ref = np.asarray(qconv2d_packed(x, w, stride=2, padding=1, ri=2, ro=2,
                                    impl="folded"))
    got = np.asarray(qconv2d_packed(x, w, stride=2, padding=1, ri=2, ro=2,
                                    impl="int8"))
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.02, f"packed int8 rel err {rel}"


def test_model_forward_int8_with_deep_stem(monkeypatch):
    """int8 + deep packed stem: the full graph runs and tracks f32."""
    import jax
    from quan_ultralytics_tpu.models.tasks import DetectionModel

    monkeypatch.setenv("QUAN_STEM_DEEP", "1")
    m = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.asarray(np.random.default_rng(8).random((1, 64, 64, 3), np.float32))
    ref = np.asarray(m.decode(m.module.apply(v, x, train=False)))
    monkeypatch.setenv("QUAN_QCONV_IMPL", "int8")
    got = np.asarray(m.decode(m.module.apply(v, x, train=False)))
    assert np.isfinite(got).all()
    c = np.corrcoef(got[..., :5].ravel(), ref[..., :5].ravel())[0, 1]
    assert c > 0.99, f"int8+deep-stem graph decorrelated: r={c}"


def test_int8_static_scale_matches_dynamic_kernel():
    """qconv2d_int8 with act_absmax == the batch's true absmax is
    BIT-identical to the dynamic path (same scale, same quantization)."""
    from quan_ultralytics_tpu.ops.mixing import MIX_MATRIX
    from quan_ultralytics_tpu.ops.qconv import fold_dense_kernel, qconv2d_int8

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 4, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((4, 3, 3, 8, 12)).astype(np.float32) * 0.1)
    dk = fold_dense_kernel(w, jnp.asarray(MIX_MATRIX))
    dyn = np.asarray(qconv2d_int8(x, dk, stride=1, padding=1))
    amax = jnp.max(jnp.abs(x))
    sta = np.asarray(qconv2d_int8(x, dk, stride=1, padding=1, act_absmax=amax))
    np.testing.assert_array_equal(dyn, sta)


def test_int8_calibration_static_serving(monkeypatch):
    """calibrate_int8 collects per-conv absmax into a 'quant' collection;
    serving with it uses STATIC scales (robust to a lower-range batch) and
    stays within PTQ tolerance of the f32 graph."""
    import jax
    from quan_ultralytics_tpu.models.tasks import DetectionModel
    from quan_ultralytics_tpu.ops.quant import calibrate_int8

    monkeypatch.setenv("QUAN_STEM_DEEP", "1")  # cover the packed path too
    m = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    rng = np.random.default_rng(12)
    cal = [rng.random((1, 64, 64, 3), np.float32) for _ in range(2)]
    vq = calibrate_int8(m, v, cal)
    leaves = jax.tree_util.tree_leaves(vq["quant"])
    assert len(leaves) > 10 and all(float(l) > 0 for l in leaves)

    x = jnp.asarray(0.5 * rng.random((1, 64, 64, 3), np.float32))
    ref = np.asarray(m.decode(m.module.apply(v, x, train=False)))  # f32 graph
    monkeypatch.setenv("QUAN_QCONV_IMPL", "int8")
    got = np.asarray(m.decode(m.module.apply(vq, x, train=False)))
    assert np.isfinite(got).all()
    c = np.corrcoef(got[..., :5].ravel(), ref[..., :5].ravel())[0, 1]
    assert c > 0.98, f"calibrated int8 graph decorrelated: r={c}"


def test_train_graph_fold_threshold_scoping():
    """The auto impl's fold threshold is mode-dependent (r4 trainfold A/B:
    train folds everything, 156.4 vs 140.5 img/s b24; inference keeps 32).
    trainer.loss_fn wraps its apply in `train_graph()`; the choice is
    observable as the conv's feature_group_count. Math is identical."""
    import jax
    from quan_ultralytics_tpu.models.conv import QConv2D, train_graph

    m = QConv2D(64, 192, k=1, impl="auto", use_bias=False)  # cout/4 = 48
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 8, 8, 4, 16)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    jx_infer = str(jax.make_jaxpr(lambda p, xx: m.apply(p, xx))(v, x))
    with train_graph():
        jx_train = str(jax.make_jaxpr(lambda p, xx: m.apply(p, xx))(v, x))
    assert "feature_group_count=4" in jx_infer, "inference: 48 >= 32 -> grouped"
    assert "feature_group_count=4" not in jx_train, "train: 48 < 128 -> folded"
    y_i = np.asarray(m.apply(v, x))
    with train_graph():
        y_t = np.asarray(m.apply(v, x))
    np.testing.assert_allclose(y_t, y_i, rtol=2e-5, atol=2e-5)
