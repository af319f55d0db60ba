"""Phase-composite stem parity: packed convs == the naive stride-2 path."""

import numpy as np
import jax.numpy as jnp

from quan_ultralytics_tpu.ops.qconv import qconv2d, qconv2d_phase0, qconv2d_phase1
from quan_ultralytics_tpu.ops.stem import space_to_depth


def _pack_bhwqc(y):
    """[B, H, W, 4, C] -> [B, H/2, W/2, 4, 4C] with phase-major (a, b, c)."""
    yt = jnp.moveaxis(y, 3, 1)  # [B, 4, H, W, C]
    z = space_to_depth(yt, 2)   # [B, 4, H/2, W/2, 4C]
    return jnp.moveaxis(z, 1, 3)


def test_phase0_matches_packed_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 4, 2)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(4, 3, 3, 2, 4)) * 0.3).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    ref = qconv2d(x, w, b, stride=2, padding=1)       # [2, 8, 8, 4, 4]
    ref_packed = _pack_bhwqc(ref)                      # [2, 4, 4, 4, 16]
    got = qconv2d_phase0(x, w, b)
    assert got.shape == ref_packed.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_packed), rtol=1e-4, atol=1e-4)


def test_phase1_matches_unpacked_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 4, 2)).astype(np.float32))
    w0 = jnp.asarray((rng.normal(size=(4, 3, 3, 2, 4)) * 0.3).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(4, 3, 3, 4, 6)) * 0.3).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))

    y0 = qconv2d(x, w0, stride=2, padding=1)           # [1, 8, 8, 4, 4]
    ref = qconv2d(y0, w1, b1, stride=2, padding=1)     # [1, 4, 4, 4, 6]

    z0 = qconv2d_phase0(x, w0)                         # packed layer-0 output
    got = qconv2d_phase1(z0, w1, b1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_phase0_first_layer_grouped_like():
    """First-layer shape: cin_pg=1 per component (RGB mapping output)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4, 1)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(4, 3, 3, 1, 4)) * 0.3).astype(np.float32))
    ref_packed = _pack_bhwqc(qconv2d(x, w, stride=2, padding=1))
    got = qconv2d_phase0(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_packed), rtol=1e-4, atol=1e-4)


def test_full_model_stem_s2d_parity():
    """stem_s2d=True and False produce identical outputs from the SAME params."""
    import jax
    from quan_ultralytics_tpu.models.tasks import DetectionModel, QUANYOLO

    m_off = DetectionModel.from_yaml("yolo11n-obb-quan.yaml", nc=3)
    m_off = m_off  # default stem_s2d=True; build an off variant below
    mod_on = m_off.module
    mod_off = QUANYOLO(mod_on.specs, mod_on.save, dtype=mod_on.dtype,
                       mapping_type=mod_on.mapping_type, stem_s2d=False)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    v = mod_off.init(jax.random.PRNGKey(0), x, train=False)
    feats_on, ang_on = mod_on.apply(v, x, train=False)
    feats_off, ang_off = mod_off.apply(v, x, train=False)
    for a, b in zip(feats_on + ang_on, feats_off + ang_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_phase0_packed_input_matches():
    """r=4 input packing + k2 conv == mapping + k3 s2 conv, packed."""
    from quan_ultralytics_tpu.ops.mappings import rgb_to_quaternion
    from quan_ultralytics_tpu.ops.qconv import qconv2d_phase0_packed
    from quan_ultralytics_tpu.ops.stem import s2d4_rgb_mapped

    rng = np.random.default_rng(3)
    x_rgb = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(4, 3, 3, 1, 4)) * 0.3).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

    mapped = rgb_to_quaternion(x_rgb, "poincare")           # [2,16,16,4,1]
    ref_packed = _pack_bhwqc(qconv2d(mapped, w, b, stride=2, padding=1))

    packed_in = s2d4_rgb_mapped(x_rgb, "poincare")          # [2,4,4,4,16]
    got = qconv2d_phase0_packed(packed_in, w, b)
    assert got.shape == ref_packed.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_packed), rtol=1e-4, atol=1e-4)
