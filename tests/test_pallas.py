"""Pallas fused qconv kernel vs the reference jnp path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from quan_ultralytics_tpu.ops.qconv import qconv2d
from quan_ultralytics_tpu.ops.pallas.qconv_fused import fold_iqbn


def _fused_interpret(x, w, scale, shift, apply_silu=True):
    """Run the kernel (interpreter mode auto-selected on CPU)."""
    from quan_ultralytics_tpu.ops.pallas.qconv_fused import qconv1x1_fused

    return qconv1x1_fused(x, w, scale, shift, block_p=64, apply_silu=apply_silu)


def test_conv_block_fused_dispatch_matches(monkeypatch):
    """Conv (QConv2D+IQBN+SiLU) with QUAN_FUSED_1X1=1 dispatches to the
    Pallas kernel (interpret mode on CPU) and matches the unfused eval path;
    the param tree is identical so checkpoints work with either path."""
    from quan_ultralytics_tpu.models.conv import Conv

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 8)).astype(np.float32))
    mod = Conv(32, 48, 1)
    v = mod.init(jax.random.PRNGKey(0), x)
    # randomize stats so the IQBN fold is non-trivial
    v = jax.tree_util.tree_map(lambda a: a, v)
    v["batch_stats"]["bn"]["mean"] = jnp.asarray(rng.normal(size=(4, 12)).astype(np.float32) * 0.1)
    v["batch_stats"]["bn"]["var"] = jnp.asarray(rng.uniform(0.5, 1.5, (4, 12)).astype(np.float32))

    ref = mod.apply(v, x, train=False)
    monkeypatch.setenv("QUAN_FUSED_1X1", "1")
    got = mod.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_qconv1x1_matches_reference_path():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 8)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(4, 1, 1, 8, 12)) * 0.3).astype(np.float32))
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, (4, 12)).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=(4, 12)).astype(np.float32) * 0.1)
    mean = jnp.asarray(rng.normal(size=(4, 12)).astype(np.float32) * 0.1)
    var = jnp.asarray(rng.uniform(0.5, 1.5, (4, 12)).astype(np.float32))

    scale, shift = fold_iqbn(gamma, beta, mean, var)
    got = _fused_interpret(x, w, scale, shift)

    ref = qconv2d(x, w)  # conv + mixing
    ref = ref * scale + shift
    ref = ref * jax.nn.sigmoid(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_attention_matches_xla_path():
    """qattention_fused (interpret mode on CPU) == the einsum+softmax path,
    and QAttention produces identical output with the kernel enabled."""
    import os

    import jax
    import numpy as np

    from quan_ultralytics_tpu.models.block import QAttention
    from quan_ultralytics_tpu.ops.pallas.qattn import qattention_fused, supports

    rng = np.random.default_rng(0)
    B, Q, H, N, dk, dv = 2, 4, 3, 128, 4, 8
    q = jnp.asarray(rng.normal(size=(B, Q, H, N, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Q, H, N, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Q, H, N, dv)).astype(np.float32))
    scale = dk ** -0.5
    attn = jnp.einsum("bqhnd,bqhmd->bqhnm", q, k) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
    ref = jnp.einsum("bqhnm,bqhmd->bqhnd", attn, v)
    got = qattention_fused(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)

    # 400 (640px) pads to 512 but measured slower than XLA there — the
    # auto-dispatch gate takes exact tile multiples only
    assert supports(128) and supports(1024) and not supports(400)
    assert not supports(4096) and not supports(32)

    # module-level: kernel on vs off, same params (eval only; N=8*16=128)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 4, 32)).astype(np.float32))
    mod = QAttention(dim=128, num_heads=8, attn_ratio=0.5)
    vvars = mod.init(jax.random.PRNGKey(0), x)
    y_off = mod.apply(vvars, x)
    os.environ["QUAN_FUSED_ATTN"] = "1"
    try:
        y_on = mod.apply(vvars, x)
    finally:
        os.environ.pop("QUAN_FUSED_ATTN", None)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off), rtol=2e-4, atol=2e-5)


def test_fused_attention_gradients():
    """Custom VJP (flash backward, recomputed P) == autodiff of the einsum
    path for dQ/dK/dV."""
    import jax
    import numpy as np

    from quan_ultralytics_tpu.ops.pallas.qattn import qattention_fused

    rng = np.random.default_rng(1)
    B, Q, H, N, dk, dv = 1, 2, 2, 128, 4, 8
    q = jnp.asarray(rng.normal(size=(B, Q, H, N, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Q, H, N, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Q, H, N, dv)).astype(np.float32))
    scale = dk ** -0.5
    w = jnp.asarray(rng.normal(size=(B, Q, H, N, dv)).astype(np.float32))

    def ref_loss(q, k, v):
        attn = jnp.einsum("bqhnd,bqhmd->bqhnm", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        o = jnp.einsum("bqhnm,bqhmd->bqhnd", attn, v)
        return jnp.sum(o * w)

    def ker_loss(q, k, v):
        return jnp.sum(qattention_fused(q, k, v, scale) * w)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(ker_loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4,
                                   atol=5e-5, err_msg=f"d{name}")


def test_fused_attention_padded_n():
    """Non-multiple-of-128 N (e.g. 400 at 640px) pads to the next tile size:
    forward AND custom-VJP gradients must match the einsum path exactly
    (masked key columns softmax to zero; padded query rows are sliced off)."""
    import jax
    import numpy as np

    from quan_ultralytics_tpu.ops.pallas.qattn import qattention_fused

    rng = np.random.default_rng(2)
    B, Q, H, N, dk, dv = 1, 2, 2, 200, 4, 8  # N=200 -> padded 256
    q = jnp.asarray(rng.normal(size=(B, Q, H, N, dk)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Q, H, N, dk)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Q, H, N, dv)).astype(np.float32))
    scale = dk ** -0.5
    w = jnp.asarray(rng.normal(size=(B, Q, H, N, dv)).astype(np.float32))

    attn = jnp.einsum("bqhnd,bqhmd->bqhnm", q, k) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
    ref = jnp.einsum("bqhnm,bqhmd->bqhnd", attn, v)
    got = qattention_fused(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)

    def ref_loss(q, k, v):
        a = jnp.einsum("bqhnd,bqhmd->bqhnm", q, k) * scale
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(v.dtype)
        return jnp.sum(jnp.einsum("bqhnm,bqhmd->bqhnd", a, v) * w)

    def ker_loss(q, k, v):
        return jnp.sum(qattention_fused(q, k, v, scale) * w)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(ker_loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4,
                                   atol=5e-5, err_msg=f"d{name}")
