"""Classification-stack numerical parity vs the PyTorch reference.

Ports a reference Q-WRN-16-2 (classification/models/quaternion_models.py:80)
weight-for-weight into our flax QWideResNet and asserts eval-mode agreement:
per-stage feature maps, the pooled quaternion features, and the QDense
Hamilton classifier.

Unlike the detection reference, the classification QConv2D's torch path
(classification/quaternion/qconv.py:546-613) already uses the CUDA
"Zhou separable CORRECTED" mixing signs — no patch needed.

The ONLY documented deviation is the final norm extraction: the reference
flattens component-major and takes norms over groups of 4 consecutive flat
elements (quaternion_models.py:62-66), mixing features of one component
instead of the four components of one feature. We norm over the true
quaternion axis (classification/models.py docstring). The classifier itself
is still compared exactly by feeding the torch QDense the component-major
layout its quarter-split logic assumes.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = Path("/root/reference/classification")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference checkout unavailable")


def _randomize_bn(tm, seed):
    """Perturb BN affine + running stats so the [C,4]<->[4,C] transposes are
    actually exercised (defaults are ones/zeros)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for mod in tm.modules():
            if hasattr(mod, "running_mean") and hasattr(mod, "gamma"):
                mod.running_mean.normal_(0.0, 0.05, generator=g)
                mod.running_var.uniform_(0.8, 1.2, generator=g)
                mod.gamma.uniform_(0.8, 1.2, generator=g)
                mod.beta.normal_(0.0, 0.05, generator=g)


@pytest.fixture(scope="module")
def cls_pair():
    sys.path.insert(0, str(REF))
    from models.quaternion_models import create_qwrn_16_2

    tm = create_qwrn_16_2(num_classes=10, mapping_type="poincare")
    tm.eval()
    # perturb BN affine + running stats so the [C,4]<->[4,C] transposes are
    # actually exercised (defaults are ones/zeros)
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for mod in tm.modules():
            if hasattr(mod, "running_mean") and hasattr(mod, "gamma"):
                mod.running_mean.normal_(0.0, 0.05, generator=g)
                mod.running_var.uniform_(0.8, 1.2, generator=g)
                mod.gamma.uniform_(0.8, 1.2, generator=g)
                mod.beta.normal_(0.0, 0.05, generator=g)

    import jax
    import jax.numpy as jnp

    from quan_ultralytics_tpu.classification.models import create_model

    jm = create_model("qwrn16_2", 10)
    variables = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                        train=False)
    from quan_ultralytics_tpu.utils.torch_port import port_cls_torch_model
    ported = port_cls_torch_model(tm, variables)
    return tm, jm, ported


def _to_bhwqc(t):
    """Reference BCHWQ [B, C, H, W, 4] -> our BHWQC."""
    return t.detach().cpu().numpy().transpose(0, 2, 3, 4, 1)


def test_qwrn_param_count_matches(cls_pair):
    import jax

    tm, jm, ported = cls_pair
    n_torch = sum(p.numel() for p in tm.parameters())
    n_ours = sum(x.size for x in jax.tree_util.tree_leaves(ported["params"]))
    assert n_torch == n_ours == 175604


def test_qwrn_backbone_parity(cls_pair):
    """conv1, each stage, and the pooled pre-classifier quaternion features
    agree with the ported reference in eval mode."""
    import jax.numpy as jnp

    tm, jm, ported = cls_pair
    rng = np.random.RandomState(3)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))

    with torch.no_grad():
        t1 = tm.conv1(tx)
        ts1 = tm.stage1(t1)
        ts2 = tm.stage2(ts1)
        ts3 = tm.stage3(ts2)
        tf = tm.avgpool(tm.silu(tm.bn(ts3)))  # [B, C, 1, 1, 4]

    _, inter = jm.apply(
        ported, jnp.asarray(x), train=False, mutable=[],
        capture_intermediates=lambda mdl, fn: fn == "__call__")
    caps = inter["intermediates"]

    def got(name):
        return np.asarray(caps[name]["__call__"][0])

    np.testing.assert_allclose(got("conv1"), _to_bhwqc(t1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got("stage1_block1"), _to_bhwqc(ts1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got("stage3_block1"), _to_bhwqc(ts3),
                               rtol=1e-3, atol=1e-3)
    # pooled features: silu(bn(stage3)) mean over H, W -> [B, 4, C]
    bn_out = got("bn")
    ours_f = (bn_out * (1.0 / (1.0 + np.exp(-bn_out)))).mean(axis=(1, 2))
    ref_f = tf.numpy()[:, :, 0, 0, :].transpose(0, 2, 1)  # [B, 4, C]
    np.testing.assert_allclose(ours_f, ref_f, rtol=1e-3, atol=1e-4)


def test_qdense_classifier_parity(cls_pair):
    """Our QDense == the reference QDense when the latter is fed the
    component-major flat layout its quarter-split assumes (the reference
    model instead feeds it c-major — the documented norm-layout bug)."""
    import jax.numpy as jnp

    from quan_ultralytics_tpu.models.conv import QDense

    tm, jm, ported = cls_pair
    tq = tm.classifier[1]
    C = 32  # WRN-16-2 stage3 = 64*k = 128 total quaternion channels -> 32/component
    rng = np.random.RandomState(5)
    f = rng.randn(3, 4, C).astype(np.float32)  # [B, 4(q), C]

    with torch.no_grad():
        tout = tq(torch.from_numpy(f.reshape(3, 4 * C)))  # q-major flat
    ref = tout.numpy().reshape(3, 4, 10)  # stacked [out_r..out_k] q-major

    qd = QDense(4 * C, 40, mapping_type="poincare")
    got = qd.apply({"params": ported["params"]["classifier"]}, jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_qresnet18_full_parity():
    """QResNet-18 (raw-input-shortcut QuaternionBasicBlock + 2-layer QDense
    head, reference quaternion_models.py:336-412): ported backbone matches,
    and the FULL logits match when the reference head is evaluated with the
    component-major layout its quarter-splits assume."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(REF))
    from models.quaternion_models import create_qrn_18

    from quan_ultralytics_tpu.classification.models import create_model
    from quan_ultralytics_tpu.utils.torch_port import port_cls_torch_model

    tm = create_qrn_18(num_classes=10, drop_rate=0.0, mapping_type="poincare")
    tm.eval()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for mod in tm.modules():
            if hasattr(mod, "running_mean") and hasattr(mod, "gamma"):
                mod.running_mean.normal_(0.0, 0.05, generator=g)
                mod.running_var.uniform_(0.8, 1.2, generator=g)
                mod.gamma.uniform_(0.8, 1.2, generator=g)
                mod.beta.normal_(0.0, 0.05, generator=g)

    jm = create_model("qrn18", 10, drop_rate=0.0)
    variables = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                        train=False)
    ported = port_cls_torch_model(tm, variables)

    n_torch = sum(q.numel() for q in tm.parameters())
    n_ours = sum(x.size for x in jax.tree_util.tree_leaves(ported["params"]))
    assert n_torch == n_ours

    rng = np.random.RandomState(7)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        h = tm.conv1(tx)
        s3 = tm.stage3(tm.stage2(tm.stage1(h)))
        pooled = tm.avg_pool(s3)  # [B, C, 1, 1, 4]
        # component-major flatten (q*C + c): the layout the QDense
        # quarter-split logic assumes
        fq = pooled[:, :, 0, 0, :].permute(0, 2, 1).reshape(2, -1)
        z = torch.nn.functional.silu(tm.classifier[1](fq))
        o = tm.classifier[3](z)  # q-major flat [B, 4*10]
        ref_logits = torch.linalg.norm(o.view(2, 4, 10), dim=1).numpy()

    got_logits, inter = jm.apply(
        ported, jnp.asarray(x), train=False, mutable=[],
        capture_intermediates=lambda mdl, fn: fn == "__call__")
    s3_ours = np.asarray(inter["intermediates"]["stage3_block1"]["__call__"][0])
    np.testing.assert_allclose(s3_ours, _to_bhwqc(s3), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_logits), ref_logits,
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("arch,ref_factory,family", [
    ("qrn34_imagenet", "create_qrn34_imagenet", None),       # auto-detected
    ("qrn18_i", "create_qrn18_imagenet", None),
    ("qwrn50_2", "create_qwrn_50_2_imagenet", "imagenet_wrn"),
    ("qwrn16_4i", "create_qwrn16_4_imagenet", "imagenet_wrn"),
])
def test_imagenet_variant_full_parity(arch, ref_factory, family):
    """ImageNet variants (reference quaternion_models.py:173-333): ported
    full logits match at a small input (64px; both graphs are global-pooled
    so the spatial size is free), with the corrected-layout head."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(REF))
    import models.quaternion_models as qm

    from quan_ultralytics_tpu.classification.models import create_model
    from quan_ultralytics_tpu.utils.torch_port import port_cls_torch_model

    nc = 10  # small head keeps the test light; widths stay the real ones
    tm = getattr(qm, ref_factory)(num_classes=nc, mapping_type="poincare")
    tm.eval()
    _randomize_bn(tm, 2)

    jm = create_model(arch, nc, drop_rate=0.0)
    variables = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        train=False)
    ported = port_cls_torch_model(tm, variables, family=family)

    n_torch = sum(p.numel() for p in tm.parameters())
    n_ours = sum(x.size for x in jax.tree_util.tree_leaves(ported["params"]))
    assert n_torch == n_ours

    rng = np.random.RandomState(9)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        h = tm.maxpool(tm.conv1(tx))
        for i in (1, 2, 3, 4):  # QWRN16_4I has three stages, the rest four
            stage = getattr(tm, f"stage{i}", None)
            if stage is not None:
                h = stage(h)
        pooled = tm.avg_pool(h)  # [B, C, 1, 1, 4]
        fq = pooled[:, :, 0, 0, :].permute(0, 2, 1).reshape(2, -1)  # q-major
        qdense = tm.classifier[-1]
        o = qdense(fq)
        ref_logits = torch.linalg.norm(o.view(2, 4, nc), dim=1).numpy()

    got_logits = jm.apply(ported, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got_logits), ref_logits,
                               rtol=2e-3, atol=2e-4)
