"""Shared machinery for loading the patched torch reference model.

Used by tests/test_parity.py (fixtures) and scripts/convergence_map_ab.py
(two-sided mAP convergence A/B). Imports the reference ultralytics from
/root/reference on CPU with its absent deps stubbed (torchvision/thop/test +
a fake torchvision dist-info so ultralytics' version check passes), and
patches the reference QConv2D forward to the CUDA kernel's mixing semantics
(quaternion_ops.cu:42-181) — the reference's own torch fallback uses
different signs (conv.py:487-496) and the CUDA matrix is ground truth.
"""

from __future__ import annotations

import sys
import tempfile
import types
from pathlib import Path

import numpy as np

REF = Path("/root/reference")


def load_patched_reference():
    """Import the reference ultralytics with stubs + the CUDA-mixing patch.

    Returns a namespace with .conv and .tasks modules. Idempotent: safe to
    call more than once in a process (the patch is re-applied, stubs kept).
    """
    import torch
    import torch.nn.functional as F

    stub_dir = Path(tempfile.mkdtemp(prefix="tvstub"))
    di = stub_dir / "torchvision-0.19.0.dist-info"
    di.mkdir(parents=True, exist_ok=True)
    (di / "METADATA").write_text(
        "Metadata-Version: 2.1\nName: torchvision\nVersion: 0.19.0\n")
    sys.path.insert(0, str(stub_dir))
    sys.path.insert(0, str(REF))
    for name in ("torchvision", "thop", "test"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__version__ = "0.19.0"
            sys.modules[name] = mod

    from ultralytics.nn.modules import conv as ref_conv
    from ultralytics.nn import tasks as ref_tasks

    def cuda_mixing_forward(self, x):
        """Reference QConv2D forward with the CUDA kernel's semantics
        (quaternion_ops.cu:42-181): input prep identical to the torch
        fallback (conv.py:421-440), then separable convs + the
        'Zhou separable CORRECTED' mixing (.cu:152-155) with bias_r added to
        s_r before mixing (.cu:87)."""
        if self.is_first_layer:
            x = self._rgb_to_quaternion(x)
        elif x.dim() == 4:
            B, C, H, W = x.shape
            x = x.view(B, C // 4, 4, H, W).permute(0, 1, 3, 4, 2)
        x = x.contiguous()
        kw = dict(stride=self.stride, padding=self.padding,
                  dilation=self.dilation, groups=self.groups)
        r = F.conv2d(x[..., 0], self.weight_r, self.bias_r, **kw)
        i = F.conv2d(x[..., 1], self.weight_i, None, **kw)
        j = F.conv2d(x[..., 2], self.weight_j, None, **kw)
        k = F.conv2d(x[..., 3], self.weight_k, None, **kw)
        out_r = r + i + j + k
        out_i = r - i - j + k
        out_j = r + i - j - k
        out_k = r - i + j - k
        return torch.stack([out_r, out_i, out_j, out_k], dim=-1)

    orig = getattr(ref_conv.QConv2D, "_orig_forward", ref_conv.QConv2D.forward)
    ref_conv.QConv2D._orig_forward = orig
    ref_conv.QConv2D.forward = cuda_mixing_forward
    return types.SimpleNamespace(conv=ref_conv, tasks=ref_tasks,
                                 unpatch=lambda: setattr(
                                     ref_conv.QConv2D, "forward", orig))


def randomize_stats(torch_model, seed=0):
    """Perturb BN affine + running stats so weight ports actually test the
    [C,4]<->[4,C] transposes (defaults are all-ones/zeros, which would pass
    under a transposed port too)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for mod in torch_model.modules():
            if hasattr(mod, "running_mean") and hasattr(mod, "gamma"):
                mod.running_mean.normal_(0.0, 0.05, generator=g)
                mod.running_var.uniform_(0.8, 1.2, generator=g)
                mod.gamma.uniform_(0.8, 1.2, generator=g)
                mod.beta.normal_(0.0, 0.05, generator=g)


def to_bhwqc(t):
    """Reference activation -> our BHWQC layout."""
    a = t.detach().cpu().numpy()
    if a.ndim == 5:  # [B, C, H, W, 4]
        return a.transpose(0, 2, 3, 4, 1)
    if a.ndim == 4:  # [B, 4C, H, W] channel-major (c*4+q, conv.py:430-434)
        B, C4, H, W = a.shape
        return a.reshape(B, C4 // 4, 4, H, W).transpose(0, 3, 4, 2, 1)
    raise AssertionError(a.shape)
