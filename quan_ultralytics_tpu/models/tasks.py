"""YAML -> flax model compiler and task models.

Re-implements the reference `parse_model` channel bookkeeping
(ultralytics/nn/tasks.py:942-1098) for the module set the QUAN YAMLs use,
producing a static layer spec that a single flax module walks — the
skip-connection save-list graph walk of `BaseModel._predict_once`
(tasks.py:140-167) becomes a plain Python loop under `nn.compact` (traced
once, compiled by XLA).

Strides are derived analytically while parsing (cumulative stride per layer)
instead of the reference's dry forward probe (tasks.py:332-346).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import yaml

from quan_ultralytics_tpu.models import block as B
from quan_ultralytics_tpu.models import conv as C
from quan_ultralytics_tpu.models import head as H

CFG_DIR = Path(__file__).resolve().parent.parent / "cfg" / "models"

SCALE_RE = re.compile(r"yolo\d+([nslmx])")


def make_divisible(x: float, divisor: int = 8) -> int:
    """Round up to the nearest multiple (reference utils/ops.py make_divisible)."""
    return math.ceil(x / divisor) * divisor


@dataclass(frozen=True)
class LayerSpec:
    i: int
    f: Tuple[int, ...]  # input layer indices (-1 = previous); singleton for most
    module: str
    args: Tuple[Any, ...]
    n: int  # repeats (absorbed into module args for CSP blocks)
    c2: int  # output channels (total quaternion space)
    stride: int  # cumulative stride of the output


# Modules that take (c1, c2, ...) and get width scaling on args[0].
_CONV_LIKE = {"Conv", "DWConv", "Bottleneck", "QSPPF", "C2f", "C3", "C3k",
              "C3k2", "QC3k2", "QC2PSA", "QPSA", "Classify"}
# CSP-style modules that absorb the repeat count as arg index 2.
_ABSORB_N = {"C2f", "C3", "C3k", "C3k2", "QC3k2", "QC2PSA"}
_HEADS = {"Detect", "OBB", "HybridDetect", "Segment", "Pose"}


def resolve_model_cfg(model: str) -> Tuple[Dict, str]:
    """Resolve 'yolo11n-obb-quan.yaml' (or a path) to (cfg dict, scale char).

    Mirrors the reference naming convention: the scale letter follows the
    architecture number ('yolo11n-...' -> scale 'n', base file
    'yolo11-...yaml')."""
    name = Path(model).name
    m = SCALE_RE.search(name)
    scale = m.group(1) if m else ""
    base = re.sub(r"(yolo\d+)[nslmx]", r"\1", name)
    path = Path(model) if Path(model).exists() else CFG_DIR / base
    if not path.exists():
        raise FileNotFoundError(f"model config {model!r} not found (looked at {path})")
    with open(path) as fh:
        cfg = yaml.safe_load(fh)
    if not scale:
        scale = next(iter(cfg.get("scales", {"n": None})))
    return cfg, scale


def parse_model(cfg: Dict, scale: str, nc: Optional[int] = None) -> Tuple[List[LayerSpec], List[int], int]:
    """Compile a model YAML into layer specs.

    Returns (specs, save_list, nc). Channel arithmetic matches reference
    tasks.py:1016 (`make_divisible(min(c2, max_channels) * width, 8)`),
    depth scaling tasks.py:969 (`max(round(n * depth), 1)`), and the
    C3k2 m/l/x rule tasks.py:1045-1048.
    """
    nc = nc if nc is not None else cfg.get("nc", 80)
    depth, width, max_channels = cfg["scales"][scale]
    # ch[i] / strides[i] refer to layer i's output; layer 0 reads the RGB
    # input (3 ch, stride 1). Mirrors the reference's `if i == 0: ch = []`
    # reset (tasks.py:1094-1097).
    ch: List[int] = []
    strides: List[int] = []
    specs: List[LayerSpec] = []
    save: List[int] = []

    for i, (f, n, m, args) in enumerate(cfg["backbone"] + cfg["head"]):
        args = [nc if a == "nc" else a for a in args]
        n_scaled = max(round(n * depth), 1) if n > 1 else n
        fs = tuple(f) if isinstance(f, list) else (f,)
        in_ch = [ch[x] if (x != -1 or ch) else 3 for x in fs]
        in_stride = [strides[x] if (x != -1 or strides) else 1 for x in fs]

        if m in _CONV_LIKE:
            c1, c2 = in_ch[0], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            margs: List[Any] = [c1, c2, *args[1:]]
            if m in _ABSORB_N:
                margs.insert(2, n_scaled)
                n_scaled = 1
            if m == "C3k2" and scale in "mlx":
                margs[3] = True
            stride = in_stride[0] * (2 if m in {"Conv", "DWConv"} and len(margs) > 3 and margs[3] == 2 else 1)
        elif m == "QUpsample":
            c2 = in_ch[0]
            margs = list(args)
            stride = in_stride[0] // int(args[0])
        elif m == "Concat":
            c2 = sum(in_ch)
            margs = []
            stride = in_stride[0]
        elif m in _HEADS:
            if m == "Segment":
                # width-scale the proto channels (reference tasks.py:1080)
                args[2] = make_divisible(min(args[2], max_channels) * width, 8)
            margs = [*args, tuple(in_ch), tuple(in_stride)]
            c2 = 0
            stride = in_stride[0]
        else:
            raise ValueError(f"unsupported module {m!r} in model YAML")

        specs.append(LayerSpec(i, fs, m, tuple(margs), n_scaled, c2, stride))
        save.extend(x % i for x in fs if x != -1)
        ch.append(c2)
        strides.append(stride)

    return specs, sorted(set(save)), nc


class QUANYOLO(nn.Module):
    """The full YOLO graph compiled from a layer-spec tuple.

    Returns the head output: for Detect a list of per-level maps
    ``[B, H, W, 4*reg_max + nc]``; for OBB a (feats, angles) pair.
    """

    specs: Tuple[LayerSpec, ...]
    save: Tuple[int, ...]
    dtype: Any = None
    mapping_type: str = "poincare"
    remat: bool = False  # rematerialize CSP blocks: trade FLOPs for HBM
    # (jax.checkpoint analog of activation checkpointing; enables big imgsz
    # or batch on 16GB v5e HBM)
    stem_s2d: bool = True  # phase-composite stem (ops/stem.py): identical
    # math, ~identical params, avoids lane-padded narrow stem activations —
    # the stem was 45% of forward time at 1024px without it
    stem_deep: int = 0  # deep phase packing level K (bool-compatible:
    # True==1). K=1: layers 0-3 (stem + first C3k2 + the P3 downsample
    # conv) run entirely on the packed coarse grid (expand_w_packed),
    # eliminating the pack/unpack layout-flip copies the two-layer stem
    # leaves at the 256-grid (~12 ms/iter @1024 b16 profiled). K>=2: extend
    # through layer 2K's C3k2 (the backbone alternates Conv(3,2)/C3k2;
    # layer 2K+1 unpacks, saved neck taps are depth-to-spaced once) —
    # targets the residual narrow-grid W-minor<->C-minor flip copies.
    # Clamped to what the graph structure supports.
    # Identical math and params; overrides stem_s2d when the prefix matches.
    capture: bool = False  # sow per-layer outputs into the "intermediates"
    # collection (reference nn/tasks.py:140 _predict_once visualize/embed);
    # read back with apply(..., mutable=["intermediates"]).

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        saved: Dict[int, jnp.ndarray] = {}
        y = x
        out = None
        C3k2_cls = nn.remat(B.C3k2, static_argnums=(2,)) if self.remat else B.C3k2
        QC2PSA_cls = nn.remat(B.QC2PSA, static_argnums=(2,)) if self.remat else B.QC2PSA
        # deep phase packing: layers 0..3 must be Conv/Conv/C3k2/Conv (k=3,
        # s=2 convs), with no save-list reference into the packed region
        deep_ok = (
            bool(self.stem_deep) and len(self.specs) > 3
            and not any(i in self.save for i in (0, 1, 2))
            and all(self.specs[i].module == "Conv" and self.specs[i].args[2:4] == (3, 2)
                    for i in (0, 1, 3))
            and self.specs[2].module in ("C3k2", "QC3k2")
        )
        # level K >= 2 (QUAN_STEM_DEEP=K): extend the packed region through
        # layer 2K's C3k2 — the backbone alternates Conv(3,2)/C3k2, so level
        # K covers layers 0..2K+1 (C3k2s at 2,4,..,2K; the conv at 2K+1
        # unpacks). Narrow stride-2^(k+1) tensors never materialize between
        # the packed layers (the W-minor<->C-minor flip copies in the
        # b24/b128 profiles); C3k2 outputs the neck taps (save list) are
        # depth-to-spaced ONCE instead. Math-identical (tests/test_stem.py).
        deep_K = 0
        if deep_ok:
            deep_K = 1
            while deep_K < int(self.stem_deep):
                i_c3, i_cv = 2 * (deep_K + 1), 2 * (deep_K + 1) + 1
                if (len(self.specs) > i_cv
                        and (i_c3 - 1) not in self.save
                        and self.specs[i_c3].module in ("C3k2", "QC3k2")
                        and self.specs[i_cv].module == "Conv"
                        and self.specs[i_cv].args[2:4] == (3, 2)):
                    deep_K += 1
                else:
                    break
        for spec in self.specs:
            inputs = [y if j == -1 else saved[j] for j in spec.f]
            name = f"model_{spec.i}"
            m, a = spec.module, spec.args
            packed_out = None  # layout of this layer's OUTPUT when the
            # packed stem flows through it: 'cmajor' (expand_w_packed) or
            # 'phase' (phase-composite layer 0); sown/captured features are
            # unpacked to the public [B,H,W,4,C] form below
            if m == "Conv":
                stem_mode = None
                packed = None
                if deep_K and spec.i == 0:
                    packed = "out"
                    packed_out = "cmajor"
                elif deep_K and spec.i % 2 == 1 and spec.i <= 2 * deep_K - 1:
                    packed = "both"
                    packed_out = "cmajor"
                elif deep_K and spec.i == 2 * deep_K + 1:
                    packed = "in"
                else:
                    # packed layout must stay strictly between layers 0 and 1
                    stem_ok = (
                        self.stem_s2d and 0 not in self.save
                        and len(self.specs) > 1
                        and self.specs[0].module == "Conv" and self.specs[1].module == "Conv"
                        and self.specs[0].args[2:4] == (3, 2) and self.specs[1].args[2:4] == (3, 2)
                    )
                    if stem_ok and spec.i in (0, 1):
                        stem_mode = "phase_out" if spec.i == 0 else "phase_in"
                        if spec.i == 0:
                            packed_out = "phase"
                y = C.Conv(*a, mapping_type=self.mapping_type, dtype=self.dtype,
                           stem_mode=stem_mode, packed=packed, name=name)(inputs[0], train)
            elif m == "DWConv":
                y = C.DWConv(*a, dtype=self.dtype, name=name)(inputs[0], train)
            elif m in ("C3k2", "QC3k2"):
                pk = bool(deep_K) and spec.i % 2 == 0 and spec.i <= 2 * deep_K
                if pk:
                    packed_out = "cmajor"
                y = C3k2_cls(*a, dtype=self.dtype, packed=pk,
                             name=name)(inputs[0], train)
            elif m == "C2f":
                y = B.C2f(*a, dtype=self.dtype, name=name)(inputs[0], train)
            elif m == "QSPPF":
                y = B.QSPPF(*a, dtype=self.dtype, name=name)(inputs[0], train)
            elif m == "QC2PSA":
                y = QC2PSA_cls(*a, dtype=self.dtype, name=name)(inputs[0], train)
            elif m == "QPSA":
                y = B.QPSA(*a, dtype=self.dtype, name=name)(inputs[0], train)
            elif m == "QUpsample":
                y = C.QUpsample(int(a[0]), str(a[1]) if len(a) > 1 else "nearest", name=name)(inputs[0])
            elif m == "Concat":
                y = B.qconcat(inputs)
            elif m == "Detect":
                nc, ch, strides = a
                y = H.Detect(nc, ch, strides, dtype=self.dtype, name=name)(inputs, train)
                out = y
            elif m == "HybridDetect":
                nc, ch, strides = a
                y = H.HybridDetect(nc, ch, strides, dtype=self.dtype, name=name)(inputs, train)
                out = y
            elif m == "OBB":
                nc, ne, ch, strides = a
                y = H.OBB(nc, ch, ne, strides, dtype=self.dtype, name=name)(inputs, train)
                out = y
            elif m == "Segment":
                nc, nm, npr, ch, strides = a
                y = H.Segment(nc, ch, nm, npr, strides, dtype=self.dtype, name=name)(inputs, train)
                out = y
            elif m == "Pose":
                nc, kpt_shape, ch, strides = a
                y = H.Pose(nc, ch, tuple(kpt_shape), strides, dtype=self.dtype, name=name)(inputs, train)
                out = y
            elif m == "Classify":
                y = H.Classify(*a, dtype=self.dtype, name=name)(inputs[0], train)
                out = y
            else:  # pragma: no cover
                raise ValueError(f"unknown module {m}")
            if self.capture and isinstance(y, jnp.ndarray):
                fy = y
                if packed_out == "cmajor":
                    from quan_ultralytics_tpu.ops.stem import depth_to_space_cmajor

                    fy = depth_to_space_cmajor(y)
                elif packed_out == "phase":
                    from quan_ultralytics_tpu.ops.stem import depth_to_space_phasemajor

                    fy = depth_to_space_phasemajor(y)
                # distinct from the submodule scope name (flax forbids reuse)
                self.sow("intermediates", f"feat_{spec.i}", fy)
            if spec.i in self.save:
                if packed_out == "cmajor":
                    # the packed form flows on to the next backbone layer;
                    # the neck consumes the standard layout via one
                    # depth-to-space
                    from quan_ultralytics_tpu.ops.stem import depth_to_space_cmajor

                    saved[spec.i] = depth_to_space_cmajor(y)
                else:
                    saved[spec.i] = y
        # head output if present; else the last layer's tensor (lets graph
        # prefixes run for profiling, utils/profiler.profile_layers)
        return out if out is not None else y


@dataclass
class DetectionModel:
    """Task model facade: builds the flax module + static metadata.

    Analog of reference nn/tasks.py DetectionModel (:308) / OBBModel (:400),
    minus nn.Module state — params live in an external pytree (JAX-style).
    """

    cfg: Dict
    scale: str
    nc: int
    task: str  # "detect" | "obb"
    module: QUANYOLO
    specs: List[LayerSpec]
    strides: Tuple[int, ...]
    reg_max: int = 16
    mapping_type: str = "poincare"

    @classmethod
    def from_yaml(cls, model: str, nc: Optional[int] = None, dtype: Any = None,
                  mapping_type: str = "poincare", remat: bool = False) -> "DetectionModel":
        cfg, scale = resolve_model_cfg(model)
        specs, save, nc_ = parse_model(cfg, scale, nc)
        head = specs[-1]
        task = {"OBB": "obb", "Classify": "classify", "Segment": "segment",
                "Pose": "pose"}.get(head.module, "detect")
        strides = () if task == "classify" else head.args[-1]
        import os

        module = QUANYOLO(tuple(specs), tuple(save), dtype=dtype,
                          mapping_type=mapping_type, remat=remat,
                          stem_s2d=os.environ.get("QUAN_STEM_S2D", "1") != "0",
                          stem_deep=int(os.environ.get("QUAN_STEM_DEEP", "0") or 0))
        return cls(cfg, scale, nc_, task, module, specs, strides, mapping_type=mapping_type)

    def init(self, rng, imgsz: int = 64):
        x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
        return self.module.init(rng, x, train=False)

    def apply(self, variables, x, train: bool = False, mutable=False, rngs=None):
        return self.module.apply(variables, x, train=train, mutable=mutable, rngs=rngs)

    def features(self, variables, x, layers=None):
        """Per-layer feature maps (reference nn/tasks.py:140 `_predict_once`
        with visualize/embed): returns ``(head_out, {layer_i: tensor})`` for
        every layer whose output is a plain tensor (heads return tuples and
        are skipped, like the reference's embed path stops before the head).
        ``layers``: optional iterable of layer indices to keep."""
        mod = self.module.clone(capture=True)
        out, st = mod.apply(variables, x, train=False, mutable=["intermediates"])
        feats = {int(k.rsplit("_", 1)[1]): v[0]
                 for k, v in st["intermediates"].items()}
        if layers is not None:
            feats = {int(i): feats[int(i)] for i in layers}
        return out, feats

    def decode(self, out):
        """Head output -> [B, A, ...] predictions in input-pixel units."""
        if self.task == "obb":
            feats, angles = out
            return H.decode_obb(feats, angles, self.strides, self.nc, self.reg_max)
        if self.task == "segment":
            feats, mc, proto = out
            return H.decode_segment(feats, mc, self.strides, self.nc, self.reg_max)
        if self.task == "pose":
            feats, kpts = out
            kpt_shape = tuple(self.specs[-1].args[1])
            return H.decode_pose(feats, kpts, self.strides, self.nc, kpt_shape, self.reg_max)
        return H.decode_detect(out, self.strides, self.nc, self.reg_max)

    def info(self, variables=None, imgsz: int = 640, log=print):
        """Layer table + params/GFLOPs summary (reference model_info,
        torch_utils.py:299, and parse_model's build log)."""
        log(f"{'':>3}{'from':>14}{'n':>3}  {'module':<14}{'args'}")
        for s in self.specs:
            log(f"{s.i:>3}{str(list(s.f)):>14}{s.n:>3}  {s.module:<14}{list(s.args)}")
        if variables is not None:
            from quan_ultralytics_tpu.utils.profiler import summary

            info = summary(self, variables, imgsz)
            log(f"{self.scale}-scale {self.task}: {info['params']:,} params, "
                f"~{info['approx_conv_gflops']:.1f} conv GFLOPs @ {imgsz}px")
            return info
