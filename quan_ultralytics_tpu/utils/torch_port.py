"""Port PyTorch-reference QUAN weights into this framework's pytrees.

Lets a user bring a trained reference checkpoint (bryceag11/QUAN_ultralytics,
torch state_dict naming) into the JAX model: `port_state_dict(sd, variables)`
returns variables with every leaf replaced by the reference tensor,
layout-transposed for our BHWQC/HWIO conventions.

Name mapping (verified leaf-for-leaf in tests/test_parity.py):
    model.23.cv3.0.0.0.conv.weight_r  <-  model_23/detect/cv3_0_0a/conv/w[0]
    model.10.m.0.attn.qkv.weight_i    <-  model_10/m0/attn/qkv/w[1]
    ...bn.gamma [C, 4]                <-  .../bn/gamma [4, C] (transposed)
    ...2.output_proj.weight (QER)     <-  .../proj/kernel (OIHW->HWIO + the
                                          quaternion-flatten reorder: torch
                                          flattens [C,4] c-major
                                          (head.py:46 permute+view), we
                                          flatten [4,C] q-major)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def torch_prefix(tokens) -> str:
    """Flax path tokens -> torch module path (see module docstring)."""
    out = []
    for t in tokens:
        if t == "detect":
            continue  # flax nests OBB's Detect; torch OBB subclasses Detect
        m = re.fullmatch(r"model_(\d+)", t)
        if m:
            out.append(f"model.{m.group(1)}")
            continue
        m = re.fullmatch(r"(m|ffn)(\d+)", t)
        if m:
            out.append(f"{m.group(1)}.{m.group(2)}")
            continue
        m = re.fullmatch(r"(cv\d)((?:_\d+)+)([ab]?)", t)
        if m:
            s = m.group(1) + m.group(2).replace("_", ".")
            if m.group(3):
                s += "." + ("0" if m.group(3) == "a" else "1")
            out.append(s)
            continue
        out.append(t)
    return ".".join(out)


def _qer_input_reorder(w_hwio: np.ndarray) -> np.ndarray:
    """Reorder a QER kernel's input dim from torch's c-major quaternion
    flatten (index c*4+q) to our q-major flatten (index q*C+c)."""
    cin = w_hwio.shape[2] // 4
    idx = np.arange(w_hwio.shape[2]).reshape(cin, 4).T.reshape(-1)
    return w_hwio[:, :, idx, :]


def port_state_dict(sd: Mapping[str, np.ndarray], variables: Dict[str, Any]) -> Dict[str, Any]:
    """Return `variables` with every leaf replaced from the torch state_dict.

    Args:
      sd: name -> numpy array (params AND buffers of the reference model).
      variables: our model's {params, batch_stats} pytree (shapes/tree used
        as the target spec).
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    def fetch(name):
        assert name in sd, f"torch param {name!r} not found in state_dict"
        return np.asarray(sd[name])

    out = {}
    for coll, tree in variables.items():
        flat = flatten_dict(tree)
        ported = {}
        for path, leaf in flat.items():
            parent, name = path[:-1], path[-1]
            prefix = torch_prefix(parent)
            if name == "w":  # QConv2D [4, kH, kW, Cin/g, Cout] <- 4x OIHW
                v = np.stack([fetch(f"{prefix}.weight_{c}").transpose(2, 3, 1, 0)
                              for c in "rijk"])
            elif name == "b":
                v = fetch(f"{prefix}.bias_r")
            elif name == "kernel":  # QER/QERPreserve real conv
                v = _qer_input_reorder(
                    fetch(f"{torch_prefix(parent[:-1])}.output_proj.weight").transpose(2, 3, 1, 0)
                    if f"{torch_prefix(parent[:-1])}.output_proj.weight" in sd
                    else fetch(f"{torch_prefix(parent[:-1])}.mix.weight").transpose(2, 3, 1, 0)
                )
            elif name == "bias" and parent and parent[-1] in ("proj", "mix"):
                # torch QER aliases the proj bias as its own `.bias` attribute
                # (head.py:39), which wins name dedup in named_parameters
                base = torch_prefix(parent[:-1])
                for cand in (f"{base}.bias", f"{base}.output_proj.bias", f"{base}.mix.bias"):
                    if cand in sd:
                        v = fetch(cand)
                        break
                else:  # pragma: no cover
                    raise AssertionError(f"no torch bias for {path}")
            elif name in ("gamma", "beta", "weight", "bias"):  # IQBN/IQLN affine
                v = fetch(f"{prefix}.{name}").T
            elif name in ("mean", "var"):  # IQBN running stats
                v = fetch(f"{prefix}.running_{name}").T
            else:  # pragma: no cover
                raise AssertionError(f"unmapped flax leaf {path}")
            assert v.shape == leaf.shape, (path, v.shape, leaf.shape)
            ported[path] = np.asarray(v, np.float32)
        out[coll] = unflatten_dict(ported)
    return out


def port_torch_model(torch_model, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Convenience: port directly from a live torch module."""
    sd = {n: p.detach().cpu().numpy() for n, p in torch_model.named_parameters()}
    sd.update({n: b.detach().cpu().numpy() for n, b in torch_model.named_buffers()})
    return port_state_dict(sd, variables)


# ---------------------------------------------------------------------------
# Classification stack (reference classification/models/quaternion_models.py)
# ---------------------------------------------------------------------------

def _cls_prefix(parent, family: str) -> str:
    """Flax path -> torch module path for the classification families.

    wrn_cifar       (QWideResNet):     stage{s}_block{b} -> stage{s}.layer.{b};
                    classifier -> classifier.1 (Sequential(Flatten, QDense)).
    resnet_cifar    (QResNetCIFAR):    stem_conv/stem_bn -> conv1.0/conv1.1;
                    stage{s}_block{b} -> stage{s}.{b};
                    fc1/fc2 -> classifier.1/classifier.3.
    imagenet_resnet (QResNetImageNet): like resnet_cifar but the single
                    classifier -> classifier.2 (Sequential(Flatten, Dropout,
                    QDense), reference quaternion_models.py:204-209).
    imagenet_wrn    (QWideResNetImageNet): like imagenet_resnet but stages
                    nest as stage{s}.layer.{b} (QWideResNetBlock).
    Verified weight-for-weight in tests/test_cls_parity.py.
    """
    layered = family in ("wrn_cifar", "imagenet_wrn")
    out = []
    for t in parent:
        m = re.fullmatch(r"stage(\d+)_block(\d+)", t)
        if m:
            s, b = m.groups()
            out.append(f"stage{s}.layer.{b}" if layered else f"stage{s}.{b}")
        elif t == "stem_conv":
            out.append("conv1.0")
        elif t == "stem_bn":
            out.append("conv1.1")
        elif t == "classifier":
            out.append("classifier.1" if family == "wrn_cifar" else "classifier.2")
        elif t == "fc1":
            out.append("classifier.1")
        elif t == "fc2":
            out.append("classifier.3")
        else:
            out.append(t)
    return ".".join(out)


def port_cls_state_dict(sd: Mapping[str, np.ndarray], variables: Dict[str, Any],
                        family: str = None) -> Dict[str, Any]:
    """Port a reference CLASSIFICATION state_dict (Q-WRN / Q-ResNet families)
    into our flax pytree. Covers QConv2D (4x OIHW -> [4,kh,kw,ci,co]), IQBN
    ([C,4] -> [4,C]), and QDense (4x nn.Linear -> w [4,fi,fo], b [4,fo]).

    family: one of _cls_prefix's families; auto-detected from the variables
    tree when None — pass "imagenet_wrn" explicitly for QWRN-50-2 (its param
    tree is indistinguishable from the ImageNet QResNet's)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    def fetch(name):
        assert name in sd, f"torch param {name!r} not found in state_dict"
        return np.asarray(sd[name])

    params = variables.get("params", {})
    if family is None:
        if "fc1" in params:
            family = "resnet_cifar"
        elif "stem_conv" in params:
            family = "imagenet_resnet"
        else:
            family = "wrn_cifar"
    out = {}
    for coll, tree in variables.items():
        flat = flatten_dict(tree)
        ported = {}
        for path, leaf in flat.items():
            parent, name = path[:-1], path[-1]
            prefix = _cls_prefix(parent, family)
            dense = parent and parent[-1] in ("classifier", "fc1", "fc2")
            if dense and name == "w":
                v = np.stack([fetch(f"{prefix}.linear_r{c}.weight").T for c in "rijk"])
            elif dense and name == "b":
                v = np.stack([fetch(f"{prefix}.linear_r{c}.bias") for c in "rijk"])
            elif name == "w":
                v = np.stack([fetch(f"{prefix}.weight_{c}").transpose(2, 3, 1, 0)
                              for c in "rijk"])
            elif name == "b":
                v = fetch(f"{prefix}.bias_r")
            elif name in ("gamma", "beta"):
                v = fetch(f"{prefix}.{name}").T
            elif name in ("mean", "var"):
                v = fetch(f"{prefix}.running_{name}").T
            else:  # pragma: no cover
                raise AssertionError(f"unmapped flax leaf {path}")
            assert v.shape == leaf.shape, (path, v.shape, leaf.shape)
            ported[path] = np.asarray(v, np.float32)
        out[coll] = unflatten_dict(ported)
    return out


def port_cls_torch_model(torch_model, variables: Dict[str, Any],
                         family: str = None) -> Dict[str, Any]:
    """Convenience: port a live reference classification module."""
    sd = {n: p.detach().cpu().numpy() for n, p in torch_model.named_parameters()}
    sd.update({n: b.detach().cpu().numpy() for n, b in torch_model.named_buffers()})
    return port_cls_state_dict(sd, variables, family=family)
