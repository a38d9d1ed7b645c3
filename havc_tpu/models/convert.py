"""Systematic torch-checkpoint -> flax-parameter conversion.

The five model families ship as PyTorch ``state_dict`` checkpoints
(reference loaders: deoldify/generators.py:19 ``learn.load``,
colormnet/model/network.py:161-208 shape-sniffed ``torch.load``,
deepex/__init__.py:242-253, remaster/remaster_render.py:112-120, Zhang
model-zoo URLs eccv16.py:101-108).  This module converts those state_dicts
into the NHWC flax parameter trees of :mod:`havc_tpu.models`.

Conversion rules (validated numerically against torch in
tests/test_models_zhang.py):

* ``Conv2d.weight``          (O,I,kH,kW)  -> kernel (kH,kW,I,O)
* ``ConvTranspose2d.weight`` (I,O,kH,kW)  -> kernel (kH,kW,O,I)
  (PtConvTranspose uses ``transpose_kernel=True`` + padding ``k-1-p``)
* ``Linear.weight``          (O,I)        -> kernel (I,O)
* ``BatchNorm2d``  weight/bias/running_mean/running_var ->
  scale/bias/mean/var of BatchNormInference

Checkpoints are loaded with ``torch.load(map_location='cpu')`` when torch
is importable; a pre-extracted ``{key: np.ndarray}`` dict works without
torch.  Run any converted model under
``jax.default_matmul_precision('highest')`` when bit-fidelity to the torch
reference matters (XLA's default conv/dot precision is reduced).
"""
from __future__ import annotations

from typing import Dict, Mapping, Sequence, Tuple

import numpy as np

__all__ = [
    "load_state_dict",
    "convert_params",
    "eccv16_key_map",
    "siggraph17_key_map",
]

# kind -> {torch suffix -> (flax leaf name, transform)}
_KIND_RULES = {
    "conv": {
        "weight": ("kernel", lambda t: np.transpose(t, (2, 3, 1, 0))),
        "bias": ("bias", lambda t: t),
    },
    "convt": {
        "weight": ("kernel", lambda t: np.transpose(t, (2, 3, 1, 0))),
        "bias": ("bias", lambda t: t),
    },
    "linear": {
        "weight": ("kernel", lambda t: np.transpose(t)),
        "bias": ("bias", lambda t: t),
    },
    "bn": {
        "weight": ("scale", lambda t: t),
        "bias": ("bias", lambda t: t),
        "running_mean": ("mean", lambda t: t),
        "running_var": ("var", lambda t: t),
    },
}


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into plain numpy arrays."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def _set_path(tree: dict, path: Tuple[str, ...], leaf: str, value: np.ndarray):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def convert_params(
    state_dict: Mapping[str, np.ndarray],
    key_map: Mapping[str, Tuple[Tuple[str, ...], str]],
    strict: bool = True,
) -> dict:
    """Build a flax ``{'params': ...}`` tree from a torch state_dict.

    ``key_map``: {torch module prefix -> (flax param path, kind)}.
    Unmapped torch keys are ignored (training-only branches); with
    ``strict`` every mapped prefix must find its tensors.
    """
    params: dict = {}
    for prefix, (path, kind) in key_map.items():
        rules = _KIND_RULES[kind]
        found = False
        for suffix, (leaf, tf) in rules.items():
            tk = f"{prefix}.{suffix}"
            if tk in state_dict:
                _set_path(params, path, leaf, np.asarray(tf(state_dict[tk])))
                found = True
            elif strict and suffix in ("weight",):
                raise KeyError(f"torch key not found: {tk}")
        if strict and not found:
            raise KeyError(f"no tensors found for prefix: {prefix}")
    return {"params": params}


# --- Zhang eccv16 / siggraph17 checkpoint layouts ---------------------------


def _conv_path(block: str, i: int) -> Tuple[str, ...]:
    return (block, f"conv{i}", "Conv_0")


def eccv16_key_map() -> dict:
    """Key map for colorization_release_v2 (ECCVGenerator)."""
    m = {}
    blocks = {"model1": 2, "model2": 2, "model3": 3, "model4": 3,
              "model5": 3, "model6": 3, "model7": 3}
    for name, n in blocks.items():
        for i in range(n):
            m[f"{name}.{2 * i}"] = (_conv_path(name, i), "conv")
        m[f"{name}.{2 * n}"] = ((name, "norm"), "bn")
    m["model8.0"] = (("model8_up", "ConvTranspose_0"), "convt")
    m["model8.2"] = (("model8_conv1", "Conv_0"), "conv")
    m["model8.4"] = (("model8_conv2", "Conv_0"), "conv")
    m["model8.6"] = (("model8_class", "Conv_0"), "conv")
    m["model_out"] = (("model_out", "Conv_0"), "conv")
    return m


def siggraph17_key_map() -> dict:
    """Key map for siggraph17-df00044c (SIGGRAPHGenerator); the training-only
    classification branch (model_class) is left unmapped."""
    m = {}
    enc = {"model1": 2, "model2": 2, "model3": 3, "model4": 3,
           "model5": 3, "model6": 3, "model7": 3}
    for name, n in enc.items():
        for i in range(n):
            m[f"{name}.{2 * i}"] = (_conv_path(name, i), "conv")
        m[f"{name}.{2 * n}"] = ((name, "norm"), "bn")
    m["model8up.0"] = (("model8_up", "ConvTranspose_0"), "convt")
    m["model3short8.0"] = (("model3short8", "Conv_0"), "conv")
    m["model8.1"] = (("model8_conv1", "Conv_0"), "conv")
    m["model8.3"] = (("model8_conv2", "Conv_0"), "conv")
    m["model8.5"] = (("model8_norm",), "bn")
    m["model9up.0"] = (("model9_up", "ConvTranspose_0"), "convt")
    m["model2short9.0"] = (("model2short9", "Conv_0"), "conv")
    m["model9.1"] = (("model9_conv1", "Conv_0"), "conv")
    m["model9.3"] = (("model9_norm",), "bn")
    m["model10up.0"] = (("model10_up", "ConvTranspose_0"), "convt")
    m["model1short10.0"] = (("model1short10", "Conv_0"), "conv")
    m["model10.1"] = (("model10_conv1", "Conv_0"), "conv")
    m["model_out.0"] = (("model_out", "Conv_0"), "conv")
    return m


def save_params_npz(params: dict, path: str) -> None:
    """Flatten a flax param tree to the {'a/b/c': array} npz layout the
    engine registry loads (engines._load_npz_params)."""
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)

    walk(params, "")
    np.savez(path, **flat)


def convert_checkpoint(
    checkpoint_path: str, key_map: Mapping, out_path: str, strict: bool = True
) -> dict:
    """One-call torch checkpoint -> engine-loadable npz."""
    sd = load_state_dict(checkpoint_path)
    params = convert_params(sd, key_map, strict=strict)
    save_params_npz(params, out_path)
    return params
