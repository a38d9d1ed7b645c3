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


# --- spectral-norm folding ---------------------------------------------------


def fold_spectral_norm(
    state_dict: Dict[str, np.ndarray], n_power_iterations: int = 30
) -> Dict[str, np.ndarray]:
    """Fold torch spectral_norm parametrizations into plain weights.

    DeOldify's convs are spectral-normalized (deoldify/layers.py:38 with
    NormType.Spectral); checkpoints store ``weight_orig`` + ``weight_u``.
    At inference the effective weight is ``W / sigma(W)`` with sigma
    estimated by power iteration from the stored ``u`` — replicated here so
    converted weights need no runtime normalization.
    """
    out = dict(state_dict)
    for key in list(state_dict.keys()):
        if not key.endswith(".weight_orig"):
            continue
        base = key[: -len(".weight_orig")]
        w = np.asarray(state_dict[key], np.float64)
        u = np.asarray(
            state_dict.get(f"{base}.weight_u", np.ones(w.shape[0])), np.float64
        )
        w_mat = w.reshape(w.shape[0], -1)
        u = u / (np.linalg.norm(u) + 1e-12)
        for _ in range(n_power_iterations):
            v = w_mat.T @ u
            v /= np.linalg.norm(v) + 1e-12
            u = w_mat @ v
            u /= np.linalg.norm(u) + 1e-12
        sigma = float(u @ w_mat @ v)
        out[f"{base}.weight"] = (w / max(sigma, 1e-12)).astype(np.float32)
        out.pop(key)
        out.pop(f"{base}.weight_u", None)
        out.pop(f"{base}.weight_v", None)
    return out


# --- Deep-Exemplar checkpoint layouts (attribute names from the published
#     torch modules; see models/deepex.py) ----------------------------------


def deepex_vgg19_key_map() -> dict:
    """VGG19_pytorch (NonlocalNet.py:192-226): conv attributes are named
    directly (conv1_1 .. conv5_2 on our extraction path)."""
    names = [
        "conv1_1", "conv1_2", "conv2_1", "conv2_2",
        "conv3_1", "conv3_2", "conv3_3", "conv3_4",
        "conv4_1", "conv4_2", "conv4_3", "conv4_4",
        "conv5_1", "conv5_2",
    ]
    return {n: ((n, "Conv_0"), "conv") for n in names}


def deepex_colorvid_key_map() -> dict:
    """ColorVidNet (ColorVidNet.py:6-50).  BatchNorm2d(affine=False) stores
    only running stats -> our _BNInfNoAffine mean/var."""
    m = {}
    # conv1_1 is a 2-conv Sequential
    m["conv1_1.0"] = (("conv1_1a", "Conv_0"), "conv")
    m["conv1_1.2"] = (("conv1_1b", "Conv_0"), "conv")
    convs = [
        "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2", "conv3_3",
        "conv4_1", "conv4_2", "conv4_3", "conv5_1", "conv5_2", "conv5_3",
        "conv6_1", "conv6_2", "conv6_3", "conv7_1", "conv7_2", "conv7_3",
        "conv3_3_short", "conv8_2", "conv8_3", "conv2_2_short", "conv9_2",
        "conv1_2_short", "conv10_2", "conv10_ab",
    ]
    for n in convs:
        m[n] = ((n, "Conv_0"), "conv")
    for n in ["conv8_1", "conv9_1", "conv10_1"]:
        m[n] = ((n, "ConvTranspose_0"), "convt")
    for n in ["conv1_2norm", "conv2_2norm", "conv3_3norm", "conv4_3norm",
              "conv5_3norm", "conv6_3norm", "conv7_3norm", "conv8_3norm",
              "conv9_2norm"]:
        m[n] = ((n,), "bn_noaffine")
    for n in ["conv1_2norm_ss", "conv2_2norm_ss", "conv3_3norm_ss"]:
        m[n] = ((n, "Conv_0"), "conv")
    return m


# extra rule kind for BatchNorm2d(affine=False)
_KIND_RULES["bn_noaffine"] = {
    "running_mean": ("mean", lambda t: t),
    "running_var": ("var", lambda t: t),
}


def remaster_key_map() -> dict:
    """DeepRemaster NetworkC (remasternet.py:103-161): Sequential indices
    map onto our named TempConv blocks (models/remaster.py)."""
    m = {}

    def temp(prefix, path):
        m[f"{prefix}.conv3d"] = (path + ("conv",), "conv3d")
        m[f"{prefix}.bn"] = (path + (), "bn3d")

    # down1: index 0 is ReplicationPad3d; TempConvs at 1..9 -> b0..b8
    for i in range(9):
        temp(f"down1.{i + 1}", ("down1", f"b{i}"))
    temp("flat.0", ("flat0",))
    temp("flat.1", ("flat1",))
    temp("down2.0", ("down2_0",))
    temp("down2.1", ("down2_1",))
    for name in ("stattn1", "stattn2", "selfattn1", "selfattn2"):
        for leaf in ("query", "key", "value"):
            m[f"{name}.{leaf}_conv"] = ((name, leaf), "conv3d")
    temp("conv1", ("conv1",))
    temp("up1.conv3d", ("up1",))
    temp("conv2", ("conv2",))
    temp("up2.0", ("up2_0", "conv"))
    temp("up2.1", ("up2_1",))
    temp("up3.0", ("up3_0", "conv"))
    temp("up3.1", ("up3_1",))
    temp("up4.0", ("up4_0",))
    m["up4.1"] = (("up4_out",), "conv3d")
    for i in range(9):
        temp(f"reffeatnet1.{i}", ("reffeatnet1", f"b{i}"))
    temp("reffeatnet2.0", ("ref2_0",))
    temp("reffeatnet2.1", ("ref2_1",))
    temp("reffeatnet2.2", ("ref2_2",))
    return m


# conv3d: torch (O, I, kT, kH, kW) -> flax (kT, kH, kW, I, O)
_KIND_RULES["conv3d"] = {
    "weight": ("kernel", lambda t: np.transpose(t, (2, 3, 4, 1, 0))),
    "bias": ("bias", lambda t: t),
}
# TempConv BatchNorm3d -> bn_scale/bn_bias/bn_mean/bn_var params
_KIND_RULES["bn3d"] = {
    "weight": ("bn_scale", lambda t: t),
    "bias": ("bn_bias", lambda t: t),
    "running_mean": ("bn_mean", lambda t: t),
    "running_var": ("bn_var", lambda t: t),
}

__all__ += [
    "fold_spectral_norm",
    "deepex_vgg19_key_map",
    "deepex_colorvid_key_map",
    "remaster_key_map",
    "save_params_npz",
    "convert_checkpoint",
]


# --- DeOldify (fastai DynamicUnetWide/Deep) checkpoint layout ---------------
#
# fastai saves learn.model.state_dict() where the model is
# SequentialEx([encoder, bn, relu, middle_conv, unet_block x4,
#               PixelShuffle_ICNR, MergeLayer, res_block, final_conv,
#               SigmoidRange]) (deoldify/unet.py:208-281).  Run
# ``fold_spectral_norm`` on the state_dict FIRST (all convs are
# spectral-normalized).  Layout derived from the module structure; pin
# against a real checkpoint before trusting bit-level parity.


def _resnet_body_map(prefix: str, flax_root: str, layers: Sequence[int]) -> dict:
    """torchvision resnet body wrapped by fastai create_body: children
    Sequential indices 0..7 = conv1, bn1, relu, maxpool, layer1..4."""
    m = {
        f"{prefix}.0": ((flax_root, "conv1", "Conv_0"), "conv"),
        f"{prefix}.1": ((flax_root, "bn1"), "bn"),
    }
    block_names = ["conv1", "bn1", "conv2", "bn2", "conv3", "bn3"]
    for stage, n_blocks in enumerate(layers):
        seq_idx = 4 + stage
        for b in range(n_blocks):
            base = f"{prefix}.{seq_idx}.{b}"
            root = (flax_root, f"layer{stage + 1}_block{b}")
            m[f"{base}.conv1"] = (root + ("conv1", "Conv_0"), "conv")
            m[f"{base}.bn1"] = (root + ("bn1",), "bn")
            m[f"{base}.conv2"] = (root + ("conv2", "Conv_0"), "conv")
            m[f"{base}.bn2"] = (root + ("bn2",), "bn")
            # bottleneck blocks have conv3/bn3 (harmless extra prefixes are
            # skipped when absent because strict matching is per-suffix)
            m[f"{base}.conv3"] = (root + ("conv3", "Conv_0"), "conv")
            m[f"{base}.bn3"] = (root + ("bn3",), "bn")
            m[f"{base}.downsample.0"] = (root + ("down_conv", "Conv_0"), "conv")
            m[f"{base}.downsample.1"] = (root + ("down_bn",), "bn")
    return m


def _custom_conv_map(prefix: str, path: Tuple[str, ...], self_attention: bool = False) -> dict:
    """custom_conv_layer (deoldify/layers.py:8-46) with NormType.Spectral:
    Sequential(conv, [relu], bn, [SelfAttention]) -> indices conv=0, bn at
    1 (use_activ=False) or 2, attention last."""
    m = {
        f"{prefix}.0": (path + ("conv", "Conv_0"), "conv"),
        f"{prefix}.2": (path + ("bn",), "bn"),
        # when use_activ=False the bn sits at index 1
        f"{prefix}.1": (path + ("bn",), "bn"),
    }
    if self_attention:
        base = f"{prefix}.3"
        m[f"{base}.query"] = (path + ("attn", "query", "Conv_0"), "conv")
        m[f"{base}.key"] = (path + ("attn", "key", "Conv_0"), "conv")
        m[f"{base}.value"] = (path + ("attn", "value", "Conv_0"), "conv")
        # gamma is a bare Parameter
        m[f"{base}"] = (path + ("attn",), "gamma")
    return m


_KIND_RULES["gamma"] = {"gamma": ("gamma", lambda t: t)}


def deoldify_wide_key_map(layers=(3, 4, 23, 3), n_blocks: int = 4) -> dict:
    """Best-effort map for ColorizeVideo/Stable_gen (DynamicUnetWide over
    resnet101).  UNVALIDATED against a real checkpoint (none in this
    environment) — sequential indices follow deoldify/unet.py:208-281.

    Use with ``strict=False`` and verify coverage with
    tests-style tree comparison once a checkpoint is available.
    """
    m = _resnet_body_map("layers.0", "ResNetBody_0", layers)
    m["layers.1"] = (("pre_bn",), "bn")
    # middle_conv: Sequential of 2 custom_conv_layers (with activ+bn)
    for i in range(2):
        for k, v in _custom_conv_map(f"layers.3.{i}", (f"mid_conv{i + 1}",)).items():
            m[k] = v
    # unet blocks at indices 4..: shuf.conv (use_activ=False), bn, conv
    for i in range(n_blocks):
        base = f"layers.{4 + i}"
        path = (f"up{i}",)
        for k, v in _custom_conv_map(f"{base}.shuf.conv", path + ("shuf", "conv")).items():
            m[k] = v
        m[f"{base}.bn"] = (path + ("bn",), "bn")
        sa = i == n_blocks - 3
        for k, v in _custom_conv_map(f"{base}.conv", path + ("conv",), self_attention=sa).items():
            m[k] = v
    # final pixel shuffle (index 8): PixelShuffle_ICNR.conv
    for k, v in _custom_conv_map("layers.8.conv", ("final_shuf", "conv")).items():
        m[k] = v
    # last_cross res_block (index 10): SequentialEx(conv_layer, conv_layer)
    for i in range(2):
        for k, v in _custom_conv_map(
            f"layers.10.layers.{i}", ("last_cross", f"conv{i + 1}")
        ).items():
            m[k] = v
    # final 1x1 conv (index 11)
    m["layers.11.0"] = (("head_conv", "Conv_0"), "conv")
    return m


__all__ += ["deoldify_wide_key_map"]
