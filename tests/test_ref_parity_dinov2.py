"""DINOv2 numeric parity: the flax ViT-S/14 (models/vit.py) against a
torch transcription of the published DINOv2 inference math
(tests/_dinov2_oracle.py), through the converted-checkpoint path.

Upgrades the backbone from structural validation (tree coverage) to
numeric validation: pos-embed bicubic interpolation (offset 0.1), qkv
packing, LayerScale, exact GELU, shared final norm over tapped layers,
and the Segmentor head's 1/14 -> 1/16 bilinear re-grid
(reference: vsdeoldify/colormnet/model/resnet.py:211-246).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from _dinov2_oracle import MiniDinoViT
from _ref_loader import load_ref_module, state_dict_numpy
from test_ref_parity_colormnet import _synthetic_dinov2_state_dict
from havc_tpu.models import convert
from havc_tpu.models.vit import ViT, DinoSegmentor


def _load_mini(sd_prefixed, prefix):
    net = MiniDinoViT()
    stripped = {
        k[len(prefix) + 1:]: torch.from_numpy(v)
        for k, v in sd_prefixed.items() if k.startswith(prefix + ".")
    }
    net.load_state_dict(stripped)
    return net.eval()


def _rel_err(ref, got):
    ref, got = np.asarray(ref), np.asarray(got)
    assert ref.shape == got.shape, (ref.shape, got.shape)
    return np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-3)


def test_dinov2_vit_parity():
    """Intermediate layers [8..11] on a 112x112 input (8x8 patch grid,
    pos-embed interpolated from the 37x37 pretraining grid)."""
    prefix = "key_encoder.network2.backbone"
    sd = _synthetic_dinov2_state_dict(prefix)
    tm = _load_mini(sd, prefix)

    params = convert.convert_params(sd, convert.dinov2_key_map())
    node = params["params"]
    for p in ("key_encoder", "network2", "backbone"):
        node = node[p]

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((1, 112, 112, 3)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref = tm.get_intermediate_layers(
            torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
            n=[8, 9, 10, 11], reshape=True,
        )

    fm = ViT(out_layers=(8, 9, 10, 11))
    with jax.default_matmul_precision("highest"):
        got = fm.apply({"params": node}, jnp.asarray(x))
    for i, (r, g) in enumerate(zip(ref, got)):
        r = r.permute(0, 2, 3, 1).numpy()
        err = _rel_err(r, g)
        assert err < 2e-3, f"layer tap {i}: rel err {err:.2e}"


def test_dino_segmentor_parity():
    """Full Segmentor head: concat 4 taps -> 1x1 conv + BN + ReLU ->
    bilinear DOWNSCALE to the 1/16 grid (no antialias)."""
    ref_resnet = load_ref_module("vsdeoldify.colormnet.model.resnet")
    prefix = "key_encoder.network2.backbone"
    sd = _synthetic_dinov2_state_dict(prefix)
    mini = _load_mini(sd, prefix)

    torch.manual_seed(0)
    orig_load = ref_resnet.load
    ref_resnet.load = lambda *a, **k: mini
    try:
        seg = ref_resnet.Segmentor()
    finally:
        ref_resnet.load = orig_load
    with torch.no_grad():
        seg.bn3.running_mean.add_(torch.randn(1536) * 0.2)
        seg.bn3.running_var.mul_(torch.rand(1536) * 0.5 + 0.75)
    seg.eval()

    full_sd = dict(sd)
    full_sd.update(state_dict_numpy(seg.conv3, "key_encoder.network2.conv3."))
    full_sd.update(state_dict_numpy(seg.bn3, "key_encoder.network2.bn3."))
    key_map = {
        k: v for k, v in convert.colormnet_key_map(True).items()
        if k.startswith("key_encoder.network2")
    }
    params = convert.convert_params(full_sd, key_map)
    node = params["params"]["key_encoder"]["network2"]

    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, 112, 112, 3)) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref = seg(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))

    fm = DinoSegmentor()
    with jax.default_matmul_precision("highest"):
        got = fm.apply({"params": node}, jnp.asarray(x))
    err = _rel_err(ref.permute(0, 2, 3, 1).numpy(), got)
    assert err < 5e-3, f"segmentor rel err {err:.2e}"
