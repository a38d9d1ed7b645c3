"""DDColor numeric parity: the flax rebuild + ddcolor_key_map against a
torch transcription of the published upstream architecture
(tests/_ddcolor_oracle.py, pixel decoder reusing the reference's own
vendored fastai UnetBlockWide/CustomPixelShuffle_ICNR).

Upgrades DDColor from structural validation (tree coverage) to numeric:
ConvNeXt block math + per-stage out-norms, Mask2Former post-norm rounds
(qkv packing of nn.MultiheadAttention, pos-embedding placement, level
embeds, DETR sine embeddings), the color_embed MLP, query-score fusion,
and the spectral/weight-norm folds on the decoder convs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from _ddcolor_oracle import build_ddcolor_oracle, sine_pos_t
from _ref_loader import load_ref_module, state_dict_numpy
from havc_tpu.models import convert
from havc_tpu.models import ddcolor as dd

MICRO = dict(encoder="micro", dim=64, num_queries=16, num_blocks=3,
             unet_out=(64, 64, 32), heads=8, ffn_dim=128)


@pytest.fixture(scope="module")
def oracle():
    unet = load_ref_module("vsdeoldify.deoldify.unet")
    dl = load_ref_module("vsdeoldify.deoldify.layers")
    fl = load_ref_module("vsdeoldify.fastai.layers")
    torch.manual_seed(0)
    net = build_ddcolor_oracle(unet, dl, fl)
    # converge spectral-norm u/v via train-mode forwards (same conditioning
    # as the deoldify oracle), then randomize BN stats
    net.train()
    with torch.no_grad():
        probe = torch.rand(1, 3, 64, 64)
        for _ in range(30):
            net(probe)
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.add_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.mul_(torch.rand_like(m.running_var) * 0.5 + 0.75)
    return net.eval()


@pytest.fixture(scope="module")
def converted(oracle):
    sd = state_dict_numpy(oracle)
    sd = convert.fold_spectral_norm(sd)
    sd = convert.fold_weight_norm(sd)
    key_map = convert.ddcolor_key_map(
        depths=(1, 1, 2, 1), num_blocks=3, extra_bn=True
    )
    params = convert.convert_params(sd, key_map, strict=True)
    # coverage: everything consumed
    consumed = set()
    for prefix, entries in key_map.items():
        if not isinstance(entries, list):
            entries = [entries]
        for path, kind in entries:
            for suffix in convert._KIND_RULES[kind]:
                consumed.add(f"{prefix}.{suffix}")
    leftovers = [k for k in sd if k not in consumed
                 and not k.endswith("num_batches_tracked")]
    assert leftovers == [], leftovers[:10]
    return params


def test_config_sniffer_recovers_micro(oracle):
    sd = state_dict_numpy(oracle)
    sd = convert.fold_spectral_norm(sd)
    sd = convert.fold_weight_norm(sd)
    cfg = convert.ddcolor_config_from_state_dict(sd)
    assert cfg["encoder"] == "micro"
    assert cfg["dim"] == 64
    assert cfg["num_queries"] == 16
    assert cfg["num_blocks"] == 3
    assert tuple(cfg["unet_out"]) == (64, 64, 32)
    assert cfg["unet_extra_bn"] is True
    assert cfg["ffn_dim"] == 128


def test_sine_position_embedding_parity():
    ref = sine_pos_t(6, 9, 32).numpy()
    got = np.asarray(dd.sine_position_embedding(6, 9, 32))
    assert np.abs(ref - got).max() < 1e-5


def test_ddcolor_full_model_parity(oracle, converted):
    """End-to-end activation parity at micro geometry, 64x64 input."""
    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = oracle(
            torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
        ).numpy().transpose(0, 2, 3, 1)

    model = dd.DDColor(**MICRO)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(model.apply(converted, jnp.asarray(x)))
    scale = max(np.abs(ref).max(), 1e-3)
    err = np.abs(ref - got).max() / scale
    assert err < 2e-3, f"rel err {err:.2e}"
