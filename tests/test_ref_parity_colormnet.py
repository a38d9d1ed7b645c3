"""ColorMNet conversion parity: converted torch weights must reproduce the
reference modules' activations exactly (random weights, synthetic inputs).

Oracles are the reference's own nn.Modules loaded import-isolated
(tests/_ref_loader.py).  This validates both the key maps
(convert.colormnet_key_map) and the flax re-implementations
(models/colormnet.py) — the pair that turns published checkpoints into
working TPU engines.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from _ref_loader import load_ref_module, state_dict_numpy
from havc_tpu.models import colormnet as cm
from havc_tpu.models import convert
from havc_tpu.models.resnet import ResNetBody


@pytest.fixture(scope="module")
def ref_modules():
    return load_ref_module("vsdeoldify.colormnet.model.modules")


@pytest.fixture(scope="module")
def ref_resnet():
    return load_ref_module("vsdeoldify.colormnet.model.resnet")


@pytest.fixture(scope="module")
def ref_attention():
    return load_ref_module("vsdeoldify.colormnet.model.attention")


def _subtree(full_params: dict, *path: str) -> dict:
    node = full_params["params"]
    for p in path:
        node = node[p]
    return {"params": node}


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _nchw(a: np.ndarray):
    return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())


def _rand(*shape, seed=0, scale=1.0):
    return (np.random.default_rng(seed).standard_normal(shape) * scale).astype(
        np.float32
    )


def _randomize_bn_stats(module):
    """Give running stats non-trivial values so BN folding is exercised."""
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.add_(torch.randn_like(m.running_mean) * 0.2)
                m.running_var.mul_(torch.rand_like(m.running_var) * 0.5 + 0.75)


def _assert_close(ref, got, tol=2e-4, name=""):
    ref, got = np.asarray(ref), np.asarray(got)
    assert ref.shape == got.shape, f"{name}: {ref.shape} vs {got.shape}"
    scale = max(np.abs(ref).max(), 1e-3)
    err = np.abs(ref - got).max() / scale
    assert err < tol, f"{name}: rel err {err:.2e}"


# ---------------------------------------------------------------------------


def test_key_projection_parity(ref_modules):
    torch.manual_seed(0)
    tm = ref_modules.KeyProjection(1024, 64).eval()
    sd = state_dict_numpy(tm, prefix="key_proj.")
    m = {k: v for k, v in convert.colormnet_key_map().items()
         if k.startswith("key_proj.")}
    params = convert.convert_params(sd, m)

    x = _rand(1, 4, 6, 1024, seed=1, scale=0.5)
    with torch.no_grad():
        k_t, s_t, e_t = tm(_nchw(x), True, True)

    fm = cm.KeyProjection(key_dim=64)
    with jax.default_matmul_precision("highest"):
        k_j, s_j, e_j = fm.apply(_subtree(params, "key_proj"), jnp.asarray(x))
    _assert_close(_nhwc(k_t), k_j, name="key")
    _assert_close(_nhwc(s_t), s_j, name="shrinkage")
    _assert_close(_nhwc(e_t), e_j, name="selection")


def test_local_attention_parity(ref_attention):
    """LocalGatedPropagation at the exact short_term_attn geometry
    (network.py:37-45).  The reference's enable_corr=False unfold fallback
    has a shape bug at this geometry (attention.py:829 views k with
    hidden_dim=1024 instead of d_att=64), so the oracle below re-runs the
    module's math with its own parameters: correlation == unfold product
    (the CUDA SpatialCorrelationSampler semantics), mask, softmax, local
    aggregation, dw_conv, projection."""
    torch.manual_seed(0)
    lgp = ref_attention.LocalGatedPropagation(
        d_qk=64, d_vu=1024, num_head=1, dilation=1, use_linear=False,
        dropout=0, d_att=64, max_dis=7, expand_ratio=1, enable_corr=False,
    ).eval()
    sd = state_dict_numpy(lgp, prefix="short_term_attn.")
    m = {k: v for k, v in convert.colormnet_key_map().items()
         if k.startswith("short_term_attn.")}
    params = convert.convert_params(sd, m)

    h, w = 6, 9
    q = _rand(1, h, w, 64, seed=2, scale=0.3)
    k = _rand(1, h, w, 64, seed=3, scale=0.3)
    v = _rand(1, h, w, 1024, seed=4, scale=0.3)

    win, dis = 15, 7
    with torch.no_grad():
        qt = _nchw(q)
        kt = _nchw(k)
        vt = _nchw(v)
        rel = lgp.relative_emb_k(qt).view(1, win * win, h * w)
        qs = qt / (64.0 ** 0.5)
        pad = torch.nn.functional.pad(kt, (dis, dis, dis, dis))
        k_unf = torch.nn.functional.unfold(pad, (win, win)).view(
            1, 64, win * win, h * w
        )
        qk = (qs.view(1, 64, 1, h * w) * k_unf).sum(1) + rel  # (1,225,hw)
        ones = torch.ones(1, 1, h, w)
        mask_unf = torch.nn.functional.unfold(
            torch.nn.functional.pad(ones, (dis, dis, dis, dis)), (win, win)
        ).view(1, win * win, h * w)
        qk = qk - (1 - mask_unf) * 1e8
        attn = torch.softmax(qk, dim=1)  # (1,225,hw)
        v_pad = torch.nn.functional.pad(vt, (dis, dis, dis, dis))
        v_unf = torch.nn.functional.unfold(v_pad, (win, win)).view(
            1, 1024, win * win, h * w
        )
        agg = (attn.unsqueeze(1) * v_unf).sum(2)  # (1,1024,hw)
        agg_map = agg.view(1, 1024, h, w)
        out = lgp.dw_conv.conv(agg_map)  # 5x5 depthwise, no bias
        out = out.permute(0, 2, 3, 1)  # NHWC tokens
        ref_out = lgp.projection(out).numpy()

    fm = cm.LocalAttention(d_qk=64, d_vu=1024)
    with jax.default_matmul_precision("highest"):
        got = fm.apply(
            _subtree(params, "short_term_attn"),
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        )
    _assert_close(ref_out, got, name="local_attn")


def test_value_encoder_parity(ref_modules):
    torch.manual_seed(0)
    tm = ref_modules.ValueEncoder(512, 64, single_object=False).eval()
    _randomize_bn_stats(tm)
    sd = state_dict_numpy(tm, prefix="value_encoder.")
    m = {k: v for k, v in convert.colormnet_key_map().items()
         if k.startswith("value_encoder.")}
    params = convert.convert_params(sd, m)

    H = W = 64
    h16 = H // 16
    img = _rand(1, H, W, 3, seed=5, scale=0.5)
    f16 = _rand(1, h16, h16, 1024, seed=6, scale=0.3)
    hidden = _rand(2, h16, h16, 64, seed=7, scale=0.3)
    masks = _rand(1, 2, H, W, seed=8, scale=0.4)

    with torch.no_grad():
        masks_t = torch.from_numpy(masks)
        others_t = torch.flip(masks_t, dims=[1])
        h_t = (
            torch.from_numpy(hidden)
            .permute(0, 3, 1, 2)
            .unsqueeze(0)  # (1,2,64,h,w)
        )
        g_t, h_out_t = tm(
            _nchw(img), _nchw(f16), h_t, masks_t, others_t,
            is_deep_update=True,
        )

    fm = cm.ValueEncoder(value_dim=512, hidden_dim=64, resnet="resnet18")
    with jax.default_matmul_precision("highest"):
        g_j, h_j = fm.apply(
            _subtree(params, "value_encoder"),
            jnp.asarray(img), jnp.asarray(f16), jnp.asarray(hidden),
            jnp.asarray(masks),
        )
    # torch g: (1, 2, 512, h, w) -> (2, h, w, 512)
    ref_g = g_t[0].permute(0, 2, 3, 1).numpy()
    ref_h = h_out_t[0].permute(0, 2, 3, 1).numpy()
    _assert_close(ref_g, g_j, tol=5e-4, name="value16")
    _assert_close(ref_h, h_j, tol=5e-4, name="hidden")


def test_decoder_parity(ref_modules):
    torch.manual_seed(1)
    tm = ref_modules.Decoder(512, 64).eval()
    sd = state_dict_numpy(tm, prefix="decoder.")
    m = {k: v for k, v in convert.colormnet_key_map().items()
         if k.startswith("decoder.")}
    params = convert.convert_params(sd, m)

    h = w = 4
    f16 = _rand(1, h, w, 1024, seed=10, scale=0.3)
    f8 = _rand(1, 2 * h, 2 * w, 512, seed=11, scale=0.3)
    f4 = _rand(1, 4 * h, 4 * w, 256, seed=12, scale=0.3)
    hidden = _rand(2, h, w, 64, seed=13, scale=0.3)
    mem = _rand(2, h, w, 512, seed=14, scale=0.3)

    with torch.no_grad():
        h_t = torch.from_numpy(hidden).permute(0, 3, 1, 2).unsqueeze(0)
        mem_t = torch.from_numpy(mem).permute(0, 3, 1, 2).unsqueeze(0)
        hid_t, logits_t = tm(
            _nchw(f16), _nchw(f8), _nchw(f4), h_t, mem_t, h_out=True
        )

    fm = cm.Decoder(value_dim=512, hidden_dim=64)
    with jax.default_matmul_precision("highest"):
        hid_j, logits_j = fm.apply(
            _subtree(params, "decoder"),
            jnp.asarray(f16), jnp.asarray(f8), jnp.asarray(f4),
            jnp.asarray(hidden), jnp.asarray(mem),
        )
    ref_logits = logits_t[0].unsqueeze(-1).numpy()  # (2, 16h, 16w, 1)
    ref_hid = hid_t[0].permute(0, 2, 3, 1).numpy()
    _assert_close(ref_logits, logits_j, tol=5e-4, name="logits")
    _assert_close(ref_hid, hid_j, tol=5e-4, name="hidden")


def test_fuse_parity(ref_resnet):
    torch.manual_seed(2)
    tm = ref_resnet.Fuse(1536, 1024).eval()
    sd = state_dict_numpy(tm, prefix="key_encoder.fuse1.")
    m = {k: v for k, v in convert.colormnet_key_map().items()
         if k.startswith("key_encoder.fuse1.")}
    params = convert.convert_params(sd, m)

    h, w = 4, 6
    enc = _rand(1, h, w, 1536, seed=20, scale=0.3)
    dnc = _rand(1, h, w, 1024, seed=21, scale=0.3)
    with torch.no_grad():
        ref = tm(_nchw(enc), _nchw(dnc))

    fm = cm.Fuse(out_feat=1024)
    with jax.default_matmul_precision("highest"):
        got = fm.apply(
            _subtree(params, "key_encoder", "fuse1"),
            jnp.asarray(enc), jnp.asarray(dnc),
        )
    _assert_close(_nhwc(ref), got, tol=5e-4, name="fuse")


def test_resnet50_trunk_parity(ref_resnet):
    torch.manual_seed(3)
    tm = ref_resnet.resnet50(pretrained=False).eval()
    _randomize_bn_stats(tm)
    sd = {}
    for attr, sname in (("conv1", "conv1"), ("bn1", "bn1"),
                        ("layer1", "res2"), ("layer2", "layer2"),
                        ("layer3", "layer3")):
        sd.update(state_dict_numpy(
            getattr(tm, attr), prefix=f"key_encoder.{sname}."))
    m = {k: v for k, v in convert.colormnet_key_map().items()
         if k.startswith("key_encoder.") and (
             k.split(".")[1] in ("conv1", "bn1", "res2", "layer2", "layer3"))}
    params = convert.convert_params(sd, m)

    x = _rand(1, 64, 64, 3, seed=30, scale=0.5)
    with torch.no_grad():
        t = tm.conv1(_nchw(x))
        t = tm.bn1(t)
        t = tm.relu(t)
        t = tm.maxpool(t)
        f4 = tm.layer1(t)
        f8 = tm.layer2(f4)
        f16 = tm.layer3(f8)

    body = ResNetBody.from_config("resnet50", num_stages=3)
    with jax.default_matmul_precision("highest"):
        _, j4, j8, j16 = body.apply(
            _subtree(params, "key_encoder", "ResNetBody_0"), jnp.asarray(x)
        )
    _assert_close(_nhwc(f4), j4, tol=5e-4, name="f4")
    _assert_close(_nhwc(f8), j8, tol=1e-3, name="f8")
    _assert_close(_nhwc(f16), j16, tol=2e-3, name="f16")


def _synthetic_dinov2_state_dict(prefix="key_encoder.network2.backbone"):
    """DINOv2 ViT-S/14 checkpoint layout with pretrain grid 37 (518/14)."""
    rng = np.random.default_rng(0)
    dim, depth = 384, 12

    def t(*s):
        return (rng.standard_normal(s) * 0.02).astype(np.float32)

    sd = {
        f"{prefix}.cls_token": t(1, 1, dim),
        f"{prefix}.pos_embed": t(1, 37 * 37 + 1, dim),
        f"{prefix}.mask_token": t(1, dim),
        f"{prefix}.patch_embed.proj.weight": t(dim, 3, 14, 14),
        f"{prefix}.patch_embed.proj.bias": t(dim),
        f"{prefix}.norm.weight": t(dim),
        f"{prefix}.norm.bias": t(dim),
    }
    for i in range(depth):
        b = f"{prefix}.blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": t(dim), f"{b}.norm1.bias": t(dim),
            f"{b}.attn.qkv.weight": t(3 * dim, dim),
            f"{b}.attn.qkv.bias": t(3 * dim),
            f"{b}.attn.proj.weight": t(dim, dim),
            f"{b}.attn.proj.bias": t(dim),
            f"{b}.ls1.gamma": t(dim),
            f"{b}.norm2.weight": t(dim), f"{b}.norm2.bias": t(dim),
            f"{b}.mlp.fc1.weight": t(4 * dim, dim),
            f"{b}.mlp.fc1.bias": t(4 * dim),
            f"{b}.mlp.fc2.weight": t(dim, 4 * dim),
            f"{b}.mlp.fc2.bias": t(dim),
            f"{b}.ls2.gamma": t(dim),
        })
    return sd


def test_colormnet_checkpoint_full_coverage(ref_modules, ref_resnet,
                                            ref_attention):
    """Every tensor of a full synthetic ColorMNet checkpoint is either
    consumed by the key map or explicitly excluded — the tree-coverage
    guarantee that a real DINOv2FeatureV6_LocalAtten checkpoint converts
    without silent drops."""
    network_mod = load_ref_module("vsdeoldify.colormnet.model.network")

    # Segmentor stub: hub download replaced by head-only params (the real
    # checkpoint's backbone keys are synthesized below)
    class _SegStub(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv3 = torch.nn.Conv2d(1536, 1536, 1, bias=False)
            self.bn3 = torch.nn.BatchNorm2d(1536)

    orig = ref_resnet.Segmentor
    ref_resnet.Segmentor = _SegStub
    try:
        net = network_mod.ColorMNet(
            {"key_dim": 64, "value_dim": 512, "hidden_dim": 64,
             "single_object": False}
        )
    finally:
        ref_resnet.Segmentor = orig

    sd = state_dict_numpy(net)
    sd.update(_synthetic_dinov2_state_dict())

    key_map = convert.colormnet_key_map(include_backbone=True)
    params = convert.convert_params(sd, key_map, strict=True)

    consumed = set()
    for prefix, (path, kind) in key_map.items():
        for suffix in convert._KIND_RULES[kind]:
            consumed.add(f"{prefix}.{suffix}")
    leftovers = [
        k for k in sd
        if k not in consumed
        and k not in convert.COLORMNET_EXCLUDED_KEYS
        and not k.endswith("num_batches_tracked")
    ]
    assert leftovers == [], f"unconverted checkpoint tensors: {leftovers[:10]}"

    # the converted tree must be exactly loadable by the flax engine modules
    from havc_tpu.models.vit import DinoSegmentor

    h16 = 4
    p = params["params"]
    with jax.default_matmul_precision("float32"):
        ke = cm.KeyEncoder(resnet="resnet50", vit="dinov2_s14")
        x = jnp.zeros((1, 112, 112, 3), jnp.float32)
        init_shapes = jax.eval_shape(
            lambda: ke.init(jax.random.PRNGKey(0), x))
    conv_tree = jax.tree.map(lambda a: a.shape, {"params": p["key_encoder"]})
    init_tree = jax.tree.map(
        lambda a: a.shape, jax.tree.map(lambda s: s, init_shapes))
    assert conv_tree == init_tree, "KeyEncoder param tree mismatch"
