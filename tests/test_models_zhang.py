"""Zhang models: layer parity vs torch, converter correctness, driver flow."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from havc_tpu.models import convert as cv
from havc_tpu.models import zhang
from havc_tpu.models.layers import BatchNormInference, PtConv, PtConvTranspose


def torch_layer_stack():
    """A torch stack exercising every layer kind the converter handles."""
    import torch.nn as tnn

    return tnn.Sequential(
        tnn.Conv2d(3, 8, 3, stride=2, padding=1),
        tnn.ReLU(True),
        tnn.BatchNorm2d(8),
        tnn.Conv2d(8, 8, 3, stride=1, padding=2, dilation=2),
        tnn.ReLU(True),
        tnn.ConvTranspose2d(8, 4, 4, stride=2, padding=1),
    )


class FlaxStack:
    """Equivalent flax composition built from our torch-semantics layers."""

    def __init__(self):
        import flax.linen as nn

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = PtConv(8, 3, 2, 1, name="c0")(x)
                x = nn.relu(x)
                x = BatchNormInference(8, name="bn")(x)
                x = PtConv(8, 3, 1, 2, dilation=2, name="c1")(x)
                x = nn.relu(x)
                x = PtConvTranspose(4, 4, 2, 1, name="ct")(x)
                return x

        self.module = M()


KEY_MAP = {
    "0": (("c0", "Conv_0"), "conv"),
    "2": (("bn",), "bn"),
    "3": (("c1", "Conv_0"), "conv"),
    "5": (("ct", "ConvTranspose_0"), "convt"),
}


def test_converted_stack_matches_torch():
    import torch

    tm = torch_layer_stack().eval()
    with torch.no_grad():
        # randomize BN stats so the test is meaningful
        tm[2].running_mean += torch.randn(8) * 0.2
        tm[2].running_var *= torch.rand(8) * 0.5 + 0.75
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = cv.convert_params(sd, KEY_MAP)

    x = np.random.default_rng(0).random((2, 3, 16, 16), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    fm = FlaxStack().module
    with jax.default_matmul_precision("highest"):
        out = np.asarray(fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert out.shape == tuple(np.transpose(ref, (0, 2, 3, 1)).shape)
    assert np.abs(out.transpose(0, 3, 1, 2) - ref).max() < 2e-5


def _fake_state_dict(key_map, shapes):
    """Synthesize a state_dict with the published checkpoint's key names."""
    rng = np.random.default_rng(1)
    sd = {}
    for prefix, (path, kind) in key_map.items():
        if kind == "conv":
            o, i, k = shapes[prefix]
            sd[f"{prefix}.weight"] = rng.normal(0, 0.1, (o, i, k, k)).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.normal(0, 0.1, (o,)).astype(np.float32)
        elif kind == "convt":
            o, i, k = shapes[prefix]
            sd[f"{prefix}.weight"] = rng.normal(0, 0.1, (i, o, k, k)).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.normal(0, 0.1, (o,)).astype(np.float32)
        elif kind == "bn":
            (c,) = shapes[prefix]
            sd[f"{prefix}.weight"] = np.ones(c, np.float32)
            sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
            sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
            sd[f"{prefix}.running_var"] = np.ones(c, np.float32)
    return sd


def _eccv16_shapes():
    s = {}
    chans = {"model1": (64, 1, 64), "model2": (128, 64, 128),
             "model3": (256, 128, 256), "model4": (512, 256, 512),
             "model5": (512, 512, 512), "model6": (512, 512, 512),
             "model7": (512, 512, 512)}
    n_convs = {"model1": 2, "model2": 2, "model3": 3, "model4": 3,
               "model5": 3, "model6": 3, "model7": 3}
    for name, (out, inp, mid) in chans.items():
        n = n_convs[name]
        for i in range(n):
            cin = inp if i == 0 else out
            s[f"{name}.{2*i}"] = (out, cin, 3)
        s[f"{name}.{2*n}"] = (out,)
    s["model8.0"] = (256, 512, 4)
    s["model8.2"] = (256, 256, 3)
    s["model8.4"] = (256, 256, 3)
    s["model8.6"] = (313, 256, 1)
    s["model_out"] = (2, 313, 1)
    return s


def test_eccv16_conversion_loads_and_runs():
    km = cv.eccv16_key_map()
    sd = _fake_state_dict(km, _eccv16_shapes())
    # model_out has no bias in the real checkpoint
    del sd["model_out.bias"]
    params = cv.convert_params(sd, km)
    model = zhang.ECCV16()
    x = jnp.zeros((1, 256, 256, 1), jnp.float32) + 50.0
    ab = model.apply(params, x)
    assert ab.shape == (1, 256, 256, 2)
    assert np.isfinite(np.asarray(ab)).all()


def test_eccv16_param_tree_matches_init():
    """Converted tree must cover exactly the same leaves as model.init."""
    import jax.tree_util as jtu

    km = cv.eccv16_key_map()
    sd = _fake_state_dict(km, _eccv16_shapes())
    del sd["model_out.bias"]
    params = cv.convert_params(sd, km)
    ref = zhang.init_params(zhang.ECCV16(), input_size=64)
    ref_paths = {jtu.keystr(p) for p, _ in jtu.tree_flatten_with_path(ref)[0]}
    got_paths = {jtu.keystr(p) for p, _ in jtu.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths
    # and shapes agree
    ref_leaves = dict(
        (jtu.keystr(p), v.shape) for p, v in jtu.tree_flatten_with_path(ref)[0]
    )
    for p, v in jtu.tree_flatten_with_path(params)[0]:
        assert ref_leaves[jtu.keystr(p)] == v.shape, jtu.keystr(p)


def test_siggraph17_init_and_run():
    model = zhang.Siggraph17()
    params = zhang.init_params(model, input_size=64)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32) + 50.0
    ab = model.apply(params, x)
    assert ab.shape == (1, 64, 64, 2)
    assert np.abs(np.asarray(ab)).max() <= 110.0


def test_colorize_driver_preserves_luma():
    model = zhang.ECCV16()
    params = zhang.init_params(model, input_size=64)
    rng = np.random.default_rng(2)
    gray = np.tile(rng.random((1, 96, 128, 1), dtype=np.float32), (1, 1, 1, 3))
    out = np.asarray(zhang.colorize(params, jnp.asarray(gray), model, input_size=64))
    assert out.shape == gray.shape
    from havc_tpu.ops.colorspace import rgb_to_lab

    l_in = np.asarray(rgb_to_lab(jnp.asarray(gray)))[..., 0]
    l_out = np.asarray(rgb_to_lab(jnp.asarray(out)))[..., 0]
    # L preserved through the ab-replacement driver
    assert np.abs(l_in - l_out).mean() < 1.5


class TestExtraKeyMaps:
    """Converter key maps for DeepEx/Remaster: coverage vs init trees."""

    def test_vgg19_map_matches_init(self):
        import jax.tree_util as jtu
        from havc_tpu.models import convert as cv
        from havc_tpu.models import deepex as dx

        km = cv.deepex_vgg19_key_map()
        rng = np.random.default_rng(0)
        chans = {"conv1_1": (64, 3), "conv1_2": (64, 64), "conv2_1": (128, 64),
                 "conv2_2": (128, 128), "conv3_1": (256, 128),
                 "conv3_2": (256, 256), "conv3_3": (256, 256),
                 "conv3_4": (256, 256), "conv4_1": (512, 256),
                 "conv4_2": (512, 512), "conv4_3": (512, 512),
                 "conv4_4": (512, 512), "conv5_1": (512, 512),
                 "conv5_2": (512, 512)}
        sd = {}
        for name, (o, i) in chans.items():
            sd[f"{name}.weight"] = rng.normal(0, 0.1, (o, i, 3, 3)).astype(np.float32)
            sd[f"{name}.bias"] = np.zeros(o, np.float32)
        params = cv.convert_params(sd, km)
        ref = dx.VGG19Features().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )
        ref_paths = {jtu.keystr(p) for p, _ in jtu.tree_flatten_with_path(ref)[0]}
        got_paths = {jtu.keystr(p) for p, _ in jtu.tree_flatten_with_path(params)[0]}
        assert got_paths == ref_paths
        # and it runs
        out = dx.VGG19Features().apply(params, jnp.zeros((1, 32, 32, 3)))
        assert out[0].shape[-1] == 64

    def test_spectral_fold_identity_scale(self):
        from havc_tpu.models import convert as cv

        rng = np.random.default_rng(1)
        w = rng.normal(0, 1, (8, 4, 3, 3)).astype(np.float32)
        sd = {"c.weight_orig": w, "c.weight_u": rng.normal(0, 1, 8).astype(np.float32)}
        out = cv.fold_spectral_norm(sd)
        wf = out["c.weight"].reshape(8, -1)
        sigma = np.linalg.svd(wf, compute_uv=False)[0]
        assert abs(sigma - 1.0) < 1e-3  # normalized to unit spectral norm
