"""DeOldify DynamicUnet: resnet parity vs torchvision-free oracle, unet flow."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from havc_tpu.models import deoldify as do
from havc_tpu.models.resnet import ResNetBody


class TestResNet:
    def test_stage_shapes_resnet50(self):
        m = ResNetBody.from_config("resnet50")
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        feats = m.apply(p, jnp.zeros((1, 64, 64, 3)))
        shapes = [f.shape for f in feats]
        assert shapes[0] == (1, 32, 32, 64)  # relu, stride 2
        assert shapes[1] == (1, 16, 16, 256)  # layer1
        assert shapes[2] == (1, 8, 8, 512)
        assert shapes[3] == (1, 4, 4, 1024)
        assert shapes[4] == (1, 2, 2, 2048)

    def test_stage_shapes_resnet34(self):
        m = ResNetBody.from_config("resnet34")
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        feats = m.apply(p, jnp.zeros((1, 64, 64, 3)))
        assert feats[4].shape == (1, 2, 2, 512)

    def test_torch_basicblock_parity(self):
        """One BasicBlock with downsample vs torch, converted weights."""
        import torch
        import torch.nn as tnn
        from havc_tpu.models import convert as cv

        class TB(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(8, 16, 3, 2, 1, bias=False)
                self.bn1 = tnn.BatchNorm2d(16)
                self.conv2 = tnn.Conv2d(16, 16, 3, 1, 1, bias=False)
                self.bn2 = tnn.BatchNorm2d(16)
                self.down_conv = tnn.Conv2d(8, 16, 1, 2, 0, bias=False)
                self.down_bn = tnn.BatchNorm2d(16)

            def forward(self, x):
                out = torch.relu(self.bn1(self.conv1(x)))
                out = self.bn2(self.conv2(out))
                idn = self.down_bn(self.down_conv(x))
                return torch.relu(out + idn)

        tm = TB().eval()
        with torch.no_grad():
            tm.bn1.running_mean += torch.randn(16) * 0.1
            tm.bn2.running_var *= torch.rand(16) * 0.5 + 0.75
        x = np.random.default_rng(0).random((1, 8, 16, 16), dtype=np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()

        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        km = {
            "conv1": (("conv1", "Conv_0"), "conv"),
            "bn1": (("bn1",), "bn"),
            "conv2": (("conv2", "Conv_0"), "conv"),
            "bn2": (("bn2",), "bn"),
            "down_conv": (("down_conv", "Conv_0"), "conv"),
            "down_bn": (("down_bn",), "bn"),
        }
        params = cv.convert_params(sd, km, strict=False)
        from havc_tpu.models.resnet import BasicBlock

        fb = BasicBlock(16, stride=2, downsample=True)
        with jax.default_matmul_precision("highest"):
            out = np.asarray(fb.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
        assert np.abs(out.transpose(0, 3, 1, 2) - ref).max() < 2e-5


class TestDeOldify:
    @pytest.fixture(scope="class")
    def small_wide(self):
        # resnet18 body keeps the test fast; structure identical to wide
        m = do.DeOldifyWide(encoder="resnet18", nf_factor=1)
        p = do.init_params(m, input_size=64)
        return m, p

    def test_forward_shape_and_range(self, small_wide):
        m, p = small_wide
        x = jnp.zeros((1, 64, 64, 3), jnp.float32) + 0.4
        out = np.asarray(m.apply(p, x))
        assert out.shape == (1, 64, 64, 3)
        # SigmoidRange(-3, 3)
        assert out.min() >= -3.0 and out.max() <= 3.0

    def test_deep_variant_runs(self):
        m = do.DeOldifyDeep(encoder="resnet18", nf_factor=1.5)
        p = do.init_params(m, input_size=64)
        out = m.apply(p, jnp.zeros((1, 64, 64, 3), jnp.float32))
        assert out.shape == (1, 64, 64, 3)

    def test_colorize_driver(self, small_wide):
        m, p = small_wide
        rng = np.random.default_rng(1)
        gray = np.tile(rng.random((1, 80, 112, 1), dtype=np.float32), (1, 1, 1, 3))
        out = np.asarray(do.colorize(p, jnp.asarray(gray), m, render_factor=4))
        assert out.shape == gray.shape
        from havc_tpu.ops.colorspace import luma

        y_in = np.asarray(luma(jnp.asarray(gray)))
        y_out = np.asarray(luma(jnp.asarray(out)))
        # driver copies model chroma onto original luma
        assert np.abs(y_in - y_out).mean() < 0.02

    def test_make_model_configs(self):
        assert isinstance(do.make_model("video"), do.DeOldifyWide)
        assert isinstance(do.make_model("stable"), do.DeOldifyWide)
        assert isinstance(do.make_model("artistic"), do.DeOldifyDeep)

    def test_self_attention_zero_gamma_identity(self):
        sa = do.SelfAttention(16)
        x = jnp.asarray(np.random.default_rng(2).random((1, 8, 8, 16), dtype=np.float32))
        p = sa.init(jax.random.PRNGKey(0), x)
        out = sa.apply(p, x)
        # gamma starts at 0 -> identity
        assert np.abs(np.asarray(out) - np.asarray(x)).max() < 1e-6
