"""Deep-Exemplar colorization (VGG19 + WarpNet + ColorVidNet) in Flax.

Rebuild of the reference's deepex engine (reference:
vsdeoldify/deepex/__init__.py:46-263 ``ModelColorizer`` driver,
deepex/models/NonlocalNet.py:192-257 ``VGG19_pytorch``, :355-520 ``WarpNet``,
deepex/models/ColorVidNet.py:6-146, deepex/models/FrameColor.py:5-67
``frame_colorization`` glue):

* **VGG19** caffe-style features (r12, r22, r32, r42, r52) of the gray
  current frame; the reference caches the *reference frame's* features once
  per scene and reuses them every frame.
* **WarpNet**: multi-scale feature fusion to H/4, residual blocks, theta/phi
  projections, centered-cosine correlation ``(HW/16)^2`` matmul, softmax at
  temperature 0.01 -> warp the reference LAB + per-pixel similarity map.
  This is the "spatial correspondence as one big MXU einsum" op — the TPU
  answer to the reference's nonlocal gather.
* **ColorVidNet**: 7-channel input ``cat(L, warped_ab, similarity,
  last_pred_LAB)`` -> ab; temporal recurrence through the previous
  prediction gives video consistency (driven by lax.scan in the exemplar
  pipeline).

Sizes follow deepex.get_deepex_size (fast 144x256 / medium 216x384 /
slow 288x512 / slower 360x640).  The WLS edge-aware post-smoother of the
reference (cv2.ximgproc FastGlobalSmoother, lambda=500 sigma=4) is
implemented for real in ``ops/fgs.py`` (separable Thomas-solver Fast
Global Smoother, numpy-oracle tested) and is what the exemplar pipeline
applies (``exemplar/__init__.py`` deepex path); a cheaper guided filter
(``guided_filter_ab``) remains available as an opt-in fast path.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import PtConv

__all__ = [
    "VGG19Features",
    "WarpNet",
    "ColorVidNet",
    "frame_colorization",
    "frame_colorization_batched",
    "encode_reference",
    "get_deepex_size",
    "guided_filter_ab",
    "init_deepex_params",
]

# caffe VGG preprocessing constants (deepex/utils vgg_preprocess)
_VGG_MEAN_BGR = (103.939, 116.779, 123.68)


def get_deepex_size(speed: str = "medium") -> Tuple[int, int]:
    """render speed -> (H, W) (deepex/__init__.py get_deepex_size);
    case-insensitive like the reference's preset handling."""
    return {
        "fast": (144, 256),
        "medium": (216, 384),
        "slow": (288, 512),
        "slower": (360, 640),
    }[speed.lower()]


def _vgg_preprocess(rgb01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB -> caffe BGR*255 - mean."""
    bgr = rgb01[..., ::-1] * 255.0
    return bgr - jnp.asarray(_VGG_MEAN_BGR, rgb01.dtype)


class VGG19Features(nn.Module):
    """VGG19 up to relu5_1, returning (r12, r22, r32, r42, r52)."""

    @nn.compact
    def __call__(self, rgb01):
        x = _vgg_preprocess(rgb01)
        cfg = [
            ("conv1_1", 64), ("conv1_2", 64), ("pool",),
            ("conv2_1", 128), ("conv2_2", 128), ("pool",),
            ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), ("pool",),
            ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512), ("pool",),
            ("conv5_1", 512), ("conv5_2", 512),
        ]
        wanted = {"conv1_2": 0, "conv2_2": 1, "conv3_2": 2, "conv4_2": 3, "conv5_2": 4}
        outs = [None] * 5
        for layer in cfg:
            if layer[0] == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                name, feat = layer
                x = nn.relu(PtConv(feat, 3, 1, 1, name=name)(x))
                if name in wanted:
                    outs[wanted[name]] = x
                    if name == "conv5_2":
                        break
        return tuple(outs)


class _PadConvINPReLU(nn.Module):
    """ReflectionPad(1) + 3x3 conv + InstanceNorm + PReLU."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        x = PtConv(self.features, 3, self.stride, 0, name="conv")(x)
        # InstanceNorm2d (no affine): normalize over H, W per channel
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        x = (x - mean) / jnp.sqrt(var + 1e-5)
        alpha = self.param("prelu", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, x * jnp.asarray(alpha, x.dtype))


class _ResidualBlock(nn.Module):
    """NonlocalNet.py ResidualBlock: reflect-pad convs + instance norms with
    ONE shared PReLU applied after conv1 AND after the residual add."""

    features: int

    @nn.compact
    def __call__(self, x):
        a1 = self.param("prelu", nn.initializers.constant(0.25), (1,))

        def prelu(t):
            return jnp.where(t >= 0, t, t * jnp.asarray(a1, t.dtype))

        y = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        y = PtConv(self.features, 3, 1, 0, name="conv1")(y)
        mean = y.mean(axis=(1, 2), keepdims=True)
        y = (y - mean) / jnp.sqrt(y.var(axis=(1, 2), keepdims=True) + 1e-5)
        y = prelu(y)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        y = PtConv(self.features, 3, 1, 0, name="conv2")(y)
        mean = y.mean(axis=(1, 2), keepdims=True)
        y = (y - mean) / jnp.sqrt(y.var(axis=(1, 2), keepdims=True) + 1e-5)
        return prelu(x + y)


def _feature_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize over channels (deepex utils feature_normalize)."""
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-10
    return x / norm


class WarpNet(nn.Module):
    """Nonlocal correspondence: warp reference LAB onto the current frame.

    Inputs are the VGG relu2_1..relu5_1 features of current (A) and
    reference (B) frames, channel-normalized; output is the warped LAB map
    at full resolution plus the similarity (confidence) map.

    Structured as setup + methods so the reference side can be encoded
    ONCE per scene (``encode``) and correlated against many frames
    (``correlate``) — the torch driver recomputes it per frame.
    """

    feature_channel: int = 64
    inter_channels: int = 256

    def setup(self):
        fc = self.feature_channel
        self.l2a = _PadConvINPReLU(128, 1)
        self.l2b = _PadConvINPReLU(fc, 2)
        self.l3a = _PadConvINPReLU(128, 1)
        self.l3b = _PadConvINPReLU(fc, 1)
        self.l4a = _PadConvINPReLU(256, 1)
        self.l4b = _PadConvINPReLU(fc, 1)
        self.l5a = _PadConvINPReLU(256, 1)
        self.l5b = _PadConvINPReLU(fc, 1)
        self.res1 = _ResidualBlock(fc * 4)
        self.res2 = _ResidualBlock(fc * 4)
        self.res3 = _ResidualBlock(fc * 4)
        self.theta = PtConv(self.inter_channels, 1, 1, 0)
        self.phi = PtConv(self.inter_channels, 1, 1, 0)

    @staticmethod
    def _up2(t):
        return jax.image.resize(
            t, t.shape[:1] + (t.shape[1] * 2, t.shape[2] * 2) + t.shape[3:],
            "nearest",
        )

    def encode(self, feats):
        """Normalized VGG pyramid (r22..r52) -> fused H/4 feature map."""
        f2, f3, f4, f5 = feats[1:] if len(feats) == 5 else feats
        up2 = self._up2
        x2 = self.l2b(self.l2a(f2))
        x3 = self.l3b(self.l3a(f3))
        x4 = up2(self.l4b(self.l4a(f4)))
        x5 = up2(self.l5b(up2(self.l5a(f5))))
        # pad x5 to x2's spatial dims if off by the odd-size rule
        if x5.shape[1] != x2.shape[1] or x5.shape[2] != x2.shape[2]:
            dh = x2.shape[1] - x5.shape[1]
            dw = x2.shape[2] - x5.shape[2]
            x5 = jnp.pad(
                x5,
                ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
                mode="edge",
            )
        cat = jnp.concatenate([x2, x3, x4, x5], axis=-1)
        return self.res3(self.res2(self.res1(cat)))

    def correlate(self, b_lab, a_feat, b_feat, temperature: float = 0.001 * 5):
        """Centered-cosine correspondence + warp.  ``b_lab``/``b_feat`` may
        have batch 1 while ``a_feat`` is (B, ...) — the reference tokens
        broadcast across the frame batch."""
        theta = self.theta(a_feat)
        phi = self.phi(b_feat)

        b_sz, fh, fw, c = theta.shape
        theta = theta.reshape(b_sz, fh * fw, c)
        phi = phi.reshape(phi.shape[0], -1, c)
        # center + L2 normalize along the token axis (torch centers over
        # spatial positions per channel)
        theta = theta - theta.mean(axis=1, keepdims=True)
        phi = phi - phi.mean(axis=1, keepdims=True)
        theta = theta / (jnp.linalg.norm(theta, axis=-1, keepdims=True) + 1e-10)
        phi = phi / (jnp.linalg.norm(phi, axis=-1, keepdims=True) + 1e-10)
        if phi.shape[0] == 1 and b_sz > 1:
            phi_b = jnp.broadcast_to(phi, (b_sz,) + phi.shape[1:])
        else:
            phi_b = phi

        f = jnp.einsum(
            "bnc,bmc->bnm", theta, phi_b, preferred_element_type=jnp.float32
        )
        similarity = jnp.max(f, axis=-1).reshape(b_sz, fh, fw, 1).astype(b_lab.dtype)
        # subtract the row max BEFORE the temperature division: the driver
        # runs at temperature=1e-10 (deepex/__init__.py:172) where f/T hits
        # 1e10-scale logits, and XLA:CPU's fused softmax rewrite overflows
        # to NaN there (jit-only; eager and TPU were fine).  Shifted first,
        # the logits are <= 0 and exp underflows harmlessly — numerically
        # identical to softmax(f/T).
        f_shift = f - jax.lax.stop_gradient(
            jnp.max(f, axis=-1, keepdims=True)
        )
        attn = jax.nn.softmax(f_shift / temperature, axis=-1).astype(b_lab.dtype)

        # downsample reference color x4 (avg pool) and warp
        b_small = nn.avg_pool(b_lab, (4, 4), strides=(4, 4))
        b_tokens = b_small.reshape(b_lab.shape[0], -1, b_lab.shape[-1])
        if b_tokens.shape[0] == 1 and b_sz > 1:
            b_tokens = jnp.broadcast_to(
                b_tokens, (b_sz,) + b_tokens.shape[1:]
            )
        warped = jnp.einsum(
            "bnm,bmc->bnc", attn, b_tokens, preferred_element_type=jnp.float32
        ).astype(b_lab.dtype)
        warped = warped.reshape(b_sz, fh, fw, b_lab.shape[-1])

        # upsample x4 back to image resolution
        up = lambda t: jax.image.resize(
            t, (b_sz, fh * 4, fw * 4, t.shape[-1]), "nearest"
        )
        return up(warped), up(similarity)

    def __call__(self, b_lab, a_feats, b_feats, temperature: float = 0.001 * 5):
        a_feat = self.encode(a_feats)
        b_feat = self.encode(b_feats)
        return self.correlate(b_lab, a_feat, b_feat, temperature)


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d (affine=False, no running stats): normalize over H,W
    per sample/channel.  ColorVidNet's constructor REPLACES its BatchNorms
    with InstanceNorm2d (ColorVidNet.py:108-117) — parameter-free, so the
    published checkpoint carries no norm tensors."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


class _UpConv(nn.Module):
    """Upsample(nearest, 2x) + 3x3 conv — ColorVidNet.py:104-106 replaces
    the deconvs; checkpoint keys are ``convN_1.1.*``."""

    features: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        return PtConv(self.features, 3, 1, 1, name="conv")(x)


class ColorVidNet(nn.Module):
    """7ch input -> ab (ColorVidNet.py:6-146), tanh-bounded LAB ab.

    Input convention (FrameColor.py:64): cat(L-50, warped ab, similarity,
    last LAB with centered L) — the L channels are CENTERED.
    """

    in_channels: int = 7

    @nn.compact
    def __call__(self, x):
        def conv(n, f, dil=1):
            pad = dil
            return PtConv(f, 3, 1, pad, dilation=dil, name=n)

        c11 = nn.relu(PtConv(64, 3, 1, 1, name="conv1_1b")(
            nn.relu(PtConv(32, 3, 1, 1, name="conv1_1a")(x))))
        c12 = nn.relu(conv("conv1_2", 64)(c11))
        c12n = _instance_norm(c12)
        c12ss = PtConv(64, 1, 2, 0, use_bias=False, groups=64, name="conv1_2norm_ss")(c12n)
        c21 = nn.relu(conv("conv2_1", 128)(c12ss))
        c22 = nn.relu(conv("conv2_2", 128)(c21))
        c22n = _instance_norm(c22)
        c22ss = PtConv(128, 1, 2, 0, use_bias=False, groups=128, name="conv2_2norm_ss")(c22n)
        c31 = nn.relu(conv("conv3_1", 256)(c22ss))
        c32 = nn.relu(conv("conv3_2", 256)(c31))
        c33 = nn.relu(conv("conv3_3", 256)(c32))
        c33n = _instance_norm(c33)
        c33ss = PtConv(256, 1, 2, 0, use_bias=False, groups=256, name="conv3_3norm_ss")(c33n)
        c41 = nn.relu(conv("conv4_1", 512)(c33ss))
        c42 = nn.relu(conv("conv4_2", 512)(c41))
        c43 = nn.relu(conv("conv4_3", 512)(c42))
        c43n = _instance_norm(c43)
        c51 = nn.relu(conv("conv5_1", 512, 2)(c43n))
        c52 = nn.relu(conv("conv5_2", 512, 2)(c51))
        c53 = nn.relu(conv("conv5_3", 512, 2)(c52))
        c53n = _instance_norm(c53)
        c61 = nn.relu(conv("conv6_1", 512, 2)(c53n))
        c62 = nn.relu(conv("conv6_2", 512, 2)(c61))
        c63 = nn.relu(conv("conv6_3", 512, 2)(c62))
        c63n = _instance_norm(c63)
        c71 = nn.relu(conv("conv7_1", 512)(c63n))
        c72 = nn.relu(conv("conv7_2", 512)(c71))
        c73 = nn.relu(conv("conv7_3", 512)(c72))
        c73n = _instance_norm(c73)
        c81 = _UpConv(256, name="conv8_1")(c73n)
        c33s = conv("conv3_3_short", 256)(c33n)
        c81c = nn.relu(c81 + c33s)
        c82 = nn.relu(conv("conv8_2", 256)(c81c))
        c83 = nn.relu(conv("conv8_3", 256)(c82))
        c83n = _instance_norm(c83)
        c91 = _UpConv(128, name="conv9_1")(c83n)
        c22s = conv("conv2_2_short", 128)(c22n)
        c91c = nn.relu(c91 + c22s)
        c92 = nn.relu(conv("conv9_2", 128)(c91c))
        c92n = _instance_norm(c92)
        c101 = _UpConv(128, name="conv10_1")(c92n)
        c12s = conv("conv1_2_short", 128)(c12n)
        c101c = nn.relu(c101 + c12s)
        c102 = jnp.where(  # leaky 0.2 per upstream conv10_2
            (y := conv("conv10_2", 128)(c101c)) >= 0, y, y * 0.2
        )
        ab = PtConv(2, 1, 1, 0, name="conv10_ab")(c102)
        return jnp.tanh(ab) * 128.0


def frame_colorization(
    vgg_params,
    warp_params,
    color_params,
    ia_lab: jnp.ndarray,
    ib_lab: jnp.ndarray,
    ia_last_lab: jnp.ndarray,
    features_b: Sequence[jnp.ndarray],
    vggnet: VGG19Features,
    warpnet: WarpNet,
    colornet: ColorVidNet,
    temperature: float = 0.01,
):
    """FrameColor.frame_colorization glue (FrameColor.py:41-67).

    ``ia_lab``: current frame LAB (B,H,W,3); ``ib_lab``: reference LAB;
    ``ia_last_lab``: previous prediction LAB; ``features_b``: cached VGG
    features of the reference.  Returns (predicted ab, warped lab,
    current-frame VGG features for caching).
    """
    ia_l = ia_lab[..., 0:1]
    # gray -> RGB for VGG: replicate normalized L (util.gray2rgb_batch:
    # (centered_l + 50) / 100 == L/100 on raw [0,100] L)
    ia_rgb = jnp.repeat(ia_l / 100.0, 3, axis=-1)
    feats_a = vggnet.apply(vgg_params, ia_rgb)
    a_norm = tuple(_feature_normalize(f) for f in feats_a)
    b_norm = tuple(_feature_normalize(f) for f in features_b)
    # the reference pipeline works in CENTERED lab (l - 50, util.py:63-64);
    # warp and colorize see centered L channels
    center = jnp.asarray([50.0, 0.0, 0.0], ia_lab.dtype)
    warped_lab_c, similarity = warpnet.apply(
        warp_params, ib_lab - center, a_norm, b_norm, temperature
    )
    color_input = jnp.concatenate(
        [ia_l - 50.0, warped_lab_c[..., 1:3], similarity,
         ia_last_lab - center], axis=-1,
    )
    ab = colornet.apply(color_params, color_input)
    return ab, warped_lab_c + center, feats_a


def encode_reference(vgg_params, warp_params, ib_lab, vggnet, warpnet):
    """Per-scene reference precompute: VGG pyramid + WarpNet-encoded H/4
    feature of the reference image (the torch driver recomputes the
    WarpNet ref path per frame; once per scene here)."""
    ib_l = ib_lab[..., 0:1]
    ib_ab = ib_lab[..., 1:3]
    rgb = _ref_lab_to_rgb(ib_l, ib_ab)
    feats_b = vggnet.apply(vgg_params, rgb)
    b_norm = tuple(_feature_normalize(f) for f in feats_b)
    b_feat = warpnet.apply(warp_params, b_norm, method="encode")
    return b_feat


def _ref_lab_to_rgb(l_chan, ab):
    from ..ops.colorspace import lab_to_rgb

    return jnp.clip(
        lab_to_rgb(jnp.concatenate([l_chan, ab], axis=-1)), 0.0, 1.0
    )


def frame_colorization_batched(
    vgg_params,
    warp_params,
    color_params,
    ia_lab: jnp.ndarray,  # (B, H, W, 3) current frames, raw LAB
    ib_lab: jnp.ndarray,  # (1, H, W, 3) scene reference, raw LAB
    ia_last_lab: jnp.ndarray,  # (1, H, W, 3) pinned last-prediction, raw LAB
    b_feat: jnp.ndarray,  # (1, h/4, w/4, 256) encode_reference output
    vggnet: VGG19Features,
    warpnet: WarpNet,
    colornet: ColorVidNet,
    temperature: float = 1e-10,
):
    """Batched frame_colorization: since the reference driver PINS
    I_last_lab_predict per scene (deepex/__init__.py:176 commented-out
    update), every frame of a scene is independent — the whole scene
    batches onto the MXU instead of a per-frame scan."""
    b = ia_lab.shape[0]
    ia_l = ia_lab[..., 0:1]
    ia_rgb = jnp.repeat(ia_l / 100.0, 3, axis=-1)
    feats_a = vggnet.apply(vgg_params, ia_rgb)
    a_norm = tuple(_feature_normalize(f) for f in feats_a)
    a_feat = warpnet.apply(warp_params, a_norm, method="encode")
    center = jnp.asarray([50.0, 0.0, 0.0], ia_lab.dtype)
    warped_c, similarity = warpnet.apply(
        warp_params, ib_lab - center, a_feat, b_feat, temperature,
        method="correlate",
    )
    last_c = jnp.broadcast_to(ia_last_lab - center, ia_lab.shape)
    color_input = jnp.concatenate(
        [ia_l - 50.0, warped_c[..., 1:3], similarity, last_c], axis=-1,
    )
    ab = colornet.apply(color_params, color_input)
    return ab


def guided_filter_ab(
    l_chan: jnp.ndarray, ab: jnp.ndarray, radius: int = 8, eps: float = 1e-3
) -> jnp.ndarray:
    """Edge-aware smoothing of ab guided by L — substitute for the
    reference's WLS FastGlobalSmoother (deepex/__init__.py:199-208;
    SURVEY.md hard-part #6).  Classic guided filter via box means.
    """
    from ..ops.retinex import _box_filter_1d

    def box(x):
        return _box_filter_1d(_box_filter_1d(x, radius, -3), radius, -2)

    guide = l_chan / 100.0
    mean_i = box(guide)
    mean_p = box(ab)
    corr_ip = box(guide * ab)
    corr_ii = box(guide * guide)
    var_i = corr_ii - mean_i * mean_i
    cov_ip = corr_ip - mean_i * mean_p
    a = cov_ip / (var_i + eps)
    b = mean_p - a * mean_i
    return box(a) * guide + box(b)


def init_deepex_params(seed: int = 0, size=(64, 64)):
    """Initialize all three sub-networks (random; converter loads real)."""
    rng = jax.random.PRNGKey(seed)
    h, w = size
    vgg = VGG19Features()
    warp = WarpNet()
    color = ColorVidNet()
    rgb = jnp.zeros((1, h, w, 3), jnp.float32)
    vgg_p = vgg.init(rng, rgb)
    feats = vgg.apply(vgg_p, rgb)
    lab = jnp.zeros((1, h, w, 3), jnp.float32)
    warp_p = warp.init(rng, lab, feats, feats)
    color_p = color.init(rng, jnp.zeros((1, h, w, 7), jnp.float32))
    return vgg_p, warp_p, color_p
