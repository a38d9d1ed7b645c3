"""ColorMNet networks in Flax: key/value encoders, local attention, decoder.

Rebuild of the reference's ColorMNet model stack (reference:
vsdeoldify/colormnet/model/network.py:18-225 ``ColorMNet``,
modules.py:22-280 (FeatureFusionBlock/CBAM, HiddenUpdater/Reinforcer,
ValueEncoder, KeyEncoder_DINOv2_v6, KeyProjection, Decoder, UpsampleBlock),
resnet.py:286-399 (CrossChannelAttention, Fuse),
attention.py:714-915 ``LocalGatedPropagation``,
model/memory_util.py:7-65 (anisotropic L2 similarity + top-k softmax)).

The colorization-as-segmentation trick: the two LAB chroma channels are two
"objects" propagated like masks — tensors carry an object axis O=2 and the
decoder predicts one tanh channel per object (network.py:137-145).

TPU-first deviations (behavior-preserving):
* The CUDA ``spatial_correlation_sampler`` becomes an unfold-einsum local
  window attention (the reference's own fallback, attention.py:207-213) —
  and aggregation stays *local*: attention weights over the 15x15 window
  combine unfolded values directly instead of scattering into an (HW x HW)
  global matrix (attention.py local2global), removing an O((HW)^2) blowup.
* All group (object) ops fold O into the batch axis for MXU shaping.
* DINOv2 backbone is models/vit.py (pure Flax, converted weights).

Memory readout math matches memory_util.get_similarity: anisotropic L2
``(-a_sq + 2ab - b_sq) * shrinkage / sqrt(Ck)`` with selection weighting,
then top-k softmax.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import BatchNormInference, PtConv
from .resnet import ResNetBody
from .vit import DinoSegmentor

__all__ = [
    "KeyEncoder",
    "KeyProjection",
    "ValueEncoder",
    "Decoder",
    "LocalAttention",
    "get_similarity",
    "topk_softmax",
    "readout",
    "COLORMNET_CONFIGS",
]

COLORMNET_CONFIGS = {
    # full published geometry
    "full": dict(key_dim=64, value_dim=512, hidden_dim=64, resnet="resnet50",
                 vit="dinov2_s14"),
    # test/dev scale
    "micro": dict(key_dim=8, value_dim=16, hidden_dim=8, resnet="nano",
                  vit="nano"),
}


class _LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC feature maps (resnet.py LayerNorm2d)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(name="ln")(x)


class CrossChannelAttention(nn.Module):
    """Restormer-style transposed (channel) attention between encoder and
    decoder features (resnet.py:286-330)."""

    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, enc, dnc):
        b, h, w, c = enc.shape
        d2 = self.dim * 2

        def qkv(x, name):
            y = nn.Conv(d2, (1, 1), name=f"{name}", dtype=x.dtype)(x)
            return nn.Conv(
                d2, (3, 3), padding="SAME", feature_group_count=d2,
                name=f"{name}_dw", dtype=x.dtype,
            )(y)

        q = qkv(enc, "to_q").reshape(b, h * w, self.heads, d2 // self.heads)
        k = qkv(dnc, "to_k").reshape(b, h * w, self.heads, d2 // self.heads)
        v = qkv(dnc, "to_v").reshape(b, h * w, self.heads, d2 // self.heads)
        # channel attention: tokens are channels, normalized over positions
        q = q / (jnp.linalg.norm(q, axis=1, keepdims=True) + 1e-6)
        k = k / (jnp.linalg.norm(k, axis=1, keepdims=True) + 1e-6)
        temp = self.param("temperature", nn.initializers.ones, (self.heads, 1, 1))
        attn = jnp.einsum(
            "bnhc,bnhd->bhcd", q, k, preferred_element_type=jnp.float32
        ) * jnp.asarray(temp, jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(enc.dtype)
        out = jnp.einsum(
            "bhcd,bnhd->bnhc", attn, v, preferred_element_type=jnp.float32
        ).astype(enc.dtype)
        out = out.reshape(b, h, w, d2)
        return nn.Conv(self.dim, (1, 1), name="to_out", dtype=enc.dtype)(out)


class Fuse(nn.Module):
    """DINOv2 <-> ResNet feature fusion (resnet.py:370-399)."""

    out_feat: int

    @nn.compact
    def __call__(self, enc, dnc):
        enc = PtConv(self.out_feat, 3, 1, 1, name="encode_enc")(enc)
        res = enc
        enc = _LayerNorm2d(self.out_feat, name="norm1")(enc)
        dnc = _LayerNorm2d(self.out_feat, name="norm2")(dnc)
        out = CrossChannelAttention(self.out_feat, name="crossattn")(enc, dnc) + res
        out = _LayerNorm2d(self.out_feat, name="norm3")(out)
        return nn.relu(out)


class KeyEncoder(nn.Module):
    """ResNet50 f16/f8/f4 + DINOv2 segmentor, fused per scale
    (modules.KeyEncoder_DINOv2_v6)."""

    resnet: str = "resnet50"
    vit: str = "dinov2_s14"

    @nn.compact
    def __call__(self, rgb):
        feats = ResNetBody.from_config(self.resnet, num_stages=3)(rgb)
        _, f4, f8, f16 = feats  # layer1 (1/4), layer2 (1/8), layer3 (1/16)
        dims = (f16.shape[-1], f8.shape[-1], f4.shape[-1])
        dino = DinoSegmentor(vit_config=self.vit, name="network2")(rgb)

        def fit(x, ref):
            if x.shape[1:3] != ref.shape[1:3]:
                x = jax.image.resize(
                    x, (x.shape[0],) + ref.shape[1:3] + (x.shape[-1],),
                    "bilinear",
                )
            return x

        g16 = Fuse(dims[0], name="fuse1")(fit(dino, f16), f16)
        up2 = jax.image.resize(
            dino, (dino.shape[0], dino.shape[1] * 2, dino.shape[2] * 2, dino.shape[-1]),
            "bilinear",
        )
        g8 = Fuse(dims[1], name="fuse2")(fit(up2, f8), f8)
        up4 = jax.image.resize(
            dino, (dino.shape[0], dino.shape[1] * 4, dino.shape[2] * 4, dino.shape[-1]),
            "bilinear",
        )
        g4 = Fuse(dims[2], name="fuse3")(fit(up4, f4), f4)
        return g16, g8, g4


class KeyProjection(nn.Module):
    """key (Ck) + shrinkage (d^2+1) + selection (sigmoid) heads
    (modules.py:213-230)."""

    key_dim: int = 64

    @nn.compact
    def __call__(self, x):
        key = PtConv(self.key_dim, 3, 1, 1, name="key_proj")(x)
        shrinkage = PtConv(1, 3, 1, 1, name="d_proj")(x) ** 2 + 1
        selection = nn.sigmoid(PtConv(self.key_dim, 3, 1, 1, name="e_proj")(x))
        return key, shrinkage, selection


class CBAM(nn.Module):
    """Convolutional block attention (channel MLP + spatial 7x7)."""

    features: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        r = max(self.features // self.reduction, 1)
        mlp1 = nn.Dense(r, name="mlp1", dtype=x.dtype)
        mlp2 = nn.Dense(self.features, name="mlp2", dtype=x.dtype)
        avg = mlp2(nn.relu(mlp1(x.mean(axis=(1, 2)))))
        mx = mlp2(nn.relu(mlp1(x.max(axis=(1, 2)))))
        ca = nn.sigmoid(avg + mx)[:, None, None, :]
        x = x * ca
        # channel-pool order is (max, mean) — matches the reference CBAM's
        # ChannelPool (cbam.py:52-54) so converted spatial-conv weights see
        # their original input channel order
        sp = jnp.concatenate(
            [x.max(axis=-1, keepdims=True), x.mean(axis=-1, keepdims=True)],
            axis=-1,
        )
        sa = nn.sigmoid(
            nn.Conv(1, (7, 7), padding="SAME", name="spatial", dtype=x.dtype)(sp)
        )
        return x * sa


class GroupResBlock(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, g):
        out = PtConv(self.out_dim, 3, 1, 1, name="conv1")(nn.relu(g))
        out = PtConv(self.out_dim, 3, 1, 1, name="conv2")(nn.relu(out))
        if g.shape[-1] != self.out_dim:
            g = PtConv(self.out_dim, 3, 1, 1, name="downsample")(g)
        return out + g


class FeatureFusionBlock(nn.Module):
    """x (image feature) ++ g (per-object feature) -> fused (modules.py:22-41).

    Object axis folded into batch: ``g`` is (B*O, H, W, Cg); ``x`` is
    (B, H, W, Cx) and is repeated per object.
    """

    mid_dim: int
    out_dim: int
    num_objects: int = 2

    @nn.compact
    def __call__(self, x, g):
        x_rep = jnp.repeat(x, self.num_objects, axis=0)
        g = jnp.concatenate([x_rep, g], axis=-1)
        g = GroupResBlock(self.mid_dim, name="block1")(g)
        r = CBAM(self.mid_dim, name="attention")(g)
        return GroupResBlock(self.out_dim, name="block2")(g + r)


class GRUUpdate(nn.Module):
    """The XMem 'new value before forget gate' GRU (modules.py:44-102)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, g, h):
        gh = jnp.concatenate([g, h], axis=-1)
        values = PtConv(self.hidden_dim * 3, 3, 1, 1, name="transform")(gh)
        forget = nn.sigmoid(values[..., : self.hidden_dim])
        update = nn.sigmoid(values[..., self.hidden_dim : self.hidden_dim * 2])
        new = jnp.tanh(values[..., self.hidden_dim * 2 :])
        return forget * h * (1 - update) + update * new


class ValueEncoder(nn.Module):
    """frame + per-object chroma channel -> value (modules.py:105-156).

    Input: image (B,H,W,3), chroma masks (B,O,H,W) stacked as
    (mask, other-mask) pairs like the reference's single_object=False path.
    """

    value_dim: int = 512
    hidden_dim: int = 64
    resnet: str = "resnet18"
    num_objects: int = 2

    @nn.compact
    def __call__(self, image, f16_key, hidden, chroma, deep_update: bool = True):
        b = image.shape[0]
        o = self.num_objects
        # (B, O, H, W, 2): own channel + the other channel
        others = jnp.flip(chroma, axis=1)
        g = jnp.stack([chroma, others], axis=-1)
        img_rep = jnp.repeat(image[:, None], o, axis=1)
        g = jnp.concatenate([img_rep, g], axis=-1)  # (B, O, H, W, 5)
        g = g.reshape((b * o,) + g.shape[2:])
        feats = ResNetBody.from_config(self.resnet, num_stages=3)(g)
        g16 = feats[3]  # layer3, 1/16
        if g16.shape[1:3] != f16_key.shape[1:3]:
            g16 = jax.image.resize(
                g16, (g16.shape[0],) + f16_key.shape[1:3] + (g16.shape[-1],),
                "bilinear",
            )
        g16 = FeatureFusionBlock(
            self.value_dim, self.value_dim, num_objects=o, name="fuser"
        )(f16_key, g16)
        if deep_update:
            hidden = GRUUpdate(self.hidden_dim, name="hidden_reinforce")(g16, hidden)
        return g16, hidden


class UpsampleBlock(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, skip_f, up_g, num_objects: int = 2):
        skip = PtConv(up_g.shape[-1], 3, 1, 1, name="skip_conv")(skip_f)
        skip = jnp.repeat(skip, num_objects, axis=0)
        g = jax.image.resize(
            up_g,
            (up_g.shape[0], up_g.shape[1] * 2, up_g.shape[2] * 2, up_g.shape[-1]),
            "bilinear",
        )
        return GroupResBlock(self.out_dim, name="out_conv")(skip + g)


class Decoder(nn.Module):
    """memory readout + multi-scale features -> per-object ab logit
    (modules.py:233-280; tanh applied by the caller per network.py:142)."""

    value_dim: int = 512
    hidden_dim: int = 64
    num_objects: int = 2

    @nn.compact
    def __call__(self, f16, f8, f4, hidden, memory_readout):
        o = self.num_objects
        g = jnp.concatenate([memory_readout, hidden], axis=-1)
        g16 = FeatureFusionBlock(512, 512, num_objects=o, name="fuser")(f16, g)
        g8 = UpsampleBlock(256, name="up_16_8")(f8, g16, o)
        g4 = UpsampleBlock(256, name="up_8_4")(f4, g8, o)
        logits = PtConv(1, 3, 1, 1, name="pred")(nn.relu(g4))

        # hidden update from multi-scale g; downsampling is area-mode
        # (HiddenUpdater, modules.py:59-61 downsample_groups mode='area'
        # ratios 1/2 and 1/4 == average pooling)
        g4h = jnp.concatenate([g4, logits], axis=-1)

        def area_down(x, r):
            return nn.avg_pool(x, (r, r), strides=(r, r))

        mid = PtConv(256, 1, 1, 0, name="hu_g16")(g16)
        mid = mid + PtConv(256, 1, 1, 0, name="hu_g8")(area_down(g8, 2))
        mid = mid + PtConv(256, 1, 1, 0, name="hu_g4")(area_down(g4h, 4))
        hidden = GRUUpdate(self.hidden_dim, name="hidden_update")(mid, hidden)

        b_o = logits.shape[0]
        logits_up = jax.image.resize(
            logits, (b_o, logits.shape[1] * 4, logits.shape[2] * 4, 1),
            "bilinear",
        )
        return hidden, logits_up


class LocalAttention(nn.Module):
    """Window-15 local gated propagation (attention.py:714-915) as
    unfold-einsum; aggregation stays local (no HW x HW matrix).

    Geometry matches the reference ``short_term_attn`` instantiation
    exactly (network.py:37-45): ``use_linear=False`` (no QK/V projections),
    ``num_head=1``, ``expand_ratio=1`` and ``d_vu = num_objects * Cv`` —
    the two chroma objects' values are attended JOINTLY as one 2*Cv-channel
    map, mixed by the depthwise conv + output projection.

    q, k: (B, H, W, d_qk) raw projected keys; v: (B, H, W, d_vu = O*Cv).
    Learned tensors (checkpoint keys under ``short_term_attn.``):
    relative_emb_k (1x1 conv), dw_conv.conv (5x5 depthwise, no bias),
    projection (linear).  ``linear_U`` exists in checkpoints but is unused
    by the reference forward (attention.py:790, 855) — excluded.
    """

    d_qk: int
    d_vu: int
    max_dis: int = 7
    # None = auto: the Pallas VMEM-resident kernel on TPU (the unfold
    # fallback materializes (H,W,225,Cv) patches in HBM — ~55x slower at
    # the published geometry, ops/pallas_attn.py), unfold elsewhere
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, q, k, v):
        win = 2 * self.max_dis + 1
        b, h, w, _ = q.shape

        # relative position embedding from the *unscaled* query
        # (attention.py:812 relative_emb_k(q) before q /= T)
        rel = nn.Conv(win * win, (1, 1), name="relative_emb_k",
                      dtype=q.dtype)(q)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            from ..ops.pallas_attn import local_window_attention

            out = local_window_attention(
                q, k, v, rel, max_dis=self.max_dis
            ).astype(v.dtype)
            out = nn.Conv(
                self.d_vu, (5, 5), padding="SAME",
                feature_group_count=self.d_vu, use_bias=False,
                name="dw_conv", dtype=out.dtype,
            )(out)
            return nn.Dense(self.d_vu, name="projection", dtype=out.dtype)(out)

        scale = jnp.sqrt(jnp.float32(self.d_qk)).astype(q.dtype)

        def unfold(x):
            # (N, H, W, C) -> (N, H, W, win*win, C) zero-padded windows
            n, c = x.shape[0], x.shape[-1]
            patches = jax.lax.conv_general_dilated_patches(
                x.transpose(0, 3, 1, 2),
                filter_shape=(win, win),
                window_strides=(1, 1),
                padding=[(self.max_dis, self.max_dis)] * 2,
            )  # (N, C*win*win, H, W)
            patches = patches.reshape(n, c, win * win, h, w)
            return patches.transpose(0, 3, 4, 2, 1)

        k_unf = unfold(k)  # (B,H,W,W2,C)
        qk = jnp.einsum(
            "bhwc,bhwnc->bhwn", q / scale, k_unf,
            preferred_element_type=jnp.float32,
        )
        # mask out-of-bounds window positions (the reference's qk_mask,
        # attention.py:800-808) — detect via an unfolded ones mask
        ones = jnp.ones((1, h, w, 1), q.dtype)
        mask = unfold(ones)[..., 0]  # (1,H,W,W2)
        qk = qk + rel.astype(jnp.float32)
        qk = jnp.where(mask > 0.5, qk, -1e8)
        attn = jax.nn.softmax(qk, axis=-1).astype(v.dtype)

        v_unf = unfold(v)  # (B,H,W,W2,Cv)
        out = jnp.einsum(
            "bhwn,bhwnc->bhwc", attn, v_unf,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        # DWConv2d: 5x5 depthwise, NO bias (basic.py:75-84) + Linear
        out = nn.Conv(
            self.d_vu, (5, 5), padding="SAME", feature_group_count=self.d_vu,
            use_bias=False, name="dw_conv", dtype=out.dtype,
        )(out)
        return nn.Dense(self.d_vu, name="projection", dtype=out.dtype)(out)


# --- memory readout math (memory_util.py) -----------------------------------


def get_similarity(
    mk: jnp.ndarray,
    ms: Optional[jnp.ndarray],
    qk: jnp.ndarray,
    qe: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Anisotropic L2 similarity (memory_util.get_similarity).

    mk: (N, Ck) memory keys; ms: (N,) shrinkage; qk: (P, Ck) query keys;
    qe: (P, Ck) query selection.  Returns (N, P).
    """
    ck = mk.shape[-1]
    # f32-exact contractions: memory addressing is sensitive to the
    # low-precision GEMM dispatch (see ops/colorspace notes)
    hp = jax.lax.Precision.HIGHEST
    if qe is not None:
        a_sq = jnp.einsum("nc,pc->np", mk**2, qe,
                          preferred_element_type=jnp.float32, precision=hp)
        two_ab = 2.0 * jnp.einsum(
            "nc,pc->np", mk, qk * qe,
            preferred_element_type=jnp.float32, precision=hp,
        )
        b_sq = jnp.einsum("pc,pc->p", qe, qk**2,
                          preferred_element_type=jnp.float32, precision=hp)[None]
        sim = -a_sq + two_ab - b_sq
    else:
        a_sq = jnp.sum(mk**2, axis=-1)[:, None]
        two_ab = 2.0 * jnp.einsum("nc,pc->np", mk, qk,
                                  preferred_element_type=jnp.float32, precision=hp)
        sim = -a_sq + two_ab
    if ms is not None:
        sim = sim * ms[:, None]
    return sim / jnp.sqrt(jnp.float32(ck))


def topk_softmax(sim: jnp.ndarray, top_k: int = 30, valid: Optional[jnp.ndarray] = None):
    """Top-k softmax over the memory axis (memory_util.do_softmax).

    sim: (N, P); valid: (N,) mask of live memory slots.  Static-shape
    top-k (jax.lax.top_k over N) -> sparse affinity, plus per-slot usage.
    """
    if valid is not None:
        sim = jnp.where(valid[:, None], sim, -1e30)
    k = min(top_k, sim.shape[0])
    values, idx = jax.lax.top_k(sim.T, k)  # (P, k)
    # finite-safe softmax: an empty memory (all slots masked) must produce
    # a zero readout, not NaN — happens on the very first frame before any
    # insert
    live = values > -1e29
    x_exp = jnp.where(live, jnp.exp(values - values[:, :1]), 0.0)
    x_exp = x_exp / jnp.maximum(jnp.sum(x_exp, axis=-1, keepdims=True), 1e-30)
    affinity = jnp.zeros_like(sim.T).at[
        jnp.arange(sim.shape[1])[:, None], idx
    ].set(x_exp)  # (P, N)
    usage = affinity.sum(axis=0)  # (N,)
    return affinity.T, usage


def readout(affinity: jnp.ndarray, mv: jnp.ndarray) -> jnp.ndarray:
    """Weighted sum of memory values: (N, P) x (N, Cv) -> (P, Cv)."""
    return jnp.einsum("np,nc->pc", affinity, mv, preferred_element_type=jnp.float32)
