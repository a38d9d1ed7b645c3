"""DeepRemaster NetworkC (3D temporal CNN + source-reference attention).

Rebuild of the reference's remaster engine (reference:
vsdeoldify/remaster/model/remasternet.py:103-187 ``NetworkC``; driver
remaster_render.py:51-330 keeps a sliding tensor buffer of <=50 reference
frames and colorizes ``length`` (2-5) frames per forward;
remaster/__init__.py:40-231 scene-aware batching and vivid tweaks).

Layout: (B, T, H, W, C) — flax Conv with 3D kernels is natively
channels-last, so "3D conv" maps directly onto the MXU with no transposes
(the torch original permutes to B,C,T,H,W).

Structure (NetworkC):
* ``down1``: 9 TempConv (conv3d+BN+ELU) blocks, input L - 0.4462414,
  strides 1/2 x3 -> 1/8 spatial
* ``reffeatnet1/2``: same trunk over the RGB reference stack (input - 0.48)
* source-reference attention at 1/8 and 1/16 (global q.k attention between
  source tokens and reference tokens, gamma-gated), self-attention x2
* decoder: UpsampleConcat skip + trilinear upsamples back to 1/1,
  sigmoid 2-channel ab output (in [0,1], remapped to LAB ab by the driver)

``NetworkR`` (restoration) exists in the reference but is unused by HAVC
(SURVEY 2.3); omitted here, documented for parity.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["NetworkC", "init_params", "colorize_window"]


class TempConv(nn.Module):
    """conv3d + BatchNorm3d (inference) + ELU."""

    features: int
    kernel: tuple = (1, 3, 3)
    stride: tuple = (1, 1, 1)
    padding: tuple = (0, 1, 1)

    @nn.compact
    def __call__(self, x):
        pads = [(p, p) for p in self.padding]
        x = nn.Conv(
            self.features,
            kernel_size=self.kernel,
            strides=self.stride,
            padding=pads,
            name="conv",
            dtype=x.dtype,
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        inv = jnp.asarray(scale / jnp.sqrt(var + 1e-5), x.dtype)
        x = x * inv + jnp.asarray(bias - mean * scale / jnp.sqrt(var + 1e-5), x.dtype)
        return nn.elu(x)


def _up_spatial(x, factor=2):
    b, t, h, w, c = x.shape
    return jax.image.resize(x, (b, t, h * factor, w * factor, c), "trilinear")


class Upsample3d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = _up_spatial(x, 2)
        return TempConv(self.features, (3, 3, 3), (1, 1, 1), (1, 1, 1), name="conv")(x)


class SourceReferenceAttention(nn.Module):
    """Global source<-reference attention over (T*H*W) tokens, gamma-gated.

    remasternet.py:31-77: q from source (C/8), k/v from reference, softmax
    over reference tokens, ``gamma * out + source``.
    """

    channels: int

    @nn.compact
    def __call__(self, source, reference):
        b, st, sh, sw, c = source.shape
        q = nn.Conv(self.channels // 8, (1, 1, 1), name="query", dtype=source.dtype)(source)
        k = nn.Conv(self.channels // 8, (1, 1, 1), name="key", dtype=source.dtype)(reference)
        v = nn.Conv(self.channels, (1, 1, 1), name="value", dtype=source.dtype)(reference)
        q = q.reshape(b, -1, q.shape[-1])
        k = k.reshape(b, -1, k.shape[-1])
        v = v.reshape(b, -1, v.shape[-1])
        logits = jnp.einsum(
            "bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(logits, axis=-1).astype(source.dtype)
        out = jnp.einsum(
            "bnm,bmc->bnc", attn, v, preferred_element_type=jnp.float32
        ).astype(source.dtype)
        out = out.reshape(b, st, sh, sw, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return jnp.asarray(gamma, source.dtype) * out + source


class _Trunk(nn.Module):
    """The shared 9-block downsampling trunk (down1 / reffeatnet1)."""

    replication_pad: bool = False

    @nn.compact
    def __call__(self, x):
        if self.replication_pad:
            # ReplicationPad3d((1,1,1,1,0,0)): H/W padded by 1, T untouched;
            # first conv then has padding 0
            x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            x = TempConv(64, (1, 3, 3), (1, 2, 2), (0, 0, 0), name="b0")(x)
        else:
            x = TempConv(64, (1, 3, 3), (1, 2, 2), (0, 1, 1), name="b0")(x)
        x = TempConv(128, name="b1")(x)
        x = TempConv(128, name="b2")(x)
        x = TempConv(256, (1, 3, 3), (1, 2, 2), (0, 1, 1), name="b3")(x)
        x = TempConv(256, name="b4")(x)
        x = TempConv(256, name="b5")(x)
        x = TempConv(512, (1, 3, 3), (1, 2, 2), (0, 1, 1), name="b6")(x)
        x = TempConv(512, name="b7")(x)
        x = TempConv(512, name="b8")(x)
        return x


class NetworkC(nn.Module):
    """Input: L (B,T,H,W,1) in [0,1]; refs: RGB (B,Tr,H,W,3) in [0,1];
    output: ab (B,T,H,W,2) in [0,1] (sigmoid).

    setup + methods so the reference trunk (``encode_refs`` — the heavy
    half: the 9-block trunk over <=50 ref frames) runs ONCE per sliding
    window position and is reused across all the frame windows that share
    it (the torch driver recomputes it every forward)."""

    def setup(self):
        self.down1 = _Trunk(replication_pad=True)
        self.reffeatnet1 = _Trunk()
        self.stattn1 = SourceReferenceAttention(512)
        self.flat0 = TempConv(512)
        self.flat1 = TempConv(512)
        self.down2_0 = TempConv(512, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        self.down2_1 = TempConv(512)
        self.ref2_0 = TempConv(512, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        self.ref2_1 = TempConv(512)
        self.ref2_2 = TempConv(512)
        self.stattn2 = SourceReferenceAttention(512)
        self.conv1 = TempConv(512)
        self.selfattn1 = SourceReferenceAttention(512)
        self.up1 = TempConv(512, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        self.selfattn2 = SourceReferenceAttention(512)
        self.conv2 = TempConv(256, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        self.up2_0 = Upsample3d(128)
        self.up2_1 = TempConv(64, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        self.up3_0 = Upsample3d(32)
        self.up3_1 = TempConv(16, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        self.up4_0 = TempConv(8, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        self.up4_out = nn.Conv(2, (3, 3, 3), padding=[(1, 1), (1, 1), (1, 1)])

    def encode_refs(self, x_refs):
        """Reference stack -> (reffeat @1/8, reffeat2 @1/16)."""
        reffeat = self.reffeatnet1(x_refs - 0.48)
        reffeat2 = self.ref2_2(self.ref2_1(self.ref2_0(reffeat)))
        return reffeat, reffeat2

    def colorize_with_refs(self, x, reffeat, reffeat2):
        """Forward against pre-encoded reference features.  ``reffeat*``
        may be batch 1 with x batched (broadcast across windows)."""
        b = x.shape[0]

        def bcast(r):
            if r.shape[0] == 1 and b > 1:
                return jnp.broadcast_to(r, (b,) + r.shape[1:])
            return r

        x1 = self.down1(x - 0.4462414)
        if reffeat is not None:
            x1 = self.stattn1(x1, bcast(reffeat))
        x2 = self.flat1(self.flat0(x1))
        out = self.down2_1(self.down2_0(x1))
        if reffeat2 is not None:
            out = self.stattn2(out, bcast(reffeat2))
        out = self.conv1(out)
        out = self.selfattn1(out, out)
        out = _up_spatial(out, 2)
        out = jnp.concatenate([out, x2], axis=-1)
        out = self.up1(out)
        out = self.selfattn2(out, out)
        out = self.conv2(out)
        out = self.up2_1(self.up2_0(out))
        out = self.up3_1(self.up3_0(out))
        out = _up_spatial(out, 2)
        out = self.up4_0(out)
        out = self.up4_out(out)
        return nn.sigmoid(out)

    def __call__(self, x, x_refs: Optional[jnp.ndarray] = None):
        if x_refs is not None:
            reffeat, reffeat2 = self.encode_refs(x_refs)
        else:
            reffeat = reffeat2 = None
        return self.colorize_with_refs(x, reffeat, reffeat2)


def init_params(seed: int = 0, size: int = 64, t: int = 2, n_refs: int = 2):
    model = NetworkC()
    rng = jax.random.PRNGKey(seed)
    x = jnp.zeros((1, t, size, size, 1), jnp.float32)
    refs = jnp.zeros((1, n_refs, size, size, 3), jnp.float32)
    return model.init(rng, x, refs)


def colorize_window(
    params,
    model: NetworkC,
    luma01: jnp.ndarray,
    refs_rgb: jnp.ndarray,
) -> jnp.ndarray:
    """One inference window: L (B,T,H,W,1) + refs -> ab01 (B,T,H,W,2).

    The driver (exemplar/remaster pipeline) maps ab01 back to LAB ab via
    ``(ab01 - 0.5) * 2 * 110`` and joins with the original luma.
    """
    return model.apply(params, luma01, refs_rgb)
