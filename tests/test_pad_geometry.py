"""Aspect-preserving pad/restore (SmartResize / ClipPadder geometry,
vsresize.py:159-411)."""
import numpy as np
import jax.numpy as jnp

from havc_tpu.ops.resize import (
    PadMeta, pad_to_square, smart_resize_pad, smart_resize_restore,
    unpad_from_square,
)


def _smooth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    y = np.linspace(0, 1, h)[:, None, None]
    x = np.linspace(0, 1, w)[None, :, None]
    base = 0.25 + 0.5 * (0.5 * y + 0.5 * x) + 0.0 * rng.random((h, w, 1))
    return np.repeat(base, 3, axis=-1).astype(np.float32)[None]


def test_smart_pad_tall_clip_gets_vertical_borders():
    # 1:1 clip into a 9:16-wide target -> side borders
    frames = _smooth(64, 64)
    out, meta = smart_resize_pad(jnp.asarray(frames), 72, 128)
    assert out.shape == (1, 72, 128, 3)
    assert meta.pad_w > 0 and meta.pad_h == 0
    # border columns are black-ish, content center is not
    assert float(np.asarray(out)[0, 36, 1].mean()) < 0.05
    assert float(np.asarray(out)[0, 36, 64].mean()) > 0.2


def test_smart_pad_wide_clip_gets_horizontal_borders():
    frames = _smooth(32, 128)
    out, meta = smart_resize_pad(jnp.asarray(frames), 72, 128)
    assert meta.pad_h > 0 and meta.pad_w == 0
    assert float(np.asarray(out)[0, 1, 64].mean()) < 0.05


def test_smart_pad_restore_roundtrip():
    frames = _smooth(64, 64)
    out, meta = smart_resize_pad(jnp.asarray(frames), 72, 128)
    back = np.asarray(smart_resize_restore(out, meta))
    assert back.shape == frames.shape
    # interior content survives the pad->resize->restore->crop loop
    err = np.abs(back[0, 8:-8, 8:-8] - frames[0, 8:-8, 8:-8]).mean()
    assert err < 0.02, err


def test_aspect_preserved_not_stretched():
    """A circleish blob must keep its aspect ratio through the working
    transform (the round-1 stretch distorted it)."""
    h, w = 64, 64
    yy, xx = np.mgrid[0:h, 0:w]
    blob = ((yy - 32) ** 2 + (xx - 32) ** 2 < 14 ** 2).astype(np.float32)
    frames = np.repeat(blob[None, :, :, None], 3, axis=-1)
    out, meta = smart_resize_pad(jnp.asarray(frames), 72, 128)
    o = np.asarray(out)[0, :, :, 0] > 0.5
    rows = np.where(o.any(axis=1))[0]
    cols = np.where(o.any(axis=0))[0]
    height = rows.max() - rows.min() + 1
    width = cols.max() - cols.min() + 1
    assert abs(height - width) <= 3, (height, width)


def test_clip_padder_gray_square_roundtrip():
    frames = _smooth(48, 96)
    out, meta = pad_to_square(jnp.asarray(frames), size=128)
    assert out.shape == (1, 128, 128, 3)
    # gray-128 borders (ClipPadder pads with (128,128,128))
    top = float(np.asarray(out)[0, 2, 64].mean())
    assert abs(top - 128.0 / 255.0) < 1e-3
    back = np.asarray(unpad_from_square(out, meta, size=128))
    assert back.shape == frames.shape
    err = np.abs(back[0, 6:-6, 6:-6] - frames[0, 6:-6, 6:-6]).mean()
    assert err < 0.02, err
