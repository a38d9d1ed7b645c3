"""Golden-frame fidelity gate for the DDColor driver flow (BASELINE
config DD), plus the D+D 50/50 merge anchor.

The torch oracle (tests/_ddcolor_oracle.py) runs the vsddcolor wheel's
pipeline semantics — resize the RGB image FIRST (bilinear, NO antialias,
F.interpolate), extract L from the RESIZED image, render the gray RGB of
LAB (L,0,0), model forward, bilinear ab upsample, join with the
original-resolution L — on real benchmark images; the same weights flow
through the converter (with the stored __config__ geometry) into the
engine registry, and ``engines.ddcolor_frames`` must land within mean
dE2000 <= 1.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cv2

torch = pytest.importorskip("torch")
import torch.nn.functional as TF

from test_ref_parity_ddcolor import oracle, converted  # noqa: F401 fixtures
from havc_tpu import engines, metrics
from havc_tpu.models import convert

RF = 4  # render factor -> input_size = trunc(4/2)*32 = 64 (micro-sized)

from _golden_images import ALL_IMAGES

TEST_IMAGES = ALL_IMAGES  # all 23 published benchmark images


def _load_image(path, max_side=224):
    bgr = cv2.imread(path)
    assert bgr is not None, path
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    h, w = rgb.shape[:2]
    scale = max_side / max(h, w)
    if scale < 1:
        rgb = cv2.resize(rgb, (int(w * scale), int(h * scale)),
                         interpolation=cv2.INTER_AREA)
    return rgb


def _rgb2lab(rgb_f):
    return cv2.cvtColor(rgb_f.astype(np.float32), cv2.COLOR_RGB2LAB)


def _lab2rgb(lab):
    return cv2.cvtColor(lab.astype(np.float32), cv2.COLOR_LAB2RGB)


def _reference_driver(net, rgb_u8, input_size):
    """vsddcolor / upstream ImageColorizationPipeline flow.  Accepts uint8
    or float [0,1] input (float used by the merge-config gate to avoid
    re-quantization noise)."""
    rgb_f = (
        rgb_u8.astype(np.float32) / 255.0
        if rgb_u8.dtype == np.uint8 else rgb_u8.astype(np.float32)
    )
    h, w = rgb_f.shape[:2]
    orig_l = _rgb2lab(rgb_f)[..., 0:1]
    x = torch.from_numpy(rgb_f.transpose(2, 0, 1).copy())[None]
    x_rs = TF.interpolate(x, (input_size, input_size), mode="bilinear",
                          antialias=False)
    rs_np = np.clip(x_rs[0].numpy().transpose(1, 2, 0), 0, 1)
    l_rs = _rgb2lab(rs_np)[..., 0:1]
    gray = _lab2rgb(np.concatenate(
        [l_rs, np.zeros_like(l_rs), np.zeros_like(l_rs)], axis=-1))
    with torch.no_grad():
        ab = net(torch.from_numpy(gray.transpose(2, 0, 1).copy())[None])
    ab_up = TF.interpolate(ab, (h, w), mode="bilinear", antialias=False)
    ab_np = ab_up[0].numpy().transpose(1, 2, 0)
    out = _lab2rgb(np.concatenate([orig_l, ab_np], axis=-1))
    return np.clip(out, 0, 1)


@pytest.fixture(scope="module")
def registry_dir(tmp_path_factory, oracle, converted):  # noqa: F811
    d = tmp_path_factory.mktemp("ddcolor_weights")
    from _ref_loader import state_dict_numpy

    sd = state_dict_numpy(oracle)
    sd = convert.fold_spectral_norm(sd)
    sd = convert.fold_weight_norm(sd)
    cfg = convert.ddcolor_config_from_state_dict(sd)
    tree = dict(converted)
    tree["__config__"] = {
        "json": np.frombuffer(json.dumps(cfg).encode(), np.uint8).copy()
    }
    convert.save_params_npz(tree, d / "ddcolor_artistic.npz")
    return str(d)


@pytest.mark.slow
def test_ddcolor_golden_de2000(registry_dir, oracle):  # noqa: F811
    engines.set_weights_dir(registry_dir)
    try:
        for path in TEST_IMAGES:
            rgb_u8 = _load_image(path)
            ref_out = _reference_driver(oracle, rgb_u8, 64)

            frames = (rgb_u8 / 255.0).astype(np.float32)[None]
            with jax.default_matmul_precision("highest"):
                got = np.asarray(
                    engines.ddcolor_frames(
                        jnp.asarray(frames), model=1, render_factor=RF
                    )
                )[0]

            de = metrics.dE2000(
                (ref_out * 255).astype(np.uint8),
                (got * 255).astype(np.uint8),
            )
            mean_de = float(np.mean(de))
            assert mean_de <= 1.0, (
                f"{os.path.basename(path)}: mean dE2000 {mean_de:.3f} > 1.0"
            )
            assert float(np.percentile(de, 99)) <= 5.0, os.path.basename(path)
    finally:
        engines.set_weights_dir(None)
