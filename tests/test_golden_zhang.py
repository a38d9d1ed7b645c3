"""Golden-frame fidelity harness (BASELINE target: dE2000 <= 1 vs the
reference's own output).

No pretrained checkpoints exist in this environment, so the oracle runs
the REFERENCE torch ECCVGenerator with seeded random weights through the
reference driver's exact flow (colorization/__init__.py:56-73 +
colorizers/util.py preprocess_img/postprocess_tens), on a REAL test image
from the reference's published benchmark set; the same weights flow
through the converter into the flax engine.  The gate catches any
regression in conversion, LAB plumbing, resize conventions, or the driver
— the full pipeline the published checkpoints will ride."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cv2

torch = pytest.importorskip("torch")

from _ref_loader import load_ref_module, state_dict_numpy
from havc_tpu import engines, metrics
from havc_tpu.models import convert
from havc_tpu.models import zhang as zh

from _golden_images import ALL_IMAGES

TEST_IMAGES = ALL_IMAGES  # all 23 published benchmark images


@pytest.fixture(scope="module")
def torch_eccv16():
    mod = load_ref_module("vsdeoldify.colorization.colorizers.eccv16")
    torch.manual_seed(0)
    return mod.ECCVGenerator().eval()


def _load_test_image(path=None, max_side=320):
    path = path or TEST_IMAGES[0]
    bgr = cv2.imread(path)
    assert bgr is not None, f"missing test asset {path}"
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    h, w = rgb.shape[:2]
    scale = max_side / max(h, w)
    if scale < 1:
        rgb = cv2.resize(rgb, (int(w * scale), int(h * scale)),
                         interpolation=cv2.INTER_AREA)
    return rgb  # uint8 RGB


def _rgb2lab_f(rgb_u8):
    return cv2.cvtColor((rgb_u8 / 255.0).astype(np.float32),
                        cv2.COLOR_RGB2LAB)


def _lab2rgb_f(lab):
    return cv2.cvtColor(lab.astype(np.float32), cv2.COLOR_LAB2RGB)


def _reference_driver(tm, rgb_u8, f_size=256):
    """ModelColorization.colorize_frame_ext flow, transcribed with cv2
    LAB (skimage-equivalent to <0.1 dE)."""
    from PIL import Image

    img_rs = np.asarray(
        Image.fromarray(rgb_u8).resize((f_size, f_size), resample=3)
    )
    lab_orig = _rgb2lab_f(rgb_u8)
    lab_rs = _rgb2lab_f(img_rs)
    tens_l_rs = torch.from_numpy(lab_rs[..., 0])[None, None]
    with torch.no_grad():
        out_ab = tm(tens_l_rs)
    h, w = rgb_u8.shape[:2]
    ab_up = torch.nn.functional.interpolate(
        out_ab, size=(h, w), mode="bilinear"
    )[0].permute(1, 2, 0).numpy()
    lab_out = np.concatenate([lab_orig[..., 0:1], ab_up], axis=-1)
    return np.clip(_lab2rgb_f(lab_out), 0, 1)


def test_zhang_pipeline_golden_de2000(tmp_path, torch_eccv16):
    # convert the SAME torch weights into the engine registry; gate over
    # SEVERAL benchmark images (the reference's methodology is a 23-image
    # set, README.md:217-321)
    sd = state_dict_numpy(torch_eccv16)
    params = convert.convert_params(sd, convert.eccv16_key_map())
    convert.save_params_npz(params, tmp_path / "zhang_eccv16.npz")
    engines.set_weights_dir(str(tmp_path))
    try:
        for path in TEST_IMAGES:
            rgb_u8 = _load_test_image(path)
            ref_out = _reference_driver(torch_eccv16, rgb_u8)

            frames = (rgb_u8 / 255.0).astype(np.float32)[None]
            with jax.default_matmul_precision("highest"):
                got = np.asarray(
                    engines.zhang_frames(jnp.asarray(frames), "eccv16", 256)
                )[0]

            de = metrics.dE2000(
                (ref_out * 255).astype(np.uint8), (got * 255).astype(np.uint8)
            )
            mean_de = float(np.mean(de))
            # BASELINE gate: mean dE2000 <= 1 vs the reference's own output
            assert mean_de <= 1.0, (
                f"{path.rsplit('/', 1)[-1]}: mean dE2000 {mean_de:.3f} > 1.0"
            )
            assert float(np.percentile(de, 99)) <= 5.0
    finally:
        engines.set_weights_dir(None)
