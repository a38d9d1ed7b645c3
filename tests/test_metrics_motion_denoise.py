"""Metrics harness, motion detector, NLM degrain."""
import numpy as np
import pytest
import jax.numpy as jnp

from havc_tpu import metrics
from havc_tpu.ops.denoise import degrain, nlm_luma
from havc_tpu.scene.motion import scene_detect_motion


class TestMetrics:
    def test_identical_zero(self, rgb_batch):
        s = metrics.compare_images(rgb_batch[0], rgb_batch[0])
        assert s["dE2000_mean"] < 1e-3
        assert s["psnr"] == float("inf")

    def test_perturbation_scales(self, rgb_batch):
        a = rgb_batch[0]
        small = np.clip(a + 0.01, 0, 1)
        big = np.clip(a + 0.1, 0, 1)
        s1 = metrics.compare_images(a, small)
        s2 = metrics.compare_images(a, big)
        assert s2["dE2000_mean"] > s1["dE2000_mean"] > 0

    def test_clip_stats(self, rng):
        f1 = rng.random((3, 16, 16, 3), dtype=np.float32)
        f2 = np.clip(f1 + 0.02, 0, 1)
        s = metrics.compare_clip(f1, f2)
        assert s["frames"] == 3
        assert s["dE2000_worst_frame"] >= s["dE2000_mean"] * 0.5

    def test_real_test_image(self):
        from havc_tpu.io import read_image

        img = read_image("/root/reference/test_images/Image_01_test.jpg")
        s = metrics.compare_images(img, img)
        assert s["dE2000_mean"] < 1e-3


class TestMotionDetect:
    def test_detects_content_change(self, rng):
        # panning-like motion within segments, hard cut between
        base1 = rng.random((80, 100), dtype=np.float32)
        base2 = rng.random((80, 100), dtype=np.float32)
        frames = []
        for i in range(5):
            frames.append(np.roll(base1, i * 2, axis=1)[:64, :64])
        for i in range(5):
            frames.append(np.roll(base2, i * 2, axis=1)[:64, :64])
        clip = np.stack(frames)[..., None].repeat(3, axis=-1)
        flags = scene_detect_motion(clip, search=4)
        assert flags.sc_prev[0] == 1
        assert flags.sc_prev[5] == 1
        # panning frames should NOT trigger (motion search finds matches)
        assert flags.sc_prev[1:5].sum() == 0


class TestDenoise:
    def test_reduces_noise(self, rng):
        clean = np.full((1, 32, 32), 0.5, np.float32)
        noisy = np.clip(clean + rng.normal(0, 0.05, clean.shape).astype(np.float32), 0, 1)
        out = np.asarray(nlm_luma(jnp.asarray(noisy)))
        assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean() * 0.7

    def test_preserves_edges(self):
        img = np.zeros((1, 32, 32), np.float32)
        img[:, :, 16:] = 1.0
        out = np.asarray(nlm_luma(jnp.asarray(img)))
        # edge stays sharp-ish (NLM is edge preserving)
        assert out[0, 16, 14] < 0.2 and out[0, 16, 18] > 0.8

    def test_degrain_rgb_luma_only(self, rng):
        rgb = rng.random((1, 32, 32, 3), dtype=np.float32)
        out = np.asarray(degrain(jnp.asarray(rgb), strength=1))
        assert out.shape == rgb.shape
        assert np.isfinite(out).all()


class TestXvidDetect:
    def test_detects_content_change(self, rng):
        """Xvid keyframe rule: panning frames find motion matches (inter
        wins -> no keyframe); a hard cut makes intra cheaper than any
        motion match for most blocks -> keyframe."""
        from havc_tpu.scene.motion import scene_detect_xvid

        base1 = rng.random((80, 100), dtype=np.float32)
        base2 = rng.random((80, 100), dtype=np.float32)
        frames = []
        for i in range(5):
            frames.append(np.roll(base1, i * 2, axis=1)[:64, :64])
        for i in range(5):
            frames.append(np.roll(base2, i * 2, axis=1)[:64, :64])
        clip = np.stack(frames)[..., None].repeat(3, axis=-1)
        flags = scene_detect_xvid(clip, search=4)
        assert flags.sc_prev[0] == 1
        assert flags.sc_prev[5] == 1
        assert flags.sc_prev[1:5].sum() == 0
        assert flags.sc_prev[6:].sum() == 0

    def test_static_clip_no_keyframes(self):
        from havc_tpu.scene.motion import scene_detect_xvid

        frame = np.linspace(0, 1, 64 * 64, dtype=np.float32).reshape(64, 64)
        clip = np.stack([frame] * 6)[..., None].repeat(3, axis=-1)
        flags = scene_detect_xvid(clip)
        assert flags.sc_prev[0] == 1 and flags.sc_prev[1:].sum() == 0

    def test_api_algo2_dispatch(self, tmp_path):
        import havc_tpu
        from havc_tpu.clip import Clip

        rng = np.random.default_rng(7)
        a = rng.random((4, 64, 64, 3)).astype(np.float32)
        b = rng.random((4, 64, 64, 3)).astype(np.float32)
        clip = Clip(np.concatenate([a, b]))
        files = havc_tpu.HAVC_extract_reference_frames(
            clip, sc_framedir=str(tmp_path), sc_algo=2
        )
        names = sorted(f.split("/")[-1] for f in files)
        assert names[0] == "ref_000000.jpg"
        assert "ref_000004.jpg" in names
