"""Temporal, equalize, tiles, retinex, lut3d kernels."""
import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from havc_tpu.ops import colorspace as cs
from havc_tpu.ops import equalize as eq
from havc_tpu.ops import lut3d
from havc_tpu.ops import retinex as rx
from havc_tpu.ops import temporal as tp
from havc_tpu.ops import tiles as tl


class TestTemporal:
    def test_chroma_stabilizer_smooths(self):
        rng = np.random.default_rng(7)
        base = np.full((9, 16, 16, 3), 0.5, np.float32)
        noise = rng.normal(0, 0.05, base.shape).astype(np.float32)
        frames = np.clip(base + noise, 0, 1)
        out = np.asarray(tp.chroma_stabilizer(frames, nframes=5, tht=0))
        uv_in = np.asarray(cs.rgb_to_yuv(frames))[..., 1:]
        uv_out = np.asarray(cs.rgb_to_yuv(out))[..., 1:]
        # temporal variance of chroma reduced
        assert uv_out.std(axis=0).mean() < uv_in.std(axis=0).mean() * 0.8

    def test_scene_cut_isolation(self):
        # two segments with very different chroma; no bleed across the cut
        a = np.zeros((4, 8, 8, 3), np.float32)
        a[..., 0] = 0.8  # reddish
        b = np.zeros((4, 8, 8, 3), np.float32)
        b[..., 2] = 0.8  # bluish
        frames = np.concatenate([a, b])
        sc = np.zeros(8, np.int8)
        sc[0] = sc[4] = 1
        out = np.asarray(
            tp.chroma_stabilizer(frames, nframes=5, scenechange=sc, tht=0)
        )
        # frame 3 (end of segment A) must stay reddish, frame 4 bluish
        assert out[3, 0, 0, 0] > out[3, 0, 0, 2]
        assert out[4, 0, 0, 2] > out[4, 0, 0, 0]

    def test_luma_unchanged(self):
        rng = np.random.default_rng(8)
        frames = rng.random((5, 16, 16, 3), dtype=np.float32)
        out = np.asarray(tp.chroma_stabilizer(frames, nframes=3, tht=0))
        y_in = np.asarray(cs.luma(frames))
        y_out = np.asarray(cs.luma(out))
        assert np.abs(y_in - y_out).max() < 0.02

    def test_reduce_flicker(self):
        # alternating luma flicker gets damped
        frames = np.full((6, 8, 8, 3), 0.5, np.float32)
        frames[1::2] += 5 / 255.0
        out = np.asarray(tp.reduce_flicker(frames, strength=5))
        y = np.asarray(cs.luma(out))
        assert y[1:5].std(axis=0).max() < (5 / 255.0) / 2

    def test_weights_sum_one(self):
        for n in (3, 5, 7, 9, 15):
            for wt in (False, True):
                w = tp.average_weights(n, wt)
                assert abs(w.sum() - 1.0) < 1e-5
                assert len(w) == n


class TestEqualize:
    def test_histogram256(self):
        x = np.array([0.0, 0.0, 0.5, 1.0], np.float32)
        h = np.asarray(eq.histogram256(x))
        assert h[0] == 2 and h[127] == 1 and h[255] == 1 and h.sum() == 4

    def test_equalize_hist_vs_cv2(self):
        rng = np.random.default_rng(9)
        img = (rng.normal(0.4, 0.1, (64, 64)).clip(0, 1) * 255).astype(np.uint8)
        ours = np.asarray(eq.equalize_hist_channel(img.astype(np.float32) / 255.0))
        ref = cv2.equalizeHist(img).astype(np.float32) / 255.0
        assert np.abs(ours - ref).mean() < 0.02

    def test_clahe_improves_contrast(self):
        rng = np.random.default_rng(10)
        img = (rng.normal(0.5, 0.05, (64, 64)).clip(0, 1)).astype(np.float32)
        out = np.asarray(eq.clahe_channel(img, clip_limit=2.0, gridsize=4))
        assert out.std() > img.std()
        assert out.min() >= 0 and out.max() <= 1

    def test_clahe_vs_cv2_correlation(self):
        rng = np.random.default_rng(11)
        img = (rng.normal(0.5, 0.1, (64, 64)).clip(0, 1) * 255).astype(np.uint8)
        ours = np.asarray(
            eq.clahe_channel(img.astype(np.float32) / 255.0, 2.0, 8)
        )
        clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
        ref = clahe.apply(img).astype(np.float32) / 255.0
        # same qualitative mapping (interpolation details differ slightly)
        corr = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
        assert corr > 0.98
        assert np.abs(ours - ref).mean() < 0.05

    def test_rgb_equalizer_strength_zero(self, rgb_batch):
        out = np.asarray(eq.rgb_equalizer(rgb_batch, method=0, strength=0.0))
        assert np.abs(out - rgb_batch).max() < 1e-6

    @pytest.mark.parametrize("method", [0, 1, 2, 3, 4])
    def test_rgb_equalizer_methods_run(self, method, rgb_batch):
        out = np.asarray(eq.rgb_equalizer(rgb_batch, method=method, strength=0.8))
        assert out.shape == rgb_batch.shape
        assert np.isfinite(out).all()

    def test_scale_abs(self):
        # low-contrast image gets stretched toward full range
        img = np.random.default_rng(12).uniform(0.4, 0.6, (1, 32, 32, 3)).astype(np.float32)
        out = np.asarray(eq.scale_abs_autolevels(img))
        assert out.max() - out.min() > (img.max() - img.min()) * 1.5

    def test_adjust_rgb(self):
        img = np.full((1, 4, 4, 3), 0.5, np.float32)
        out = np.asarray(
            eq.adjust_rgb(img, factor=(1.2, 1.0, 0.8), bias=(10, 0, -10))
        )
        assert out[0, 0, 0, 0] == pytest.approx(0.5 * 1.2 + 10 / 255, abs=1e-5)
        assert out[0, 0, 0, 2] == pytest.approx(0.5 * 0.8 - 10 / 255, abs=1e-5)

    def test_rgb_balance_neutralizes(self):
        img = np.zeros((1, 16, 16, 3), np.float32)
        img[..., 0], img[..., 1], img[..., 2] = 0.6, 0.5, 0.4  # warm cast
        out = np.asarray(eq.rgb_balance(img, strength=1.0))
        means = out.mean(axis=(0, 1, 2))
        assert means.std() < 0.01  # channels equalized


class TestTiles:
    def test_roundtrip_identity(self):
        rng = np.random.default_rng(13)
        frames = rng.random((2, 64, 96, 3), dtype=np.float32)
        tiles, meta = tl.slice_tiles(frames, 2, 2, overlap=16)
        out = np.asarray(tl.reconstruct_tiles(tiles, meta))
        assert np.abs(out - frames).max() < 1e-5

    def test_roundtrip_1x2(self):
        rng = np.random.default_rng(14)
        frames = rng.random((1, 48, 128, 3), dtype=np.float32)
        tiles, meta = tl.slice_tiles(frames, 1, 2, overlap=32)
        assert tiles.shape[0] == 2
        out = np.asarray(tl.reconstruct_tiles(tiles, meta))
        assert np.abs(out - frames).max() < 1e-5

    def test_blend_smooths_tile_disagreement(self):
        frames = np.full((1, 64, 64, 3), 0.5, np.float32)
        tiles, meta = tl.slice_tiles(frames, 2, 2, overlap=16)
        # perturb one tile uniformly; reconstruction must ramp, not step
        tiles = np.asarray(tiles).copy()
        tiles[0] += 0.2
        out = np.asarray(tl.reconstruct_tiles(tiles, meta))
        dcol = np.abs(np.diff(out[0, :, :, 0], axis=1))
        assert dcol.max() < 0.05  # no hard seam


class TestRetinex:
    def test_box_blur_constant(self):
        img = np.full((32, 32), 0.4, np.float32)
        out = np.asarray(rx.gaussian_blur_box(img, sigma=5.0))
        assert np.abs(out - 0.4).max() < 1e-5

    def test_box_blur_close_to_cv2_gaussian(self):
        rng = np.random.default_rng(15)
        img = rng.random((64, 64), dtype=np.float32)
        ours = np.asarray(rx.gaussian_blur_box(img, sigma=4.0))
        ref = cv2.GaussianBlur(img, (0, 0), 4.0, borderType=cv2.BORDER_REPLICATE)
        assert np.abs(ours - ref).mean() < 0.01

    def test_msr_enhances_dark(self):
        # dark low-contrast frame -> brighter, more contrast
        rng = np.random.default_rng(16)
        img = (rng.uniform(0.05, 0.2, (1, 64, 64, 3))).astype(np.float32)
        out = np.asarray(rx.msr_luma(img))
        assert out.mean() > img.mean()


class TestLut3d:
    def test_identity_lut(self):
        n = 17
        g = np.linspace(0, 1, n, dtype=np.float32)
        r, gg, b = np.meshgrid(g, g, g, indexing="ij")
        lut = np.stack([r, gg, b], axis=-1)
        rng = np.random.default_rng(17)
        img = rng.random((4, 4, 3), dtype=np.float32)
        out = np.asarray(lut3d.apply_lut3d(img, lut))
        assert np.abs(out - img).max() < 1e-5

    def test_look_luts_generate(self):
        for i in range(12):
            lut = lut3d.make_look_lut(i)
            assert lut.shape == (33, 33, 33, 3)
            assert lut.min() >= 0 and lut.max() <= 1

    def test_cube_roundtrip(self, tmp_path):
        n = 5
        g = np.linspace(0, 1, n)
        lines = ["LUT_3D_SIZE 5"]
        for bi in range(n):
            for gi in range(n):
                for ri in range(n):
                    lines.append(f"{g[ri]:.6f} {g[gi]:.6f} {g[bi]:.6f}")
        p = tmp_path / "identity.cube"
        p.write_text("\n".join(lines))
        lut = lut3d.load_cube(str(p))
        img = np.random.default_rng(18).random((3, 3, 3), dtype=np.float32)
        out = np.asarray(lut3d.apply_lut3d(img, lut))
        assert np.abs(out - img).max() < 1e-5


class TestMSRCP:
    """MSRCP + the patched retinex wrapper (vsretinex.py:26-95)."""

    def _img(self, t=1, seed=0, lo=0.25, hi=0.75):
        rng = np.random.default_rng(seed)
        yy = np.linspace(lo, hi, 48)[None, :, None, None]
        col = rng.random((t, 1, 48, 3)).astype(np.float32) * 0.2
        return np.clip(yy + col, 0.01, 1).astype(np.float32)

    def test_msrcp_preserves_chromaticity(self):
        """Output channel ratios == input channel ratios per pixel (the CP
        in MSRCP): R/G and B/G are invariant under a scalar gain."""
        img = self._img()
        out = np.asarray(rx.msrcp_rgb(jnp.asarray(img)))
        # exclude pixels crushed by the balance stretch (lower-tail -> 0)
        # or at the range ceiling — no finite scalar gain exists there
        mask = (
            (out.max(axis=-1) < 0.999)
            & (out.min(axis=-1) > 0.01)
            & (img.min(axis=-1) > 0.02)
        )
        r_in = img[..., 0] / np.maximum(img[..., 1], 1e-4)
        r_out = out[..., 0] / np.maximum(out[..., 1], 1e-4)
        err = np.abs(r_in - r_out)[mask]
        assert err.max() < 0.02

    def test_msrcp_gain_capped_at_range_ceiling(self):
        out = np.asarray(rx.msrcp_rgb(jnp.asarray(self._img())))
        assert out.max() <= 1.0 + 1e-6
        assert out.min() >= 0.0

    def test_slow_path_matches_cv2_reference(self):
        """msr_yuv vs a numpy/cv2 transcription of vs_retinex_slow's
        frame_retinex_MSR (vsretinex.py:108-152), sharing the box-blur
        Gaussian approximation on both sides so the test isolates the
        MSR + min-max normalize + Y-only recombination semantics."""
        import cv2

        img = self._img()[0]
        u8 = (img * 255).round().astype(np.uint8)
        yuv = cv2.cvtColor(u8, cv2.COLOR_RGB2YUV)
        y_img = yuv[..., 0].astype(np.float64) / 255.0
        eps = 1.0 / 255.0
        acc = np.zeros_like(y_img)
        for s in (25.0, 80.0, 250.0):
            blurred = np.asarray(
                rx.gaussian_blur_box(jnp.asarray(y_img, jnp.float32), s)
            )
            acc += np.log(y_img + eps) - np.log(blurred + eps)
        msr_ref = acc / 3
        y_min, y_max = msr_ref.min(), msr_ref.max()
        y_norm = (msr_ref - y_min) / (y_max - y_min) * 255.0
        yuv_out = yuv.copy()
        yuv_out[..., 0] = np.clip(y_norm, 0, 255).astype(np.uint8)
        ref = cv2.cvtColor(yuv_out, cv2.COLOR_YUV2RGB).astype(np.float32) / 255

        got = np.asarray(rx.msr_yuv(jnp.asarray(img)))
        # uint8 quantization in the cv2 path dominates the residual
        assert np.abs(ref - got).mean() < 0.02

    def test_retinex_filter_gates_dark_frames(self):
        """Frames outside [luma_dark, luma_bright] pass through untouched
        (filter_retinex, vsretinex.py:66-88)."""
        dark = self._img(lo=0.02, hi=0.08, seed=1) * 0.3
        normal = self._img(seed=2)
        frames = np.concatenate([dark, normal])
        out = np.asarray(rx.retinex_filter(
            jnp.asarray(frames), luma_dark=0.20, luma_bright=0.80,
            range_tv=False,
        ))
        np.testing.assert_allclose(out[0], frames[0], atol=1e-6)
        assert np.abs(out[1] - frames[1]).max() > 0.01

    def test_retinex_filter_blend_ramp(self):
        """blend=True: mid-dark frames mix with the original
        (image_luma_blend weight ramp)."""
        img = self._img(lo=0.15, hi=0.25, seed=3)  # f_luma ~0.30 < 0.40
        full = np.asarray(rx.retinex_filter(
            jnp.asarray(img), range_tv=False, blend=False))
        blended = np.asarray(rx.retinex_filter(
            jnp.asarray(img), range_tv=False, blend=True))
        d_full = np.abs(full - img).mean()
        d_blend = np.abs(blended - img).mean()
        assert 0 < d_blend < d_full
