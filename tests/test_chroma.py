"""Hue-DSL + chroma kernels: parser cases and behavioural oracles."""
import numpy as np
import pytest

from havc_tpu.ops import chroma as ch
from havc_tpu.ops import colorspace as cs


def solid(r, g, b, shape=(1, 8, 8, 3)):
    img = np.zeros(shape, np.float32)
    img[..., 0], img[..., 1], img[..., 2] = r, g, b
    return img


class TestParser:
    def test_named_range(self):
        assert ch.parse_hue_range("blue") == (210.0, 240.0)
        assert ch.parse_hue_range("120:150") == (120.0, 150.0)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            ch.parse_hue_range("chartreuse")

    def test_adjust_sat_weight(self):
        p = ch.parse_hue_adjust("270:300|0.5,0.1")
        assert p.ranges == ((270.0, 300.0),)
        assert p.sat == 0.5 and p.hue == 0 and p.weight == 0.1

    def test_adjust_hue_shift(self):
        p = ch.parse_hue_adjust("180:280|+140,0.9")
        assert p.hue == 140 and p.sat == 1.0 and p.weight == 0.9

    def test_multi_range(self):
        p = ch.parse_hue_adjust("300:360,0:20|+40,1.0")
        assert p.ranges == ((300.0, 360.0), (0.0, 20.0))

    def test_sat_over_10_is_hue(self):
        # reference quirk: adjust > 10 is reinterpreted as a hue shift
        p = ch.parse_hue_adjust("0:30|40,0.5")
        assert p.hue == 40 and p.sat == 1.0

    def test_none(self):
        assert ch.parse_hue_adjust("none") is None
        assert ch.parse_hue_adjust("") is None

    def test_color_tune(self):
        assert ch.get_color_tune("violet/red") == "300:360"


class TestHueMask:
    def test_blue_in_blue_range(self):
        blue = solid(0.1, 0.1, 0.9)  # hue 240
        mask = np.asarray(ch.hue_mask(blue, ((210.0, 270.0),)))
        assert mask.min() == 1.0

    def test_red_not_in_blue_range(self):
        red = solid(0.9, 0.1, 0.1)
        mask = np.asarray(ch.hue_mask(red, ((210.0, 270.0),)))
        assert mask.max() == 0.0


class TestAdjustChroma:
    def test_desaturate_in_range_only(self):
        blue = solid(0.2, 0.2, 0.8)
        red = solid(0.8, 0.2, 0.2)
        img = np.concatenate([blue, red], axis=2)
        out = np.asarray(ch.adjust_chroma(img, ((210.0, 270.0),), sat=0.0))
        s = np.asarray(cs.rgb_to_hsv(out))[..., 1]
        assert s[0, :, :8].max() < 1e-3  # blue half desaturated
        assert s[0, :, 8:].min() > 0.5  # red half untouched

    def test_hue_shift_moves_hue(self):
        blue = solid(0.2, 0.2, 0.8)  # hue 240
        out = np.asarray(
            ch.adjust_chroma(blue, ((210.0, 270.0),), sat=1.0, hue=140)
        )
        h = np.asarray(cs.rgb_to_hsv(out))[..., 0] * 360.0
        assert np.allclose(h, (240 + 140) % 360, atol=2.0)


class TestGradientMask:
    def test_zero_sat_full_mask(self):
        s = np.zeros((4, 4), np.float32)
        for algo in (0, 1, 2):
            m = np.asarray(ch.gradient_mask(s, tht=30, alpha=2.0, algo=algo))
            assert m.min() > 0.85, algo

    def test_high_sat_zero_mask(self):
        s = np.full((4, 4), 220 / 255.0, np.float32)
        for algo in (0, 1, 2):
            m = np.asarray(ch.gradient_mask(s, tht=30, alpha=2.0, algo=algo))
            assert m.max() < 0.05, algo

    def test_exponential_half_at_tht(self):
        s = np.full((4, 4), 30 / 255.0, np.float32)
        m = np.asarray(ch.gradient_mask(s, tht=30, alpha=1.0, algo=2))
        assert np.allclose(m, 0.5, atol=1e-3)

    def test_monotone_decreasing(self):
        s = np.linspace(0, 1, 64, dtype=np.float32)[None, :]
        for algo in (0, 1, 2):
            m = np.asarray(ch.gradient_mask(s, tht=40, alpha=2.0, algo=algo))
            assert (np.diff(m[0]) <= 1e-6).all(), algo


class TestRestoreColor:
    def test_gray_pixels_get_color(self):
        gray = solid(0.5, 0.5, 0.5)
        color = solid(0.2, 0.6, 0.3)
        out = np.asarray(ch.restore_color(color, gray, tht=15, tht_scen=0.0))
        # tht_scen=0 disables the scene guard -> restore applies
        assert np.abs(out - color).max() < 0.02

    def test_scene_guard_skips(self):
        gray = solid(0.5, 0.5, 0.5)
        color = solid(0.2, 0.6, 0.3)
        # whole frame is gray -> coverage 1.0 > tht_scen=0.8 -> keep gray
        out = np.asarray(ch.restore_color(color, gray, tht=15, tht_scen=0.8))
        assert np.abs(out - gray).max() < 1e-5

    def test_colored_pixels_untouched(self):
        sat_img = solid(0.9, 0.1, 0.2)
        color = solid(0.2, 0.6, 0.3)
        out = np.asarray(ch.restore_color(color, sat_img, tht=15, tht_scen=0.0))
        assert np.abs(out - sat_img).max() < 1e-5

    def test_gradient_variant(self):
        gray = solid(0.5, 0.5, 0.5)
        color = solid(0.2, 0.6, 0.3)
        out = np.asarray(
            ch.restore_color_gradient(color, gray, tht=50, alpha=2.0)
        )
        # gradient mask at S=0 is ~1 -> close to color
        assert np.abs(out - color).mean() < 0.1


class TestTweak:
    def test_sat_zero_grayscale(self, rgb_batch):
        out = np.asarray(ch.tweak(rgb_batch, sat=0.0))
        s = np.asarray(cs.rgb_to_hsv(out))[..., 1]
        assert s.max() < 1e-3

    def test_identity(self, rgb_batch):
        out = np.asarray(ch.tweak(rgb_batch))
        assert np.abs(out - rgb_batch).max() < 1e-6

    def test_bright_raises_v(self, rgb_batch):
        out = np.asarray(ch.tweak(rgb_batch, bright=0.2))
        v_in = np.asarray(cs.rgb_to_hsv(rgb_batch))[..., 2]
        v_out = np.asarray(cs.rgb_to_hsv(out))[..., 2]
        assert (v_out >= v_in - 1e-5).all()

    def test_gamma_contrast_identity(self, rgb_batch):
        out = np.asarray(ch.gamma_contrast(rgb_batch, 1.0, 1.0))
        assert np.abs(out - rgb_batch).max() < 1e-6

    def test_contrast_stretches(self):
        yy = np.linspace(0.3, 0.7, 64, dtype=np.float32)
        img = np.tile(yy[None, :, None, None], (1, 1, 8, 3)).transpose(0, 2, 1, 3)
        out = np.asarray(ch.gamma_contrast(img, cont=1.5))
        y_out = np.asarray(cs.luma(out))
        assert y_out.max() - y_out.min() > (yy.max() - yy.min())
