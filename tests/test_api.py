"""Public HAVC_* API: preset tables, colorizer flow, stabilizer chain."""
import numpy as np
import pytest

import havc_tpu
from havc_tpu import presets
from havc_tpu.clip import from_frames


@pytest.fixture
def bw_clip(rng):
    g = rng.random((6, 64, 80, 1), dtype=np.float32)
    return from_frames(np.tile(g, (1, 1, 1, 3)))


class TestPresets:
    def test_render_factors(self):
        assert presets.get_render_factors("medium") == (4, 24, 24)
        assert presets.get_render_factors("veryfast") == (7, 16, 16)
        assert presets.get_render_factors("placebo")[0] == 0

    def test_invalid_preset(self):
        with pytest.raises(ValueError):
            presets.get_render_factors("warpspeed")

    def test_mweight(self):
        assert presets.get_mweight("balanced") == 0.5
        assert presets.get_mweight("verystable") == 0.2
        assert presets.get_mweight("veryvivid") == 0.8

    def test_comb_method(self):
        assert presets.get_comb_method("simple") == 2
        assert presets.get_comb_method("chromabound adaptive") == 7

    def test_color_model(self):
        assert presets.get_color_model("video+artistic") == (0, 1, 2)
        assert presets.get_color_model("deoldify(stable)") == (1, 0, 0)
        assert presets.get_color_model("ddcolor(modelscope)") == (0, 0, 1)
        assert presets.get_color_model("zhang(eccv16)") == (0, 3, 1)

    def test_color_tune_tables(self):
        dd_tweak, hr, hr2, ca, ca2 = presets.get_color_tune(
            "light", "violet/red", "none", dd_model=1
        )
        assert dd_tweak[0] is True
        assert hr == "300:360|0.8,0.1"
        assert ca == "none"

    def test_color_tune_none_disables(self):
        dd_tweak, hr, *_ = presets.get_color_tune("none", "violet/red", "none", 1)
        assert dd_tweak[0] is False and hr == "none"

    def test_colormap_table(self):
        assert presets.get_colormap("blue->brown", "light") == "180:280|+140,0.90"
        assert presets.get_colormap("none", "light") == "none"


class TestColorizer:
    def test_zhang_only_path(self, bw_clip):
        # method resolves to 1 (ddcolor branch) with zhang model 3 (eccv16)
        out = havc_tpu.HAVC_colorizer(
            bw_clip, method=1, ddcolor_p=(3, 10, 1.0, 0.0, True), batch_size=4
        )
        assert out.num_frames == bw_clip.num_frames
        assert out.height == bw_clip.height
        f = np.asarray(out.frames)
        assert np.isfinite(f).all() and f.min() >= 0 and f.max() <= 1

    def test_scenechange_gating_colors_only_refs(self, bw_clip):
        out = havc_tpu.HAVC_colorizer(
            bw_clip, method=1, ddcolor_p=(3, 10, 1.0, 0.0, True),
            sc_threshold=0.1, sc_min_freq=3, batch_size=4,
        )
        assert out.sc is not None
        assert out.sc.sc_prev[0] == 1

    def test_invalid_rf_raises(self, bw_clip):
        with pytest.raises(ValueError):
            havc_tpu.HAVC_colorizer(bw_clip, ddcolor_p=(3, 7, 1.0, 0.0, True))

    def test_gated_colorizer_device_equals_host(self, bw_clip):
        """SC-gated colorize with a device clip uses the on-device
        gather/scatter path and must match the host path bit-for-bit."""
        kw = dict(method=1, ddcolor_p=(3, 10, 1.0, 0.0, True),
                  sc_threshold=0.1, sc_min_freq=3, batch_size=4)
        host = havc_tpu.HAVC_colorizer(bw_clip, **kw)
        dev = havc_tpu.HAVC_colorizer(bw_clip.to_device(), **kw)
        assert dev.on_device and not host.on_device
        np.testing.assert_array_equal(
            np.asarray(host.frames), np.asarray(dev.frames)
        )

    def test_main_classic_ignores_scthreshold(self, bw_clip):
        """ScThreshold only gates DeepEx reference-frame generation: the
        classic path colorizes EVERY frame (the reference's non-DeepEx
        branch calls HAVC_colorizer without sc_threshold,
        __init__.py:853-860)."""
        out = havc_tpu.HAVC_main(
            bw_clip, Preset="veryfast", ColorModel="zhang(eccv16)",
            ScThreshold=0.10, batch_size=4,
        )
        f = np.asarray(out.frames)
        # every frame must carry chroma (gray input has |ab| == 0)
        from havc_tpu.ops.colorspace import rgb_to_lab
        import jax.numpy as jnp

        ab = np.asarray(rgb_to_lab(jnp.asarray(f)))[..., 1:]
        per_frame = np.abs(ab).mean(axis=(1, 2, 3))
        assert (per_frame > 1e-4).all(), per_frame

    def test_device_residency_preserved(self, bw_clip):
        """Device in -> device out, bit-identical to the host path (the
        round-3 zero-host-hop pipeline)."""
        import jax

        host = havc_tpu.HAVC_main(
            bw_clip, Preset="veryfast", ColorModel="zhang(eccv16)",
            batch_size=4,
        )
        dev = havc_tpu.HAVC_main(
            bw_clip.to_device(), Preset="veryfast",
            ColorModel="zhang(eccv16)", batch_size=4,
        )
        assert not host.on_device
        assert dev.on_device
        np.testing.assert_array_equal(
            np.asarray(host.frames), np.asarray(dev.frames)
        )


class TestStabilizer:
    def test_full_chain(self, bw_clip):
        out = havc_tpu.HAVC_stabilizer(
            bw_clip, dark=True, smooth=True, colormap="blue->brown",
            stab=True, render_factor=16, batch_size=4,
        )
        assert out.num_frames == bw_clip.num_frames
        f = np.asarray(out.frames)
        assert np.isfinite(f).all()

    def test_luma_preserved(self, bw_clip):
        out = havc_tpu.HAVC_stabilizer(
            bw_clip, stab=True, render_factor=16, batch_size=4
        )
        from havc_tpu.ops.colorspace import luma
        import jax.numpy as jnp

        y_in = np.asarray(luma(jnp.asarray(np.asarray(bw_clip.frames))))
        y_out = np.asarray(luma(jnp.asarray(np.asarray(out.frames))))
        assert np.abs(y_in - y_out).mean() < 0.02


class TestUtilities:
    def test_merge(self, bw_clip, rng):
        other = from_frames(rng.random((6, 64, 80, 3), dtype=np.float32))
        out = havc_tpu.HAVC_merge(bw_clip, other, method=2, mweight=0.5, batch_size=4)
        expect = 0.5 * np.asarray(bw_clip.frames) + 0.5 * np.asarray(other.frames)
        assert np.abs(np.asarray(out.frames) - expect).max() < 1e-5

    def test_bw_tune(self, bw_clip):
        out = havc_tpu.HAVC_bw_tune(bw_clip, "medium", method=1, batch_size=4)
        assert out.num_frames == bw_clip.num_frames

    def test_timecube(self, bw_clip):
        out = havc_tpu.HAVC_TimeCube(bw_clip, lut=4, batch_size=4)
        assert np.isfinite(np.asarray(out.frames)).all()

    def test_tweak(self, bw_clip):
        out = havc_tpu.HAVC_tweak(bw_clip, sat=0.0, batch_size=4)
        f = np.asarray(out.frames)
        assert np.abs(f[..., 0] - f[..., 1]).max() < 1e-3  # grayscale

    def test_adjust_rgb(self, bw_clip):
        out = havc_tpu.HAVC_adjust_rgb(bw_clip, factor=(1.2, 1.0, 0.8), batch_size=4)
        f_in = np.asarray(bw_clip.frames)
        f = np.asarray(out.frames)
        assert (f[..., 0] >= f_in[..., 0] - 1e-5).all()

    def test_scene_detect_api(self, bw_clip):
        out = havc_tpu.HAVC_SceneDetect(bw_clip, sc_threshold=0.1)
        assert out.sc is not None and out.sc.sc_prev[0] == 1

    def test_slice_reconstruct(self, bw_clip):
        # reference signature: slices=2|4, overlap_x/overlap_y
        # (HAVC_clip_slice __init__.py:2886, HAVC_clip_reconstruct :2922)
        ct = havc_tpu.HAVC_clip_slice(bw_clip, slices=4, overlap_x=16,
                                      overlap_y=16)
        assert ct.tiles_clip.num_frames == 4 * bw_clip.num_frames
        assert len(ct.tiles) == 4 and len(ct) == 4
        assert ct.original_width == bw_clip.width
        rec = havc_tpu.HAVC_clip_reconstruct(ct)
        assert np.abs(np.asarray(rec.frames) - np.asarray(bw_clip.frames)).max() < 1e-4

    def test_slice_reconstruct_2tiles(self, bw_clip):
        ct = havc_tpu.HAVC_clip_slice(bw_clip, slices=2, overlap_x=16)
        assert ct.tiles_clip.num_frames == 2 * bw_clip.num_frames
        assert ct.overlap_y == 0
        rec = havc_tpu.HAVC_clip_reconstruct(ct, chroma_resize=True)
        assert rec.width == bw_clip.width and rec.height == bw_clip.height

    def test_recover_clip_color(self, bw_clip, rng):
        color = from_frames(rng.random((6, 64, 80, 3), dtype=np.float32))
        out = havc_tpu.HAVC_recover_clip_color(
            bw_clip, color, chroma_resize=False, batch_size=4
        )
        assert out.num_frames == 6


class TestGlobalSetters:
    def test_set_tweak_params(self):
        saved = list(havc_tpu.DEF_TWEAK_p)
        try:
            out = havc_tpu.HAVC_set_tweak_params(bright=0.1, gamma=2.0)
            assert out[0] == 0.1 and out[2] == 2.0
            # reference form: full 8-slot list (HAVC_set_tweak_params,
            # __init__.py:3418)
            out = havc_tpu.HAVC_set_tweak_params(saved)
            assert out == saved
        finally:
            havc_tpu.HAVC_set_tweak_params(saved)

    def test_set_merge_params(self):
        from havc_tpu.ops.merge import DEF_CMC_p

        saved = list(DEF_CMC_p)
        try:
            out = havc_tpu.HAVC_set_merge_params(cmc_p=[0.2, False, 10, 12])
            assert out["cmc"] == [0.2, False, 10, 12]
            # reference form: (method, merge_params) with 3/7 -> CMC
            out = havc_tpu.HAVC_set_merge_params(3, [0.3, True, 15, 20])
            assert DEF_CMC_p == [0.3, True, 15, 20]
        finally:
            havc_tpu.HAVC_set_merge_params(cmc_p=saved)

    def test_legacy_shims_warn(self, bw_clip):
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            havc_tpu.ddeoldify_stabilizer(bw_clip, render_factor=16, batch_size=4)
            assert any(issubclass(x.category, DeprecationWarning) for x in w)


class TestUtilitySurface:
    """Round-3 M3: reference-faithful utility signatures + semantics."""

    def test_read_video_resize_and_alias(self, tmp_path, rng):
        """HAVC_read_video (havc_utils.py:249-322): width-only resize keeps
        the source height; missing files raise."""
        from havc_tpu.io import write_video
        from havc_tpu.clip import from_frames

        src = from_frames(rng.random((4, 48, 64, 3), dtype=np.float32))
        p = str(tmp_path / "t.mp4")
        write_video(src, p)
        c = havc_tpu.HAVC_read_video(p, width=32)
        assert c.width == 32 and c.height == 48
        c2 = havc_tpu.HAVC_read_video(p, width=32, height=24)
        assert c2.width == 32 and c2.height == 24
        import pytest as _pytest

        with _pytest.raises(IOError):
            havc_tpu.HAVC_read_video(str(tmp_path / "missing.mp4"))

    def test_log_message(self):
        havc_tpu.HAVC_LogMessage(havc_tpu.MessageType.INFORMATION, "x", 1)
        import pytest as _pytest

        with _pytest.raises(havc_tpu.HAVCError, match="boom"):
            havc_tpu.HAVC_LogMessage(havc_tpu.MessageType.EXCEPTION, "boom")

    def test_auto_levels_no_warm_cast(self, bw_clip):
        """vs_auto_levels (havc_utils.py:785-838) has NO rgb_balance step:
        a neutral gray input must stay neutral (bw_tune would warm it)."""
        out = havc_tpu.HAVC_auto_levels(bw_clip, mode="Strong", method=1,
                                        batch_size=4)
        f = np.asarray(out.frames)
        assert np.abs(f[..., 0] - f[..., 1]).max() < 1e-4
        assert np.abs(f[..., 1] - f[..., 2]).max() < 1e-4
        # bw_tune at the same settings DOES color-cast (r_factor=0.92)
        tuned = havc_tpu.HAVC_bw_tune(bw_clip, "Strong", bw_method=1,
                                      batch_size=4)
        tf = np.asarray(tuned.frames)
        assert np.abs(tf[..., 0] - tf[..., 1]).max() > 1e-3

    def test_auto_levels_defaults(self):
        import inspect

        sig = inspect.signature(havc_tpu.HAVC_auto_levels).parameters
        # reference HAVC_auto_levels defaults (__init__.py:3150)
        assert sig["mode"].default == "Light"
        assert sig["method"].default == 0
        assert sig["luma_blend"].default is False
        assert sig["range_tv"].default is True

    def test_rgb_denoise_signature(self, bw_clip):
        out = havc_tpu.HAVC_rgb_denoise(
            bw_clip, denoise_levels=(0.4, 0.3),
            rgb_factors=(0.95, 1.05, 1.01), batch_size=4,
        )
        assert out.num_frames == bw_clip.num_frames
        f = np.asarray(out.frames)
        assert np.isfinite(f).all() and 0 <= f.min() and f.max() <= 1

    def test_recover_color_return_mask(self, bw_clip, rng):
        color = from_frames(rng.random((6, 64, 80, 3), dtype=np.float32))
        mask = havc_tpu.HAVC_recover_clip_color(
            bw_clip, color, return_mask=True, chroma_resize=False,
            batch_size=4,
        )
        m = np.asarray(mask.frames)
        assert m.shape == (6, 64, 80, 3)
        # grayscale input is fully "gray" -> mask saturates to 1
        assert m.min() >= 0.99

    def test_export_sequence_offset_override(self, bw_clip, tmp_path):
        sc = np.zeros(6, dtype=np.int64)
        sc[0] = sc[3] = 1
        from havc_tpu.scene.detect import SceneFlags

        flagged = bw_clip.with_sc(SceneFlags(
            sc_prev=sc, sc_next=sc.copy(),
            luma=np.full(6, 0.5, np.float32),
            ratio=np.zeros(6, np.float32),
        ))
        files = havc_tpu.HAVC_export_reference_frames(
            flagged, str(tmp_path), ref_offset=10, ref_ext="png")
        names = sorted(f.split("/")[-1] for f in files)
        assert names == ["ref_000010.png", "ref_000013.png"]
        # override=False skips existing
        files2 = havc_tpu.HAVC_export_reference_frames(
            flagged, str(tmp_path), ref_offset=10, ref_ext="png",
            ref_override=False)
        assert files2 == []

    def test_export_list_step(self, bw_clip, tmp_path):
        # single-element ref_list = every-N export (__init__.py:3395)
        files = havc_tpu.HAVC_export_list_frames(
            bw_clip, str(tmp_path), ref_list=[2])
        names = sorted(f.split("/")[-1] for f in files)
        assert names == [f"ref_{n:06d}.jpg" for n in (0, 2, 4)]

    def test_overlay_planes(self, bw_clip, rng):
        over = from_frames(rng.random((6, 64, 80, 3), dtype=np.float32))
        out = havc_tpu.HAVC_clip_overlay(bw_clip, over, planes=0,
                                         batch_size=4)
        f = np.asarray(out.frames)
        base = np.asarray(bw_clip.frames)
        ov = np.asarray(over.frames)
        np.testing.assert_allclose(f[..., 1], base[..., 1], atol=1e-5)
        np.testing.assert_allclose(f[..., 0], ov[..., 0], atol=1e-5)

    def test_legacy_full_signatures(self, bw_clip):
        import warnings

        with warnings.catch_warnings(record=True):
            warnings.simplefilter("always")
            out = havc_tpu.ddeoldify_main(
                bw_clip, Preset="veryfast", VideoTune="Stable",
                ColorFix="Violet/Red", ColorTune="Light", ColorMap="None",
                degrain_strength=0, enable_fp16=True, batch_size=4,
            )
        assert out.num_frames == bw_clip.num_frames


class TestColorTuneEdges:
    def test_retinex_red_special_case(self):
        dd_tweak, hr, hr2, ca, ca2 = presets.get_color_tune(
            "medium", "retinex/red", "none", dd_model=1
        )
        assert dd_tweak[0] and dd_tweak[2]  # tweaks + retinex enabled
        assert hr.startswith("300:360|")

    def test_custom_colormap_string_passthrough(self):
        _, _, _, ca, ca2 = presets.get_color_tune(
            "light", "none", "180:280|+140,0.9", dd_model=1
        )
        assert ca == "180:280|+140,0.9"
        assert ca2 == "none"

    def test_invalid_colormap_raises(self):
        with pytest.raises(ValueError):
            presets.get_color_tune("light", "none", "sepiatone", dd_model=1)
