"""L6 API-surface parity tests (round 3).

Pins the reference's top-level parameter surfaces (verbatim names from
/root/reference/vsdeoldify/__init__.py) and the orchestration behaviors
that route through them.  A vs-deoldify user's script must bind by these
names.
"""
import inspect

import numpy as np
import pytest

import havc_tpu
from havc_tpu import api
from havc_tpu.clip import from_frames

REF_MAIN = [
    "clip", "Preset", "FrameInterp", "ColorModel", "CombMethod", "VideoTune",
    "ColorFix", "ColorTune", "ColorMap", "ColorTemp", "BlackWhiteTune",
    "BlackWhiteMode", "BlackWhiteBlend", "EnableDeepEx", "DeepExMethod",
    "DeepExPreset", "DeepExRefMerge", "DeepExOnlyRefFrames", "ScFrameDir",
    "ScThreshold", "ScThtOffset", "ScMinFreq", "ScMinInt", "ScThtSSIM",
    "ScNormalize", "DeepExModel", "DeepExVivid", "DeepExEncMode",
    "DeepExMaxMemFrames", "RefRange", "enable_fp16", "debug_level",
]
REF_MAIN_COLORIZER = [p for p in REF_MAIN
                      if p not in ("BlackWhiteTune", "BlackWhiteMode",
                                   "BlackWhiteBlend")] + ["FrameInterp"]
REF_COLOR_ADJUST = [
    "clip", "BlackWhiteTune", "BlackWhiteMode", "BlackWhiteBlend", "ReColor",
    "Strength", "ScThreshold", "ScNormalize", "DeepExVivid", "ScMinFreq",
    "chroma_resize",
]
REF_MAIN_RESTORE = [
    "clip", "clip_colored", "DeepExPreset", "DeepExModel", "DeepExRefMerge",
    "ScThreshold", "ScMinFreq", "ScNormalize", "DeepExMaxMemFrames",
    "DeepExMethod", "DeepExVivid", "DeepExEncMode", "BlackWhiteTune",
    "BlackWhiteMode", "BlackWhiteBlend", "chroma_resize",
]
REF_COLORIZER_FAST = [
    "clip", "method", "mweight", "deoldify_p", "ddcolor_p", "ddtweak",
    "ddtweak_p", "frame_interp", "chroma_adjust", "debug_level",
]
REF_MERGE = ["clipa", "clipb", "clip_luma", "weight", "method", "cmc_p",
             "lmm_p", "alm_p", "crt_p"]
REF_TIMECUBE = ["clip", "strength", "lut_effect", "factors"]
REF_VERYSLOW = [
    "clip", "Preset", "FrameInterp", "ColorModel", "CombMethod", "VideoTune",
    "ColorFix", "ColorTune", "ColorMap", "ColorTemp", "BlackWhiteTune",
    "BlackWhiteMode", "BlackWhiteBlend", "EnableDeepEx", "DeepExMethod",
    "ScThreshold", "ScMinFreq", "RefRange", "enable_fp16", "debug_level",
]
REF_PLACEBO = [
    "clip", "CombMethod", "VideoTune", "ColorModel", "ColorFix", "ColorTune",
    "ColorMap", "ColorTemp", "FrameInterp", "BlackWhiteTune",
    "BlackWhiteMode", "BlackWhiteBlend", "RefRange", "enable_fp16",
    "debug_level",
]


@pytest.mark.parametrize("fn,params", [
    (api.HAVC_main, REF_MAIN),
    (api.HAVC_main_presets, REF_MAIN),
    (api.HAVC_main_colorizer, REF_MAIN_COLORIZER),
    (api.HAVC_ColorAdjust, REF_COLOR_ADJUST),
    (api.HAVC_main_restore, REF_MAIN_RESTORE),
    (api.HAVC_colorizer_fast, REF_COLORIZER_FAST),
    (api.HAVC_merge, REF_MERGE),
    (api.HAVC_TimeCube, REF_TIMECUBE),
    (api.HAVC_veryslow_preset, REF_VERYSLOW),
    (api.HAVC_placebo_preset, REF_PLACEBO),
])
def test_reference_parameter_surface(fn, params):
    sig = set(inspect.signature(fn).parameters)
    missing = [p for p in params if p not in sig]
    assert not missing, f"{fn.__name__} missing reference params: {missing}"


def test_reference_defaults():
    """The defaults a reference user relies on (__init__.py:101-109)."""
    sig = inspect.signature(api.HAVC_main).parameters
    assert sig["CombMethod"].default.lower() == "simple"
    assert sig["VideoTune"].default.lower() == "stable"
    assert sig["ColorFix"].default.lower() == "magenta/violet"
    assert sig["ColorTune"].default.lower() == "light"
    assert sig["ScThreshold"].default == 0.10
    assert sig["DeepExVivid"].default is True
    assert sig["BlackWhiteBlend"].default is True
    # main_colorizer's own ColorTune default differs (:798 'Medium')
    sig_c = inspect.signature(api.HAVC_main_colorizer).parameters
    assert sig_c["ColorTune"].default.lower() == "medium"


def _gray_clip(n=4, h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    g = np.tile(rng.random((n, h, w, 1), dtype=np.float32), (1, 1, 1, 3))
    return from_frames(g)


class TestOrchestration:
    def test_deepex_validation_via_main(self):
        """_check_input transcription (havc_utils.py:591-609)."""
        clip = _gray_clip()
        with pytest.raises(ValueError, match="ScFrameDir is unset"):
            havc_tpu.HAVC_main(clip, Preset="veryfast", EnableDeepEx=True,
                               DeepExMethod=1)
        with pytest.raises(ValueError, match="requires sc_framedir"):
            havc_tpu.HAVC_main(clip, Preset="veryfast", EnableDeepEx=True,
                               DeepExMethod=3)
        with pytest.raises(ValueError, match="ScThreshold and"):
            havc_tpu.HAVC_main(clip, Preset="veryfast", EnableDeepEx=True,
                               ScThreshold=0.0, ScMinFreq=0)
        with pytest.raises(ValueError, match="RefMerge cannot"):
            havc_tpu.HAVC_main(clip, Preset="veryfast", EnableDeepEx=True,
                               DeepExMethod=2, DeepExRefMerge=1,
                               ScFrameDir="/tmp/x")

    def test_blackwhitetune_post(self):
        """BlackWhiteTune runs as a post-pass on the colorized clip
        (__init__.py:515-516) and changes the output."""
        clip = _gray_clip()
        plain = havc_tpu.HAVC_main(clip, Preset="veryfast",
                                   ColorModel="zhang(eccv16)", batch_size=4)
        tuned = havc_tpu.HAVC_main(clip, Preset="veryfast",
                                   ColorModel="zhang(eccv16)",
                                   BlackWhiteTune="medium", batch_size=4)
        assert not np.allclose(np.asarray(plain.frames),
                               np.asarray(tuned.frames), atol=1e-3)

    def test_bwtune_legacy_alias(self):
        clip = _gray_clip()
        a = havc_tpu.HAVC_main(clip, Preset="veryfast",
                               ColorModel="zhang(eccv16)",
                               BlackWhiteTune="light", batch_size=4)
        b = havc_tpu.HAVC_main(clip, Preset="veryfast",
                               ColorModel="zhang(eccv16)", BWTune="light",
                               batch_size=4)
        np.testing.assert_array_equal(np.asarray(a.frames),
                                      np.asarray(b.frames))

    def test_fast_tier_stabilizer_is_colormap_only(self, monkeypatch):
        """speed_id > 4 presets run the stabilizer with colormap only
        (__init__.py:905-906); medium runs dark+smooth+stab (:897-904)."""
        seen = []
        real = api.HAVC_stabilizer

        def spy(clip, **kw):
            seen.append(kw)
            return real(clip, **kw)

        monkeypatch.setattr(api, "HAVC_stabilizer", spy)
        clip = _gray_clip()
        havc_tpu.HAVC_main(clip, Preset="veryfast",
                           ColorModel="zhang(eccv16)", batch_size=4)
        assert seen and not seen[-1].get("dark") and not seen[-1].get("stab")
        seen.clear()
        havc_tpu.HAVC_main(clip, Preset="medium",
                           ColorModel="zhang(eccv16)", batch_size=4)
        kw = seen[-1]
        assert kw.get("dark") and kw.get("smooth")
        assert kw.get("stab_p") == (5, "A", 1, 15, 0.2, 0.8)

    def test_colorizer_fast_ref_cadence(self, monkeypatch):
        """HAVC_colorizer_fast colorizes refs at sc_min_freq=frame_interp
        (__init__.py:2280-2283); the interpolator then runs DeepEx (<5)
        or ColorMNet (>=5) — captured via the interpolation hook."""
        captured = {}

        def fake_interp(clip, ref, frame_interp, chroma_adjust,
                        process_id=1, batch_size=8):
            captured["interp"] = frame_interp
            captured["sc"] = ref.sc.sc_prev.copy()
            return ref

        monkeypatch.setattr(api, "_frame_interpolation", fake_interp)
        clip = _gray_clip(n=8)
        api.HAVC_colorizer_fast(clip, method=1,
                                ddcolor_p=(3, 10, 1.0, 0.0, True),
                                frame_interp=3, batch_size=4)
        assert captured["interp"] == 3
        # refs every 3 frames (frequency forcing)
        assert captured["sc"][0] == 1 and captured["sc"][3] == 1
