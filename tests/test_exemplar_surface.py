"""Exemplar public-surface parity tests (round 3).

Pins the reference's HAVC_deepex/HAVC_cmnet2/HAVC_restore_video/
HAVC_DeepRemaster parameter surface and the ref-merge orchestration
semantics (reference __init__.py:1421-1735, 1959-2127, 2689-2735 and the
vs_colormnet merge loop colormnet/__init__.py:70-101) without running the
heavy engines — the engine dispatch is stubbed where needed.
"""
import inspect

import numpy as np
import pytest

from havc_tpu import exemplar
from havc_tpu.clip import from_frames
from havc_tpu.scene.detect import SceneFlags


def _clip(n=8, cut_at=4, seed=0):
    """Clip with a hard content cut at ``cut_at`` (detectable at 0.10)."""
    rng = np.random.default_rng(seed)
    a = np.full((cut_at, 48, 48, 3), 0.25, np.float32)
    b = np.full((n - cut_at, 48, 48, 3), 0.55, np.float32)
    frames = np.concatenate([a, b]) + rng.random((n, 48, 48, 3)).astype(np.float32) * 0.02
    return from_frames(np.clip(frames, 0, 1))


# Reference signatures (verbatim parameter names from
# /root/reference/vsdeoldify/__init__.py) — the drop-in surface a
# vs-deoldify user expects.
REF_DEEPEX_PARAMS = [
    "clip", "clip_ref", "method", "render_speed", "render_vivid",
    "ref_merge", "sc_framedir", "ref_norm", "only_ref_frames", "dark",
    "dark_p", "smooth", "smooth_p", "colormap", "ref_weight", "ref_thresh",
    "ref_freq", "ex_model", "encode_mode", "max_memory_frames", "torch_dir",
]
REF_RESTORE_PARAMS = [
    "clip", "clip_ref", "method", "render_speed", "ex_model", "ref_merge",
    "ref_weight", "ref_thresh", "ref_freq", "ref_norm",
    "max_memory_frames", "render_vivid", "encode_mode", "encode_first",
    "torch_dir",
]
REF_REMASTER_PARAMS = [
    "clip", "length", "render_vivid", "ref_dir", "ref_minedge",
    "frame_mindim", "ref_buffer_size", "device_index", "inference_mode",
    "mode",
]


@pytest.mark.parametrize("fn,params", [
    (exemplar.HAVC_deepex, REF_DEEPEX_PARAMS),
    (exemplar.HAVC_restore_video, REF_RESTORE_PARAMS),
    (exemplar.HAVC_DeepRemaster, REF_REMASTER_PARAMS),
])
def test_reference_parameter_surface(fn, params):
    sig = set(inspect.signature(fn).parameters)
    missing = [p for p in params if p not in sig]
    assert not missing, f"{fn.__name__} missing reference params: {missing}"


def test_cmnet2_accepts_reference_call_form():
    """The exact call HAVC_main_colorizer makes (__init__.py:818) must be
    accepted by HAVC_cmnet2's signature."""
    sig = set(inspect.signature(exemplar.HAVC_cmnet2).parameters)
    for p in ["render_speed", "render_vivid", "ref_merge", "dark", "dark_p",
              "ref_thresh", "encode_mode", "max_memory_frames", "ref_freq",
              "ref_norm", "smooth", "smooth_p", "colormap"]:
        assert p in sig, p


class TestValidation:
    def test_ref_merge_range(self):
        with pytest.raises(ValueError, match="ref_merge"):
            exemplar.HAVC_deepex(_clip(), _clip(), ref_merge=6)

    def test_ref_merge_method_combo(self):
        with pytest.raises(ValueError, match="method must be in"):
            exemplar.HAVC_deepex(_clip(), _clip(), method=4,
                                 sc_framedir="/tmp/x", ref_merge=2)

    def test_encode_mode_range(self):
        """0-3 are valid (2/3 = use_all_refs, vsmodels.py:52-55); the
        reference raises 'unknown encode mode' beyond that."""
        with pytest.raises(ValueError, match="unknown encode mode"):
            exemplar.HAVC_deepex(_clip(), _clip(), encode_mode=4)

    def test_restore_video_method_5_6_only(self):
        with pytest.raises(ValueError, match="methods: 5, 6"):
            exemplar.HAVC_restore_video(_clip(), _clip(), method=0)


def test_max_mem_bounds_long_term_store():
    """max_memory_frames -> max_long_term_elements (colormnet_render.py:
    119-120)."""
    eng = exemplar.ColorMNetEngine(config="micro", work_size=(32, 32),
                                   max_mem=33)
    assert eng.mem_cfg.lt_capacity == 33


class _StubEngine:
    pass


@pytest.fixture
def stub_colormnet(monkeypatch):
    """Replace the ColorMNet engine + scan with a recorder that returns
    constant ab = +0.5 (a known chroma), so the dispatch/merge logic can
    be asserted deterministically."""
    calls = {}

    def fake_get_engine(kind, **kw):
        calls["engine_kw"] = kw
        return _StubEngine()

    def fake_propagate(engine, frames, ref_ab, is_ref, ref_frames=None,
                       frame_propagate=True, vivid=False, **kw):
        calls["is_ref"] = np.asarray(is_ref).astype(bool)
        calls["frame_propagate"] = frame_propagate
        calls["vivid"] = vivid
        T, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
        return np.full((T, H, W, 2), 0.5, np.float32)

    monkeypatch.setattr(exemplar, "_get_engine", fake_get_engine)
    monkeypatch.setattr(exemplar, "colormnet_propagate", fake_propagate)
    return calls


def test_refmerge_uses_separate_video_detection(stub_colormnet):
    """With ref_merge > 0 and freq-1 references, the propagation refs and
    the merge mask come from a SEPARATE detection of the video at
    ref_thresh (reference __init__.py:1630-1642) — not from the freq-1
    flags of clip_ref."""
    clip = _clip(n=8, cut_at=4)
    ref = clip.with_sc(SceneFlags.every(8, freq=1))
    out = exemplar.HAVC_deepex(
        clip, ref, method=0, ex_model=0, ref_merge=3, render_speed="fast",
        engine_config="micro",
    )
    is_ref = stub_colormnet["is_ref"]
    # the separate detection finds the hard cut at 4; freq-1 flags would
    # have made EVERY frame a propagation ref
    assert is_ref[0] and is_ref[4]
    assert is_ref.sum() == 2, is_ref
    assert out.num_frames == 8

    # merge direction: non-scene-change frames = color*(1-w) + ref*w with
    # w = refmerge_weight[3] = 0.5 (imfilters.py:113-122 convention);
    # scene-change frames pass through unmerged.  The stub colors with a
    # constant ab, so the merged frames must differ from the unmerged ones
    out0 = exemplar.HAVC_deepex(
        clip, ref, method=0, ex_model=0, ref_merge=0, render_speed="fast",
        engine_config="micro",
    )
    a = np.asarray(out.frames)
    b = np.asarray(out0.frames)
    # scene-change frames identical; others pulled toward the reference
    assert np.allclose(a[4], b[4], atol=1e-5)
    assert not np.allclose(a[5], b[5], atol=1e-3)


def test_refmerge_weight_table(stub_colormnet, monkeypatch):
    """refmerge_weight = [0, .3, .4, .5, .6, .7] (__init__.py:1631)."""
    assert exemplar.REFMERGE_WEIGHT == [0.0, 0.3, 0.4, 0.5, 0.6, 0.7]
    seen = {}
    real_dispatch = exemplar._exemplar_dispatch

    def spy(clip, ref_frames, is_ref, render_speed, ex_model,
            frame_propagate, render_vivid, ref_weight, merge_enabled,
            ref_merge, max_memory_frames, engine_config, **kw):
        seen["ref_weight"] = ref_weight
        seen["merge_enabled"] = merge_enabled
        return real_dispatch(clip, ref_frames, is_ref, render_speed,
                             ex_model, frame_propagate, render_vivid,
                             ref_weight, merge_enabled, ref_merge,
                             max_memory_frames, engine_config, **kw)

    monkeypatch.setattr(exemplar, "_exemplar_dispatch", spy)
    clip = _clip()
    ref = clip.with_sc(SceneFlags.every(8, freq=1))
    exemplar.HAVC_deepex(clip, ref, ref_merge=2, render_speed="fast",
                         engine_config="micro")
    assert seen == {"ref_weight": 0.4, "merge_enabled": True}


def test_encode_mode_2_routes_all_refs(stub_colormnet, monkeypatch):
    """encode_mode 2/3 (use_all_refs, vsmodels.py:52-55) must drive the
    scan with the RefImageReader feed schedule + driver reset schedule
    instead of per-frame refs."""
    seen = {}
    real_propagate = exemplar.colormnet_propagate

    def spy(engine, frames, ref_ab, is_ref, **kw):
        seen["feed"] = kw.get("feed_schedule")
        seen["reset"] = kw.get("reset_schedule")
        T, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
        return np.full((T, H, W, 2), 0.5, np.float32)

    monkeypatch.setattr(exemplar, "colormnet_propagate", spy)
    clip = _clip(n=12, cut_at=4)
    ref = clip.with_sc(SceneFlags.every(12, freq=3))  # refs at 0,3,6,9
    exemplar.HAVC_deepex(clip, ref, encode_mode=2, render_speed="fast",
                         engine_config="micro")
    feed = seen["feed"]
    assert feed is not None and seen["reset"] is not None
    from havc_tpu.exemplar.allrefs import (
        allrefs_feed_schedule, allrefs_step_schedule,
    )

    want_feed = allrefs_feed_schedule(np.arange(12) % 3 == 0)
    want_eff, want_reset = allrefs_step_schedule(
        want_feed, vid_length=12, reset_on_ref_update=True
    )
    assert (np.asarray(feed) == want_eff).all()
    assert (np.asarray(seen["reset"]) == want_reset).all()

    # encode_mode 0 must NOT use the schedules
    monkeypatch.setattr(exemplar, "colormnet_propagate", real_propagate)
    exemplar.HAVC_deepex(clip, ref, encode_mode=0, render_speed="fast",
                         engine_config="micro")
    assert stub_colormnet["is_ref"].sum() == 4


def test_max_memory_disables_vivid(stub_colormnet):
    """ColorMNet with a bounded memory cannot reset on references
    (__init__.py:1692-1693): render_vivid forced False."""
    clip = _clip()
    ref = clip.with_sc(SceneFlags.every(8, freq=4))
    exemplar.HAVC_deepex(clip, ref, render_vivid=True, max_memory_frames=64,
                         render_speed="fast", engine_config="micro")
    assert stub_colormnet["vivid"] is False
    assert stub_colormnet["engine_kw"].get("max_mem") == 64


def test_method_5_delegates_to_restore_video(stub_colormnet):
    """HAVC_deepex methods 5/6 delegate (reference __init__.py:1594);
    restore_video always runs frame_propagate=False (:2098)."""
    clip = _clip()
    ref = _clip(seed=3)
    exemplar.HAVC_deepex(clip, ref, method=5, render_speed="fast",
                         engine_config="micro")
    assert stub_colormnet["frame_propagate"] is False


def test_hybrid_merge_weight(monkeypatch):
    """ex_model=3: ColorMNet merged with DeepEx at
    max(refmerge_weight[ref_merge], 0.3), DeepEx side vivid=True
    (__init__.py:1706-1721)."""
    A, B = 0.2, 0.8
    seen = {}

    def fake_get_engine(kind, **kw):
        e = _StubEngine()
        e.h, e.w = 64, 64
        return e

    def fake_cm(engine, frames, ref_ab, is_ref, **kw):
        T, H, W = frames.shape[:3]
        return np.full((T, H, W, 2), 0.0, np.float32)

    def fake_dx(engine, frames, refs, is_ref, frame_propagate=True,
                vivid=False, **kw):
        seen["dx_vivid"] = vivid
        return np.full_like(frames, B)

    monkeypatch.setattr(exemplar, "_get_engine", fake_get_engine)
    monkeypatch.setattr(exemplar, "colormnet_propagate", fake_cm)
    monkeypatch.setattr(exemplar, "deepex_propagate", fake_dx)

    clip = _clip()
    ref = clip.with_sc(SceneFlags.every(8, freq=4))
    out = exemplar.HAVC_deepex(clip, ref, ex_model=3, render_vivid=False,
                               render_speed="fast", engine_config="micro")
    assert seen["dx_vivid"] is True
    assert out.num_frames == 8


def test_remaster_work_shape_reference_formula():
    """resize_for_inference parity (remaster/remaster_utils.py:134-143):
    scale min(w,h) to frame_mindim, round EACH side to /16.  NetworkC's
    decoder skip concat (2x-upsampled 1/16 + 1/8 feature) requires /16
    dims, so DeepRemaster must never run at the deepex smart sizes
    (216x384 medium / 360x640 slower are not /16 — the r5 bench caught a
    live concat crash from exactly this)."""
    from havc_tpu.exemplar import remaster_work_shape

    # the bundled sample geometry (920x672 B&W input)
    assert remaster_work_shape(920, 672) == (320, 432)
    # already at mindim: sides round to /16 independently
    assert remaster_work_shape(576, 320) == (320, 576)
    # custom mindim (tests use small ones to stay fast)
    assert remaster_work_shape(64, 64, frame_mindim=32) == (32, 32)
    # a sweep: the result is ALWAYS /16 on both sides
    for w, h in [(384, 216), (640, 360), (301, 217), (97, 33)]:
        fh, fw = remaster_work_shape(w, h)
        assert fh % 16 == 0 and fw % 16 == 0, (w, h, fh, fw)


def test_restore_video_ex2_uses_remaster_geometry():
    """HAVC_restore_video(ex_model=2) routes through the remaster
    geometry, not the deepex smart size (reference: ex_model=2 goes to
    vs_deepremaster, __init__.py:2069-2116) — at render_speed='medium'
    (216x384, not /16) the old path crashed in NetworkC's skip concat."""
    rng = np.random.default_rng(5)
    frames = rng.random((6, 48, 64, 3), dtype=np.float32)
    clip = from_frames(np.clip(frames * 0.5 + 0.25, 0, 1))
    ref = from_frames(np.clip(frames, 0, 1))
    out = exemplar.HAVC_restore_video(
        clip, ref, method=6, render_speed="medium", ex_model=2,
        max_memory_frames=4, frame_mindim=32,
    )
    assert out.num_frames == 6
    arr = np.asarray(out.frames)
    assert np.isfinite(arr).all() and arr.min() >= 0 and arr.max() <= 1
