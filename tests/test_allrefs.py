"""All-refs (encode_mode 2/3) schedule parity against the reference
RefImageReader (colormnet/colormnet_utils.py:27-155), driven live via
_ref_loader with fake VapourSynth clip objects.

The feed schedule is the whole behavioral core of the use_all_refs mode:
which reference frame the driver hands to the colorizer at each step.  The
driver-counter simulation (allrefs_step_schedule) is functionally pinned by
the torch InferenceCore e2e oracle in test_ref_parity_colormnet_e2e.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

from _ref_loader import load_ref_module
from havc_tpu.exemplar.allrefs import (
    allrefs_feed_schedule,
    allrefs_step_schedule,
)


class _FakeFrame:
    def __init__(self, sc_prev):
        self.props = {"_SceneChangePrev": int(sc_prev)}


class _FakeClip:
    """Duck-typed vs.VideoNode: num_frames + get_frame(n).props."""

    def __init__(self, sc_prev):
        self.sc = np.asarray(sc_prev).astype(bool)
        self.num_frames = len(self.sc)

    def get_frame(self, n):
        return _FakeFrame(self.sc[n])


def _reference_feed(sc_prev, ref_list_size=30):
    """Drive the real RefImageReader over every frame; record which ref
    frame index get_next_ref_frame yields per step (-1 for None)."""
    cu = load_ref_module("vsdeoldify.colormnet.colormnet_utils")
    # frame_to_image would convert a real VideoFrame; identity keeps the
    # index visible (clip_ref.get_frame returns a _FakeFrame, we only need
    # WHICH n was fetched)
    fetched = []

    class _RefClip(_FakeClip):
        def get_frame(self, n):
            fetched.append(n)
            return super().get_frame(n)

    cu.frame_to_image = lambda f: f
    cu.RefImageReader._instance = None  # singleton: isolate runs
    reader = cu.RefImageReader(ref_list_size=ref_list_size, use_all_refs=True)
    clip = _RefClip(sc_prev)
    reader.load_clip_ref(clip, _FakeClip(sc_prev))
    T = clip.num_frames
    feed = np.full(T, -1, np.int64)
    for n in range(T):
        fetched.clear()
        img = reader.get_next_ref_frame(n)
        if img is not None:
            assert len(fetched) == 1
            feed[n] = fetched[0]
    cu.RefImageReader._instance = None
    return feed


def _patterns():
    rng = np.random.default_rng(7)
    pats = {}
    # sparse scene cuts, short clip
    sc = np.zeros(120, bool)
    sc[[0, 11, 30, 47, 60, 82, 99, 110]] = True
    pats["sparse"] = sc
    # dense refs (sc_frequency == 1 style)
    pats["every_frame"] = np.ones(64, bool)
    # minimal ref count (== DEF_MIN_RF_FRAMES)
    sc = np.zeros(40, bool)
    sc[[0, 9, 20, 33]] = True
    pats["minimal"] = sc
    # long clip: exercises the 500-frame buffer extension rounds
    sc = np.zeros(1700, bool)
    sc[0] = True
    sc[rng.choice(np.arange(1, 1700), 90, replace=False)] = True
    pats["long_extend"] = sc
    # refs clustered at the tail beyond the first buffer
    sc = np.zeros(1400, bool)
    sc[[0, 5, 100, 450]] = True
    sc[1200:1260:10] = True
    pats["tail_refs"] = sc
    # first ref not at frame 0
    sc = np.zeros(150, bool)
    sc[[3, 25, 60, 61, 62, 90, 120]] = True
    pats["late_first"] = sc
    return pats


@pytest.mark.parametrize("name", sorted(_patterns()))
@pytest.mark.parametrize("size", [4, 7, 30])
def test_feed_schedule_matches_reference(name, size):
    sc = _patterns()[name]
    want = _reference_feed(sc, ref_list_size=size)
    got = allrefs_feed_schedule(sc, ref_list_size=size)
    assert got.shape == want.shape
    assert (got == want).all(), (
        f"{name}/size={size}: first diff at "
        f"{np.nonzero(got != want)[0][:5]} got={got[got != want][:5]} "
        f"want={want[got != want][:5]}"
    )


def test_feed_schedule_properties():
    sc = _patterns()["sparse"]
    feed = allrefs_feed_schedule(sc)
    fed = feed[feed >= 0]
    # every fed index is a scene-change frame, fed once, ascending
    assert sc[fed].all()
    assert len(set(fed.tolist())) == len(fed)
    assert (np.diff(fed) > 0).all()
    assert feed[0] >= 0


def test_feed_schedule_raises_on_too_few_refs():
    from havc_tpu.utils.log import HAVCError

    sc = np.zeros(50, bool)
    sc[[0, 20]] = True  # 2 < DEF_MIN_RF_FRAMES
    with pytest.raises(HAVCError):
        allrefs_feed_schedule(sc)


@pytest.mark.slow
class TestAllRefsPropagate:
    def test_micro_scan_runs_and_lookahead_changes_output(self):
        """The all-refs scan executes at micro geometry and its output
        differs from plain exemplar propagation (the lookahead feeds
        future refs early — a behavioral mode, not plumbing)."""
        from havc_tpu.exemplar import ColorMNetEngine, colormnet_propagate

        eng = ColorMNetEngine(config="micro", work_size=(32, 32))
        rng = np.random.default_rng(5)
        T = 12
        frames = rng.random((T, 32, 32, 3), dtype=np.float32)
        refs = rng.random((T, 32, 32, 3), dtype=np.float32)
        ref_ab = (rng.random((T, 32, 32, 2), dtype=np.float32) * 2 - 1)
        is_ref = np.zeros(T, bool)
        is_ref[[0, 3, 6, 9]] = True
        feed = allrefs_feed_schedule(is_ref)
        eff, reset = allrefs_step_schedule(
            feed, vid_length=T, reset_on_ref_update=True
        )
        assert reset.any()  # vivid reset cadence engages
        ab = colormnet_propagate(
            eng, frames, ref_ab, is_ref, ref_frames=refs,
            feed_schedule=eff, reset_schedule=reset,
        )
        assert ab.shape == (T, 32, 32, 2)
        assert np.isfinite(ab).all()
        ab0 = colormnet_propagate(
            eng, frames, ref_ab, is_ref, ref_frames=refs,
            frame_propagate=False,
        )
        assert not np.allclose(ab, ab0, atol=1e-3)


class TestStepSchedule:
    def test_no_reset_without_vivid_or_cap(self):
        feed = allrefs_feed_schedule(_patterns()["sparse"])
        eff, reset = allrefs_step_schedule(
            feed, vid_length=len(feed), reset_on_ref_update=False
        )
        assert not reset.any()
        assert (eff == feed).all()

    def test_vivid_reset_cadence(self):
        """reset_on_ref_update: a fed ref resets ONLY when the frame
        counter advanced since the previous ref (colormnet_render.py:
        176-180, 205-206) — with a ref fed at every step that is every
        OTHER step (reset zeroes the counter, the next fed ref sees
        frame_count==0 -> ref_count diff 0 -> no reset)."""
        feed = np.arange(10, dtype=np.int64)  # ref fed every step
        eff, reset = allrefs_step_schedule(
            feed, vid_length=10, reset_on_ref_update=True
        )
        assert reset.tolist() == [False, True, False, True, False,
                                  True, False, True, False, True]
        assert (eff == feed).all()  # valid ref == fed ref here

    def test_memory_cap_reset_uses_last_valid_ref(self):
        """reset_cond_1 (frame_count >= max_memory_frames) fires on
        no-feed steps too; the fresh core gets ref_img_valid."""
        feed = np.full(12, -1, np.int64)
        feed[0] = 5
        eff, reset = allrefs_step_schedule(
            feed, vid_length=12, reset_on_ref_update=False,
            max_memory_frames=4,
        )
        # frame_count reaches 4 at n=4 -> reset, again every 5th step
        assert reset.tolist() == [False] * 4 + [True] + [False] * 4 + \
            [True] + [False] * 2
        assert eff[4] == 5 and eff[9] == 5
        assert (eff[[1, 2, 3, 5]] == -1).all()

    def test_default_cap_never_fires(self):
        feed = np.full(500, -1, np.int64)
        feed[0] = 0
        _, reset = allrefs_step_schedule(
            feed, vid_length=500, reset_on_ref_update=False
        )
        assert not reset.any()
