"""Scene detection: synthetic-clip oracles for the host state machine."""
import numpy as np
import pytest

from havc_tpu.scene import SceneDetector, SceneFlags, scene_detect
from havc_tpu.scene.detect import _hellinger, _ssim_uniform, frame_stats


def make_clip(segments, h=48, w=64, noise=0.01, seed=0):
    """Build a clip from (length, base_gray) segments with tiny noise."""
    rng = np.random.default_rng(seed)
    frames = []
    for length, base in segments:
        for _ in range(length):
            f = np.full((h, w, 3), base, np.float32)
            f += rng.normal(0, noise, f.shape).astype(np.float32)
            frames.append(np.clip(f, 0, 1))
    return np.stack(frames)


def test_frequency_only():
    flags = SceneFlags.every(10, freq=3)
    assert list(np.nonzero(flags.sc_prev)[0]) == [0, 3, 6, 9]


def test_from_frame_list():
    flags = SceneFlags.from_frame_list(10, [0, 4, 7])
    assert list(np.nonzero(flags.sc_prev)[0]) == [0, 4, 7]
    assert flags.sc_next[4] == 1


def test_detects_hard_cut():
    clip = make_clip([(8, 0.3), (8, 0.6)])
    flags = scene_detect(clip, threshold=0.10)
    assert flags.sc_prev[0] == 1
    assert flags.sc_prev[8] == 1
    # no spurious cuts inside segments
    assert flags.sc_prev[1:8].sum() == 0
    assert flags.sc_prev[9:].sum() == 0


def test_luma_gate_blocks_black_frames():
    # cut into a nearly-black segment: luma gate (tht_black=0.10) rejects it
    clip = make_clip([(8, 0.4), (8, 0.02)])
    flags = scene_detect(clip, threshold=0.10)
    assert flags.sc_prev[8] == 0


def test_frequency_forcing_custom_path():
    # custom detector path (threshold<0.10): the reference applies
    # DEF_SC_MIN_DISTANCE=15 when no SSIM filter is configured
    # (vsscdect.py:213-218), which suppresses forced frames inside the
    # minimum distance — so freq=5 yields refs at 0, 15, ...
    clip = make_clip([(20, 0.4)])
    flags = scene_detect(clip, threshold=0.01, frequency=5, sc_tht_filter=0.0,
                         tht_offset=2)
    forced = list(np.nonzero(flags.sc_prev)[0])
    assert forced == [0, 15]


def test_frequency_forcing_simple_path():
    # simple detector path (threshold>=0.10): filter_black_white forces
    # every freq-th frame without a minimum distance (vsscdect.py:253-255)
    clip = make_clip([(20, 0.4)])
    flags = scene_detect(clip, threshold=0.2, frequency=5)
    forced = np.nonzero(flags.sc_prev)[0]
    for n in (0, 5, 10, 15):
        assert n in forced


def test_min_length_suppresses_bursts():
    # rapid alternation; min_length keeps detections sparse
    segs = [(2, 0.3), (2, 0.6)] * 6
    clip = make_clip(segs)
    flags = scene_detect(clip, threshold=0.05, sc_tht_filter=1.0, min_length=6)
    idx = np.nonzero(flags.sc_prev)[0]
    assert len(idx) >= 1
    assert (np.diff(idx) >= 6).all()


def test_ssim_filter_rejects_similar():
    # slow brightness drift triggers raw diffs but SSIM filter rejects
    rng = np.random.default_rng(3)
    base = rng.random((48, 64, 3), dtype=np.float32) * 0.3 + 0.3
    frames = np.stack([np.clip(base + 0.01 * i, 0, 1) for i in range(10)])
    flags = scene_detect(frames, threshold=0.005, sc_tht_filter=0.55)
    assert flags.sc_prev[0] == 1
    assert flags.sc_prev[1:].sum() == 0


def test_stats_shapes():
    clip = make_clip([(5, 0.5)])
    grays, lumas, diffs, hists = frame_stats(clip)
    assert grays.shape[0] == 5
    assert lumas.shape == (5,) and diffs.shape == (5,)
    assert hists.shape == (5, 256)
    assert abs(lumas[0] - 0.5) < 0.02


def test_ssim_identical_is_one():
    rng = np.random.default_rng(4)
    a = rng.random((32, 32))
    assert _ssim_uniform(a, a) > 0.999


def test_ssim_noise_low():
    rng = np.random.default_rng(5)
    a = rng.random((32, 32))
    b = rng.random((32, 32))
    assert _ssim_uniform(a, b) < 0.3


def test_hellinger_bounds():
    h1 = np.zeros(256)
    h1[10] = 1.0
    h2 = np.zeros(256)
    h2[200] = 1.0
    assert _hellinger(h1, h1) < 1e-6
    assert _hellinger(h1, h2) > 0.9


def test_hellinger_matches_cv2():
    import cv2

    rng = np.random.default_rng(6)
    h1 = rng.random(256).astype(np.float32)
    h2 = rng.random(256).astype(np.float32)
    ref = cv2.compareHist(h1, h2, cv2.HISTCMP_HELLINGER)
    assert abs(_hellinger(h1, h2) - ref) < 1e-4


@pytest.mark.parametrize("params", [
    dict(threshold=0.10),                                   # simple pass
    dict(threshold=0.08, tht_offset=3),                     # custom pass
    dict(threshold=0.10, sc_tht_filter=0.55, min_length=5), # + filter pass
    dict(threshold=0.10, frequency=7, sc_tht_filter=0.55),  # freq forcing
    dict(threshold=0.0),                                    # trivial: first
    dict(threshold=0.0, frequency=4),                       # trivial: every 4
    dict(threshold=0.10, normalize=True, min_length=3),
])
@pytest.mark.parametrize("chunk", [5, 9])
def test_stream_detector_matches_whole(params, chunk):
    """StreamSceneDetector fed in chunks must reproduce the whole-clip
    SceneDetector flags exactly — every pass (adaptive ratio, luma gates,
    frequency, SSIM/Hellinger confirmation, tht_offset lag window) carries
    its state across chunk boundaries."""
    from havc_tpu.scene.detect import StreamSceneDetector

    frames = make_clip(
        [(8, 0.4), (6, 0.75), (3, 0.05), (9, 0.55), (4, 0.3), (7, 0.65)],
        noise=0.02, seed=3,
    )
    whole = SceneDetector(**params).detect(frames).sc_prev
    sd = StreamSceneDetector(**params)
    got = np.concatenate([
        sd.feed(frames[i:i + chunk]) for i in range(0, len(frames), chunk)
    ])
    np.testing.assert_array_equal(got, whole)
