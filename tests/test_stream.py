"""Streaming video pipeline: bounded-memory decode -> compute -> encode."""
import numpy as np
import pytest

from havc_tpu.io import process_video, stream_batches


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("vid") / "in.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
    rng = np.random.default_rng(0)
    for i in range(11):
        frame = np.full((48, 64, 3), i * 20, np.uint8)
        w.write(frame)
    w.release()
    return path


def test_stream_batches_counts(sample):
    batches = list(stream_batches(sample, batch_size=4))
    assert sum(b.shape[0] for b in batches) == 11
    assert batches[0].shape == (4, 48, 64, 3)
    assert batches[-1].shape[0] == 3  # tail


def test_stream_count_limit(sample):
    batches = list(stream_batches(sample, batch_size=4, count=6))
    assert sum(b.shape[0] for b in batches) == 6


def test_process_video_roundtrip(sample, tmp_path):
    import jax

    out_path = str(tmp_path / "out.mp4")
    fn = jax.jit(lambda x: 1.0 - x)  # invert
    n = process_video(sample, out_path, fn, batch_size=4)
    assert n == 11
    import cv2

    cap = cv2.VideoCapture(out_path)
    ok, frame = cap.read()
    cap.release()
    assert ok
    # first input frame was ~0 -> inverted ~255 (codec-lossy)
    assert frame.mean() > 200
