"""Tracing/observability subsystem (SURVEY §5): stage profiling, the
HAVC_LogMessage logger, and per-frame scene-detect decision records."""
import os
import numpy as np
import pytest

import havc_tpu
from havc_tpu.clip import from_frames
from havc_tpu.scene.detect import SceneDetector
from havc_tpu.utils import (
    enable_profiling,
    reset_stages,
    stage_report,
    stage_timer,
    stage_times,
)


class TestStageProfiling:
    def teardown_method(self):
        enable_profiling(False)
        reset_stages()

    def test_disabled_records_nothing(self):
        reset_stages()
        with stage_timer("x"):
            pass
        assert stage_times() == {}

    def test_accumulates_and_reports(self):
        enable_profiling(True)
        reset_stages()
        for _ in range(3):
            with stage_timer("stage_a"):
                pass
        with stage_timer("stage_b", sync=np.zeros(2)):
            pass
        t = stage_times()
        assert t["stage_a"][1] == 3 and t["stage_b"][1] == 1
        rep = stage_report()
        assert "stage_a" in rep and "avg_ms" in rep

    def test_main_pipeline_stages(self, rng):
        clip = from_frames(rng.random((4, 32, 48, 3), dtype=np.float32))
        enable_profiling(True)
        reset_stages()
        havc_tpu.HAVC_main_presets(
            clip, Preset="Fast", ColorModel="Zhang(eccv16)",
            BlackWhiteTune="Light", deflicker=True, batch_size=4)
        t = stage_times()
        assert "colorizer" in t and "bw_post_tune" in t and "deflicker" in t


class TestSceneDebugRecords:
    def test_records_new_and_skip(self, rng):
        a = rng.random((48, 64, 3)).astype(np.float32) * 0.8 + 0.1
        # a 3% brightness dip after static frames spikes the adaptive
        # ratio (candidate) but keeps SSIM ~1 -> the filter rejects it
        # (Skip); the random-frame cut at 8 is structurally new (New)
        frames = np.stack(
            [a] * 6 + [np.clip(a * 0.97, 0, 1)] * 2
            + [rng.random((48, 64, 3)).astype(np.float32)] * 2
        ).astype(np.float32)
        det = SceneDetector(threshold=0.001, sc_tht_filter=0.55,
                            min_length=1, debug=True)
        flags = det.detect(frames)
        recs = det.debug_records
        assert recs and recs[0]["state"] == "New" and recs[0]["reason"] == 1
        assert recs[0]["ssim"] == -1  # first frame has no prior
        states = {r["state"] for r in recs}
        assert "Skip" in states  # near-duplicate frames get skipped
        n_new = sum(r["state"] == "New" for r in recs)
        assert n_new == int(flags.sc_prev.sum())
        for r in recs:  # every record carries the full decision tuple
            assert set(r) == {"state", "frame", "prev", "ssim", "hist",
                              "luma", "reason"}

    def test_debug_off_keeps_no_records(self, rng):
        frames = rng.random((6, 32, 32, 3)).astype(np.float32)
        det = SceneDetector(threshold=0.10, sc_tht_filter=0.55)
        det.detect(frames)
        assert det.debug_records == []

    def test_sc_debug_logs(self, rng, caplog):
        import logging

        frames = rng.random((6, 32, 32, 3)).astype(np.float32)
        clip = from_frames(frames)
        with caplog.at_level(logging.WARNING, logger="havc_tpu"):
            havc_tpu.HAVC_SceneDetect(clip, sc_threshold=0.10,
                                      sc_tht_ssim=0.55, sc_debug=True)
        assert any("SC=[" in r.message for r in caplog.records)


class TestPersistentCompileCache:
    def test_enable_cache_populates_dir(self, tmp_path):
        """havc_tpu.enable_cache wires XLA's persistent compilation cache
        for the whole library (round-3 verdict: it was bench.py-only) —
        compiled executables land in the directory so a second process
        deserializes instead of recompiling."""
        import jax
        import jax.numpy as jnp

        d = str(tmp_path / "xla")
        p = havc_tpu.enable_cache(d, min_compile_time_secs=0.0)
        assert os.path.isdir(p)
        x = jnp.asarray(np.arange(64 * 64, dtype=np.float32).reshape(64, 64))
        jax.jit(lambda a: jnp.sin(a) @ a.T)(x).block_until_ready()
        assert len(os.listdir(p)) > 0
