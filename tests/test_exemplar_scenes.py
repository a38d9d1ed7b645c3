"""Scene-parallel ColorMNet propagation (colormnet_propagate_scenes).

In vivid mode each reference fully resets the InferenceCore
(colormnet_render.py:204-221), so scenes are independent and the scan can
be vmapped over a scene axis and sharded over a device mesh.  These tests
pin:

1. scene-parallel == sequential vivid propagation (same ab outputs),
2. ragged scene lengths are handled by padding without cross-talk,
3. the mesh path runs sharded over 8 virtual devices and agrees.
"""
import numpy as np
import pytest
import jax

from havc_tpu.exemplar import (
    ColorMNetEngine,
    colormnet_propagate,
    colormnet_propagate_scenes,
)


@pytest.fixture(scope="module")
def engine():
    return ColorMNetEngine(config="micro", work_size=(64, 112), seed=3)


def _clip(rng, T, h, w):
    frames = rng.random((T, h, w, 3), dtype=np.float32)
    ref_ab = (rng.random((T, h, w, 2), dtype=np.float32) * 2 - 1) * 0.4
    return frames, ref_ab


class TestSceneParallel:
    def test_matches_sequential_vivid(self, engine, rng):
        T = 12
        frames, ref_ab = _clip(rng, T, 64, 112)
        is_ref = np.zeros(T, bool)
        is_ref[[0, 4, 8]] = True  # three equal scenes

        seq = colormnet_propagate(engine, frames, ref_ab, is_ref,
                                  frame_propagate=True, vivid=True)
        par = colormnet_propagate_scenes(engine, frames, ref_ab, is_ref,
                                         frame_propagate=True)
        np.testing.assert_allclose(par, seq, atol=2e-5, rtol=1e-4)

    def test_ragged_scenes_no_crosstalk(self, engine, rng):
        T = 11
        frames, ref_ab = _clip(rng, T, 64, 112)
        is_ref = np.zeros(T, bool)
        is_ref[[0, 2, 7]] = True  # lengths 2, 5, 4 -> padded to 5

        seq = colormnet_propagate(engine, frames, ref_ab, is_ref,
                                  frame_propagate=True, vivid=True)
        par = colormnet_propagate_scenes(engine, frames, ref_ab, is_ref,
                                         frame_propagate=True)
        np.testing.assert_allclose(par, seq, atol=2e-5, rtol=1e-4)

    def test_exemplar_mode(self, engine, rng):
        """frame_propagate=False (step_AnyExemplar semantics) with vivid
        resets: ref != frame."""
        T = 8
        frames, ref_ab = _clip(rng, T, 64, 112)
        refs = np.clip(frames * 0.9 + 0.05, 0, 1)
        is_ref = np.zeros(T, bool)
        is_ref[[0, 4]] = True

        seq = colormnet_propagate(engine, frames, ref_ab, is_ref,
                                  ref_frames=refs, frame_propagate=False,
                                  vivid=True)
        par = colormnet_propagate_scenes(engine, frames, ref_ab, is_ref,
                                         ref_frames=refs,
                                         frame_propagate=False)
        np.testing.assert_allclose(par, seq, atol=2e-5, rtol=1e-4)

    def test_device_out_matches_host(self, engine, rng):
        """device_out=True returns the SAME (T, fh, fw, 2) ab as the host
        path, as a device array (streaming joins keep it resident — the
        tunnel download otherwise dominates at small geometry)."""
        import jax as _jax

        T = 9
        frames, ref_ab = _clip(rng, T, 64, 112)
        is_ref = np.zeros(T, bool)
        is_ref[[0, 5]] = True

        host = colormnet_propagate_scenes(engine, frames, ref_ab, is_ref)
        dev = colormnet_propagate_scenes(engine, frames, ref_ab, is_ref,
                                         device_out=True)
        assert isinstance(dev, _jax.Array)
        assert dev.shape == (T, 64, 112, 2)
        np.testing.assert_allclose(np.asarray(dev), host, atol=1e-6)

    def test_requires_leading_ref(self, engine, rng):
        frames, ref_ab = _clip(rng, 4, 64, 112)
        is_ref = np.zeros(4, bool)
        is_ref[1] = True
        with pytest.raises(ValueError, match="is_ref\\[0\\]"):
            colormnet_propagate_scenes(engine, frames, ref_ab, is_ref)

    def test_empty_clip_respects_device_out(self, engine):
        """T=0: the early return must honor device_out (round-4 advisor:
        an empty chunk in a device-resident pipeline previously came back
        as np.ndarray)."""
        import jax as _jax

        frames = np.zeros((0, 64, 112, 3), np.float32)
        ref_ab = np.zeros((0, 64, 112, 2), np.float32)
        is_ref = np.zeros(0, bool)
        host = colormnet_propagate_scenes(engine, frames, ref_ab, is_ref)
        assert isinstance(host, np.ndarray) and host.shape == ref_ab.shape
        dev = colormnet_propagate_scenes(engine, frames, ref_ab, is_ref,
                                         device_out=True)
        assert isinstance(dev, _jax.Array) and dev.shape == ref_ab.shape


class TestSceneParallelMesh:
    def test_sharded_over_8_devices(self, engine, rng):
        from havc_tpu.parallel import make_mesh

        n = min(8, len(jax.devices()))
        if n < 2:
            pytest.skip("needs multiple devices")
        mesh = make_mesh(n, data=n, model=1)

        T = 16
        frames, ref_ab = _clip(rng, T, 64, 112)
        is_ref = np.zeros(T, bool)
        is_ref[[0, 3, 6, 9, 12, 14]] = True  # 6 scenes -> padded to 8

        seq = colormnet_propagate(engine, frames, ref_ab, is_ref,
                                  frame_propagate=True, vivid=True)
        par = colormnet_propagate_scenes(engine, frames, ref_ab, is_ref,
                                         frame_propagate=True, mesh=mesh)
        np.testing.assert_allclose(par, seq, atol=2e-5, rtol=1e-4)


class TestRemasterMesh:
    def test_sharded_groups_match(self, rng):
        """remaster_propagate(mesh=...) shards window groups over devices;
        output must equal the single-device run (grouping only batches,
        the per-window math is unchanged)."""
        import jax
        from havc_tpu.exemplar import RemasterEngine, remaster_propagate
        from havc_tpu.parallel import make_mesh

        n = min(8, len(jax.devices()))
        if n < 2:
            pytest.skip("needs multiple devices")
        mesh = make_mesh(n, data=n, model=1)

        eng = RemasterEngine()
        T, h, w = 16, 64, 96
        frames = rng.random((T, h, w, 3), dtype=np.float32)
        refs = rng.random((4, h, w, 3), dtype=np.float32)
        pos = np.array([0, 4, 8, 12])

        base = remaster_propagate(eng, frames, refs, length=2,
                                  ref_positions=pos, ref_buffer_size=2)
        shard = remaster_propagate(eng, frames, refs, length=2,
                                   ref_positions=pos, ref_buffer_size=2,
                                   mesh=mesh)
        np.testing.assert_allclose(shard, base, atol=2e-5, rtol=1e-4)


class TestDeepExMesh:
    def test_sharded_batch_matches(self, rng):
        """deepex_propagate(mesh=...) shards the per-scene frame batch;
        output must equal the single-device run."""
        import jax
        from havc_tpu.exemplar import DeepExEngine, deepex_propagate
        from havc_tpu.parallel import make_mesh

        n = min(8, len(jax.devices()))
        if n < 2:
            pytest.skip("needs multiple devices")
        mesh = make_mesh(n, data=n, model=1)

        eng = DeepExEngine(speed="fast")
        T = 10
        frames = rng.random((T, eng.h, eng.w, 3), dtype=np.float32)
        refs = np.clip(frames * 0.9 + 0.05, 0, 1)
        is_ref = np.zeros(T, bool)
        is_ref[[0, 5]] = True

        base = deepex_propagate(eng, frames, refs, is_ref, wls_filter=False)
        shard = deepex_propagate(eng, frames, refs, is_ref, wls_filter=False,
                                 mesh=mesh)
        np.testing.assert_allclose(shard, base, atol=2e-5, rtol=1e-4)
