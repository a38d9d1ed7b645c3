"""Exemplar engines: memory-bank semantics, ColorMNet/DeepEx/Remaster flows.

Uses nano/micro configs at tiny sizes — structure-identical to the full
geometry, sized for test-time compiles.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from havc_tpu.models import memory as mem
from havc_tpu.models.colormnet import get_similarity, topk_softmax, readout


@pytest.fixture(scope="module")
def mem_cfg():
    return mem.MemoryConfig(
        key_dim=4, value_dim=8, tokens_per_frame=6,
        perm_frames=2, work_frames=3, min_work_frames=1, lt_tokens=16,
        n_proto=4, top_k=4,
    )


class TestMemoryBank:
    def test_empty_readout_is_zero(self, mem_cfg):
        state = mem.init_memory(mem_cfg)
        qk = jnp.ones((6, 4))
        out, _ = mem.read_memory(state, mem_cfg, qk, None)
        assert np.abs(np.asarray(out)).max() == 0.0

    def test_reference_insert_and_recall(self, mem_cfg):
        state = mem.init_memory(mem_cfg)
        rng = np.random.default_rng(0)
        keys = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
        values = jnp.asarray(rng.normal(size=(2, 6, 8)).astype(np.float32))
        shrink = jnp.ones((6,))
        state = mem.insert_reference(
            state, mem_cfg, keys, shrink, values, jnp.asarray(True)
        )
        # query with the same keys: readout should closely match the values
        out, _ = mem.read_memory(state, mem_cfg, keys, None)
        # top-k softmax over a single matching frame: dominated by self-slot
        self_sim = np.einsum("pc,pc->p", np.asarray(keys), np.asarray(keys))
        assert np.corrcoef(
            np.asarray(out)[0].ravel(), np.asarray(values)[0].ravel()
        )[0, 1] > 0.5

    def test_masked_insert_noop(self, mem_cfg):
        state = mem.init_memory(mem_cfg)
        keys = jnp.ones((6, 4))
        values = jnp.ones((2, 6, 8))
        state2 = mem.insert_reference(
            state, mem_cfg, keys, jnp.ones((6,)), values, jnp.asarray(False)
        )
        assert not bool(np.asarray(state2.perm_valid).any())
        assert int(state2.perm_ptr) == 0

    def test_working_ring_eviction_consolidates(self, mem_cfg):
        state = mem.init_memory(mem_cfg)
        rng = np.random.default_rng(1)
        for i in range(mem_cfg.work_frames + 1):
            keys = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
            values = jnp.asarray(rng.normal(size=(2, 6, 8)).astype(np.float32))
            state = mem.insert_working(
                state, mem_cfg, keys, jnp.ones((6,)), values, jnp.asarray(True)
            )
        # one eviction happened -> long-term ring received n_proto tokens
        assert int(state.lt_ptr) == mem_cfg.n_proto
        assert int(np.asarray(state.lt_valid).sum()) == mem_cfg.n_proto
        assert int(state.work_ptr) == mem_cfg.work_frames + 1

    def test_usage_accumulates(self, mem_cfg):
        state = mem.init_memory(mem_cfg)
        rng = np.random.default_rng(2)
        keys = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
        values = jnp.asarray(rng.normal(size=(2, 6, 8)).astype(np.float32))
        state = mem.insert_working(
            state, mem_cfg, keys, jnp.ones((6,)), values, jnp.asarray(True)
        )
        _, state = mem.read_memory(state, mem_cfg, keys, None)
        assert float(np.asarray(state.work_usage).sum()) > 0


class TestSimilarity:
    def test_self_similarity_is_max(self):
        rng = np.random.default_rng(3)
        mk = jnp.asarray(rng.normal(size=(10, 8)).astype(np.float32))
        sim = get_similarity(mk, None, mk, None)
        # diagonal (negative squared distance scaled) should be the row max
        s = np.asarray(sim)
        assert (s.argmax(axis=0) == np.arange(10)).all()

    def test_selection_weighting(self):
        rng = np.random.default_rng(4)
        mk = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
        qk = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
        qe = jnp.ones((3, 8))
        # full selection == unweighted L2 similarity up to the b_sq constant
        s1 = np.asarray(get_similarity(mk, None, qk, qe))
        s2 = np.asarray(get_similarity(mk, None, qk, None))
        col_shift = s1 - s2  # should be constant per column (b_sq term)
        assert np.abs(col_shift - col_shift[0:1]).max() < 1e-4

    def test_topk_sparsity(self):
        rng = np.random.default_rng(5)
        sim = jnp.asarray(rng.normal(size=(20, 7)).astype(np.float32))
        aff, usage = topk_softmax(sim, top_k=5)
        a = np.asarray(aff)
        assert ((a > 0).sum(axis=0) <= 5).all()
        assert np.allclose(a.sum(axis=0), 1.0, atol=1e-5)
        assert np.allclose(np.asarray(usage).sum(), 7.0, atol=1e-4)

    def test_topk_all_masked_zero(self):
        sim = jnp.zeros((10, 4))
        valid = jnp.zeros((10,), bool)
        aff, usage = topk_softmax(sim, top_k=3, valid=valid)
        assert np.abs(np.asarray(aff)).max() == 0.0


@pytest.mark.slow
class TestColorMNetFlow:
    def test_propagate_tiny(self):
        from havc_tpu.exemplar import ColorMNetEngine, colormnet_propagate

        eng = ColorMNetEngine(config="micro", work_size=(32, 32))
        rng = np.random.default_rng(0)
        frames = rng.random((4, 32, 32, 3), dtype=np.float32)
        ref_ab = (rng.random((4, 32, 32, 2), dtype=np.float32) * 2 - 1)
        is_ref = np.array([1, 0, 0, 0], bool)
        ab = colormnet_propagate(eng, frames, ref_ab, is_ref)
        assert ab.shape == (4, 32, 32, 2)
        assert np.isfinite(ab).all()
        # reference frame passes its ab through up to the engine's compute
        # dtype quantization (bf16 by default on TPU: rel ~2^-8)
        assert np.abs(ab[0] - ref_ab[0]).max() < 5e-3
        # predictions bounded by tanh
        assert np.abs(ab[1:]).max() <= 1.0


@pytest.mark.slow
class TestRemasterFlow:
    def test_window_colorize(self):
        from havc_tpu.exemplar import RemasterEngine, remaster_propagate

        eng = RemasterEngine()
        rng = np.random.default_rng(1)
        frames = np.tile(
            rng.random((4, 32, 32, 1), dtype=np.float32), (1, 1, 1, 3)
        )
        refs = rng.random((2, 32, 32, 3), dtype=np.float32)
        out = remaster_propagate(eng, frames, refs, length=2)
        assert out.shape == frames.shape
        assert np.isfinite(out).all()
        # luma preserved through the LAB re-marry
        from havc_tpu.ops.colorspace import luma

        y_in = np.asarray(luma(jnp.asarray(frames)))
        y_out = np.asarray(luma(jnp.asarray(out)))
        assert np.abs(y_in - y_out).mean() < 0.1


class TestDeepExMethodValidation:
    """Error-path checks for the 7 reference-method ids (no model runs)."""

    def _clip(self, n=4):
        from havc_tpu.clip import from_frames

        rng = np.random.default_rng(0)
        return from_frames(rng.random((n, 32, 32, 3), dtype=np.float32))

    def test_method_0_needs_clip_ref(self):
        from havc_tpu.exemplar import HAVC_deepex

        with pytest.raises(ValueError, match="requires clip_ref"):
            HAVC_deepex(self._clip(), None, method=0, sc_framedir="/tmp/x")

    def test_method_3_needs_framedir(self):
        from havc_tpu.exemplar import HAVC_deepex

        with pytest.raises(ValueError, match="requires sc_framedir"):
            HAVC_deepex(self._clip(), self._clip(), method=3)

    def test_refmerge_invalid_with_method_2(self):
        from havc_tpu.exemplar import HAVC_deepex

        with pytest.raises(ValueError, match="RefMerge"):
            HAVC_deepex(self._clip(), self._clip(), method=2, ref_weight=0.5)

    def test_no_flags_raises(self):
        from havc_tpu.exemplar import HAVC_deepex

        with pytest.raises(ValueError, match="scene-change flags"):
            HAVC_deepex(self._clip(), self._clip(), method=0)


@pytest.mark.slow
class TestChunkedResume:
    def test_chunked_equals_whole(self):
        """Chunked propagation with carried state == one-shot scan —
        mid-video checkpoint/resume the reference cannot do."""
        from havc_tpu.exemplar import ColorMNetEngine, colormnet_propagate

        eng = ColorMNetEngine(config="micro", work_size=(32, 32))
        rng = np.random.default_rng(7)
        T = 6
        frames = rng.random((T, 32, 32, 3), dtype=np.float32)
        ref_ab = rng.random((T, 32, 32, 2), dtype=np.float32) * 2 - 1
        is_ref = np.zeros(T, bool)
        is_ref[0] = True

        whole = colormnet_propagate(eng, frames, ref_ab, is_ref)
        ab1, state = colormnet_propagate(
            eng, frames[:3], ref_ab[:3], is_ref[:3], return_state=True
        )
        ab2 = colormnet_propagate(
            eng, frames[3:], ref_ab[3:], is_ref[3:], resume_state=state
        )
        chunked = np.concatenate([ab1, ab2])
        assert np.abs(chunked - whole).max() < 5e-3


class TestRemasterSlidingWindow:
    def test_window_advances_past_future_split(self):
        """ref_buffer_adjust semantics (remaster_render.py:203-231): the
        S-slot buffer slides forward once the current frame passes the
        past/future split reference."""
        from havc_tpu import exemplar

        seen = []

        class StubModel:
            def apply(self, params, *args, method=None):
                if method == "encode_refs":
                    refs = args[0]
                    seen.append(np.asarray(refs)[0, :, 0, 0, 0].copy())
                    return refs, refs
                l = args[0]
                return jnp.full(l.shape[:-1] + (2,), 0.5, jnp.float32)

        class StubEngine:
            model = StubModel()
            params = None

        T, H, W = 24, 8, 8
        frames = np.full((T, H, W, 3), 0.5, np.float32)
        # 8 refs at frames 0,3,6,...,21; tag each ref by its value
        ref_pos = np.arange(0, 24, 3)
        refs = np.zeros((8, H, W, 3), np.float32)
        for i in range(8):
            refs[i] = i / 10.0
        # run un-jitted so the stub can observe concrete ref windows
        orig_cached_jit = exemplar.cached_jit
        exemplar.cached_jit = lambda key, thunk: thunk()
        try:
            out = exemplar.remaster_propagate(
                StubEngine(), frames, refs, length=2, ref_positions=ref_pos,
                ref_buffer_size=4,
            )
        finally:
            exemplar.cached_jit = orig_cached_jit
        assert out.shape == (T, H, W, 3)
        firsts = [w[0] for w in seen]
        # early windows use refs starting at 0; later windows slide forward
        assert firsts[0] == 0.0
        assert firsts[-1] > 0.0
        # window always 4 slots, consecutive refs
        for w in seen:
            assert len(w) == 4
            np.testing.assert_allclose(np.diff(w), 0.1, atol=1e-6)


class TestConsolidationSemantics:
    """Reference compress_features/consolidation parity
    (memory_manager.py:214-288)."""

    def _cfg(self):
        return mem.MemoryConfig(
            key_dim=4, value_dim=8, tokens_per_frame=4,
            perm_frames=1, work_frames=4, min_work_frames=1, lt_tokens=8,
            n_proto=3, top_k=4,
        )

    def _fill(self, cfg, n_frames, seed=0):
        rng = np.random.default_rng(seed)
        state = mem.init_memory(cfg)
        frames = []
        for i in range(n_frames):
            k = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
            v = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
            frames.append((k, v))
            state = mem.insert_working(
                state, cfg, k, jnp.ones((4,)), v, jnp.asarray(True)
            )
        return state, frames

    def test_first_frame_protected(self):
        cfg = self._cfg()
        state, frames = self._fill(cfg, 7)
        # the first-inserted frame (work_t == 0) must still be resident
        wt = np.asarray(state.work_t)
        wv = np.asarray(state.work_valid)
        assert ((wt == 0) & wv).any(), "first frame was consolidated away"
        k0 = np.asarray(frames[0][0])
        kept = np.asarray(state.work_keys)[np.argmax((wt == 0) & wv)]
        np.testing.assert_allclose(kept, k0, atol=1e-6)

    def test_prototype_values_are_potentiated(self):
        """Prototype values must be attention blends over candidates, not
        copies (the potentiation step)."""
        cfg = self._cfg()
        state, frames = self._fill(cfg, 5)
        lt_v = np.asarray(state.lt_values)
        lt_valid = np.asarray(state.lt_valid)
        assert lt_valid.sum() >= cfg.n_proto
        # potentiated values are convex-ish blends: they should not exactly
        # equal any single inserted token's value
        inserted = np.concatenate(
            [np.asarray(v).reshape(2, 4, 8) for _, v in frames], axis=1
        )  # (2, 20, 8)
        for slot in np.nonzero(lt_valid)[0][: cfg.n_proto]:
            diffs = np.abs(
                inserted - lt_v[:, slot][:, None, :]
            ).max(axis=(0, 2))
            assert diffs.min() > 1e-5  # a blend, not a copy

    def test_lt_overwrites_lowest_usage(self):
        cfg = self._cfg()
        state, _ = self._fill(cfg, 5)  # one consolidation -> 3 lt protos
        # bump usage on some lt slots by reading with their own keys
        rng = np.random.default_rng(9)
        qk = jnp.asarray(np.asarray(state.lt_keys)[:4])
        _, state = mem.read_memory(state, cfg, qk, None)
        used = np.asarray(state.lt_usage).copy()
        # force more consolidations
        for i in range(6):
            k = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
            v = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
            state = mem.insert_working(
                state, cfg, k, jnp.ones((4,)), v, jnp.asarray(True)
            )
        # the highest-usage lt slot should have survived longer than the
        # zero-usage ones: its usage was reset only if overwritten
        assert np.asarray(state.lt_valid).sum() > 0
