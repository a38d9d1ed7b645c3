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
        max_mt_frames=3, min_mt_frames=1, lt_capacity=16,
        num_prototypes=4, top_k=4,
    )


def _rand_insert(rng, cfg, state, enabled=True):
    P = cfg.tokens_per_frame
    keys = jnp.asarray(rng.normal(size=(P, cfg.key_dim)).astype(np.float32))
    sel = jnp.asarray(
        (rng.random((P, cfg.key_dim)) * 0.9 + 0.05).astype(np.float32)
    )
    values = jnp.asarray(
        rng.normal(size=(2, P, cfg.value_dim)).astype(np.float32)
    )
    state = mem.insert_working(
        state, cfg, keys, jnp.ones((P,)), sel, values, jnp.asarray(enabled)
    )
    return state, (keys, sel, values)


class TestMemoryBank:
    def test_empty_readout_is_zero(self, mem_cfg):
        state = mem.init_memory(mem_cfg)
        qk = jnp.ones((6, 4))
        out, _ = mem.read_memory(state, mem_cfg, qk, None)
        assert np.abs(np.asarray(out)).max() == 0.0

    def test_insert_and_recall(self, mem_cfg):
        state = mem.init_memory(mem_cfg)
        rng = np.random.default_rng(0)
        state, (keys, _, values) = _rand_insert(rng, mem_cfg, state)
        # query with the same keys: readout should closely match the values
        out, _ = mem.read_memory(state, mem_cfg, keys, None)
        assert np.corrcoef(
            np.asarray(out)[0].ravel(), np.asarray(values)[0].ravel()
        )[0, 1] > 0.5

    def test_masked_insert_noop(self, mem_cfg):
        state = mem.init_memory(mem_cfg)
        rng = np.random.default_rng(3)
        state2, _ = _rand_insert(rng, mem_cfg, state, enabled=False)
        assert not bool(np.asarray(state2.work_valid).any())
        assert int(state2.next_stamp) == 0

    def test_full_store_consolidates(self, mem_cfg):
        state = mem.init_memory(mem_cfg)
        rng = np.random.default_rng(1)
        for i in range(mem_cfg.max_mt_frames):
            state, _ = _rand_insert(rng, mem_cfg, state)
        # store reached max_mt -> consolidation ran post-insert
        # (memory_manager.py:183-193): long-term received n_proto tokens
        # and the working store shrank to min_mt frames
        assert int(np.asarray(state.lt_valid).sum()) == mem_cfg.num_prototypes
        assert int(np.asarray(state.work_valid).sum()) == mem_cfg.min_mt_frames
        assert int(state.next_stamp) == mem_cfg.max_mt_frames

    def test_first_insert_protected(self, mem_cfg):
        state = mem.init_memory(mem_cfg)
        rng = np.random.default_rng(5)
        state, first = _rand_insert(rng, mem_cfg, state)
        for i in range(7):
            state, _ = _rand_insert(rng, mem_cfg, state)
        wv = np.asarray(state.work_valid)
        ws = np.asarray(state.work_stamp)
        assert ((ws == 0) & wv).any(), "first insert was consolidated away"
        kept = np.asarray(state.work_keys)[np.argmax((ws == 0) & wv)]
        np.testing.assert_allclose(kept, np.asarray(first[0]), atol=1e-6)

    def test_usage_accumulates(self, mem_cfg):
        state = mem.init_memory(mem_cfg)
        rng = np.random.default_rng(2)
        state, (keys, _, _) = _rand_insert(rng, mem_cfg, state)
        _, state = mem.read_memory(state, mem_cfg, keys, None)
        assert float(np.asarray(state.work_use).sum()) > 0
        # life_count incremented for resident tokens (kv_memory_store:99)
        live = np.asarray(state.work_life)[np.asarray(state.work_valid)]
        assert np.allclose(live, 1.0 + 1e-7)


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

    def test_propagate_pads_in_normalized_lab_space(self):
        """Frames smaller than the engine are zero-padded in NORMALIZED-LAB
        space (L*=50 neutral gray), exactly pad_divide_by on the
        im_transform-ed tensor (inference_core.py:51 + F.pad zeros) — NOT
        black RGB.  Equivalence check: caller-side padding with the L*=50
        gray RGB + zero ab must reproduce the internal pad."""
        from havc_tpu.exemplar import ColorMNetEngine, colormnet_propagate
        from havc_tpu.ops.colorspace import lab_to_rgb

        eng = ColorMNetEngine(config="micro", work_size=(32, 32))
        rng = np.random.default_rng(3)
        fh, fw = 26, 22
        frames = rng.random((3, fh, fw, 3), dtype=np.float32)
        ref_ab = (rng.random((3, fh, fw, 2), dtype=np.float32) * 2 - 1)
        is_ref = np.array([1, 0, 0], bool)
        small = colormnet_propagate(eng, frames, ref_ab, is_ref)
        assert small.shape == (3, fh, fw, 2)

        gray = np.asarray(
            lab_to_rgb(jnp.array([[[[50.0, 0.0, 0.0]]]]))
        ).reshape(3)
        lh, lw = (32 - fh) // 2, (32 - fw) // 2
        uh, uw = 32 - fh - lh, 32 - fw - lw
        fr_big = np.empty((3, 32, 32, 3), np.float32)
        fr_big[:] = gray
        fr_big[:, lh : lh + fh, lw : lw + fw] = frames
        ab_big = np.zeros((3, 32, 32, 2), np.float32)
        ab_big[:, lh : lh + fh, lw : lw + fw] = ref_ab
        big = colormnet_propagate(eng, fr_big, ab_big, is_ref)
        np.testing.assert_allclose(
            small, big[:, lh : lh + fh, lw : lw + fw], atol=2e-3
        )


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


class TestMemoryManagerOracle:
    """Direct oracle: drive the reference torch MemoryManager
    (memory_manager.py:8-288 + kv_memory_store.py) and the static-shape
    rebuild with IDENTICAL insert/match schedules and compare readouts.

    This pins down add-order candidate selection, first-insert protection,
    normalized-usage prototype ranking, selection-weighted potentiation,
    top-k readout over [long, work], and use/life accounting — the memory
    semantics the ColorMNet scan depends on.
    """

    H, W_ = 2, 4  # token grid (P = 8)
    CK, CV = 4, 8

    def _torch_mm(self, cfg):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from _ref_loader import load_ref_module

        mm_mod = load_ref_module(
            "vsdeoldify.colormnet.inference.memory_manager")
        config = {
            "hidden_dim": 4,
            "top_k": cfg.top_k,
            "enable_long_term": True,
            "enable_long_term_count_usage": cfg.count_long_usage,
            "max_mid_term_frames": cfg.max_mt_frames,
            "min_mid_term_frames": cfg.min_mt_frames,
            "num_prototypes": cfg.num_prototypes,
            "max_long_term_elements": cfg.lt_capacity,
        }
        return mm_mod.MemoryManager(config=config)

    def _run_pair(self, cfg, schedule, seed=0):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(seed)
        mm = self._torch_mm(cfg)
        state = mem.init_memory(cfg)
        P = self.H * self.W_
        outs_t, outs_j = [], []
        for op in schedule:
            if op == "add":
                k = rng.normal(size=(P, self.CK)).astype(np.float32)
                s = (rng.random(P).astype(np.float32) * 2 + 1)
                e = (rng.random((P, self.CK)).astype(np.float32) * 0.9 + 0.05)
                v = rng.normal(size=(2, P, self.CV)).astype(np.float32)

                def g(a, c):  # (P, C) -> (1, C, H, W)
                    return torch.from_numpy(
                        a.reshape(self.H, self.W_, c).transpose(2, 0, 1).copy()
                    ).unsqueeze(0)

                mm.add_memory(
                    g(k, self.CK), g(s[:, None], 1),
                    torch.from_numpy(
                        v.reshape(2, self.H, self.W_, self.CV)
                        .transpose(0, 3, 1, 2).copy()
                    ).unsqueeze(0),
                    objects=[1, 2], selection=g(e, self.CK),
                )
                state = mem.insert_working(
                    state, cfg, jnp.asarray(k), jnp.asarray(s),
                    jnp.asarray(e), jnp.asarray(v), jnp.asarray(True),
                )
            else:  # match
                qk = rng.normal(size=(P, self.CK)).astype(np.float32)
                qe = (rng.random((P, self.CK)).astype(np.float32) * 0.9 + 0.05)

                def g(a, c):
                    return torch.from_numpy(
                        a.reshape(self.H, self.W_, c).transpose(2, 0, 1).copy()
                    ).unsqueeze(0)

                with torch.no_grad():
                    r_t = mm.match_memory(g(qk, self.CK), g(qe, self.CK))
                outs_t.append(
                    r_t.numpy().reshape(2, self.CV, P).transpose(0, 2, 1)
                )
                with jax.default_matmul_precision("highest"):
                    r_j, state = mem.read_memory(
                        state, cfg, jnp.asarray(qk), jnp.asarray(qe)
                    )
                outs_j.append(np.asarray(r_j))
        return mm, state, outs_t, outs_j

    def _assert_close(self, outs_t, outs_j, tol=5e-4):
        for i, (a, b) in enumerate(zip(outs_t, outs_j)):
            scale = max(np.abs(a).max(), 1e-3)
            err = np.abs(a - b).max() / scale
            assert err < tol, f"readout {i}: rel err {err:.2e}"

    def _cfg(self, **kw):
        kw.setdefault("key_dim", self.CK)
        kw.setdefault("value_dim", self.CV)
        kw.setdefault("tokens_per_frame", self.H * self.W_)
        kw.setdefault("max_mt_frames", 4)
        kw.setdefault("min_mt_frames", 2)
        kw.setdefault("num_prototypes", 6)
        kw.setdefault("lt_capacity", 64)
        kw.setdefault("top_k", 4)
        return mem.MemoryConfig(**kw)

    def test_pre_consolidation_parity(self):
        cfg = self._cfg()
        schedule = ["add", "match", "add", "match", "add", "match"]
        _, state, outs_t, outs_j = self._run_pair(cfg, schedule)
        self._assert_close(outs_t, outs_j)
        assert int(np.asarray(state.lt_valid).sum()) == 0

    def test_consolidation_parity(self):
        """Readouts stay equal across repeated consolidations (usage-ranked
        prototype selection + potentiation + sieve).  With max_mt=4 and
        min_mt=2 the store refills to 4 frames every 2 adds, so 9 adds
        consolidate at adds 4, 6 and 8."""
        cfg = self._cfg()
        schedule = []
        for i in range(9):
            schedule += ["add", "match"]
        mm, state, outs_t, outs_j = self._run_pair(cfg, schedule)
        self._assert_close(outs_t, outs_j)
        # both sides consolidated three times
        assert mm.long_mem.size == 3 * cfg.num_prototypes
        assert int(np.asarray(state.lt_valid).sum()) == 3 * cfg.num_prototypes
        assert mm.work_mem.size // (self.H * self.W_) == int(
            np.asarray(state.work_valid).sum()
        )

    def test_eviction_parity(self):
        """Long-term LRU eviction (remove_obsolete_features): strict
        greater-than survival threshold on normalized usage."""
        cfg = self._cfg(lt_capacity=14)
        # consolidations add 6 protos; at the 3rd, long size 12 >= 14-6=8
        # -> eviction to 8 first (ties dropped), then +6
        schedule = []
        for i in range(13):
            schedule += ["add", "match"]
        mm, state, outs_t, outs_j = self._run_pair(cfg, schedule)
        self._assert_close(outs_t, outs_j)
        assert mm.long_mem.size == int(np.asarray(state.lt_valid).sum())
        assert mm.long_mem.size <= cfg.lt_capacity
