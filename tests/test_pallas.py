"""Pallas fused post-chain kernel vs its jnp oracle."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from havc_tpu.ops import pallas_kernels as pk


KW = dict(cmap_ranges=((180.0, 280.0),), cmap_hue_shift=140.0, cmap_weight=0.1)


def test_reference_matches_filter_composition():
    """The shared pixel program == the ops/filters composition."""
    from havc_tpu.filters import chroma_bright_tweak, dark_tweak

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 64, 3), dtype=np.float32))
    ours = np.asarray(
        pk.post_chain_reference(
            x, dark_thr=0.1, dark_white=0.3, dark_sat=0.3, dark_bright=-0.8,
            sm_black=0.3, sm_white=0.7, sm_sat=0.9, sm_bright=0.0,
        )
    )
    # equivalent filters-chain (dark_tweak with amount 0.8 derives the same
    # constants: sat=max(1.1-0.8,..)=0.3, bright=-0.8, white limit 0.3)
    ref = np.asarray(
        chroma_bright_tweak(
            dark_tweak(x, dark_threshold=0.3, dark_amount=0.8),
            black_threshold=0.3, white_threshold=0.7, dark_sat=0.9,
            dark_bright=0.0,
        )
    )
    assert np.abs(ours - ref).max() < 5e-3


def test_pallas_matches_oracle():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 64, 128, 3), dtype=np.float32))
    ref = np.asarray(pk.post_chain_reference(x, **KW))
    out = np.asarray(pk.post_chain_pallas(x, **KW))
    tol = 0.0 if pk.pallas_available() else 1e-6
    assert np.abs(out - ref).max() <= tol + 1e-6


def test_pallas_odd_sizes():
    rng = np.random.default_rng(2)
    # sizes not multiples of 8/128: tile fallback path
    x = jnp.asarray(rng.random((1, 30, 50, 3), dtype=np.float32))
    ref = np.asarray(pk.post_chain_reference(x, **KW))
    out = np.asarray(pk.post_chain_pallas(x, **KW))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-5


def test_no_colormap_branch():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 32, 128, 3), dtype=np.float32))
    ref = np.asarray(pk.post_chain_reference(x))
    out = np.asarray(pk.post_chain_pallas(x))
    assert np.abs(out - ref).max() < 1e-6


class TestLocalWindowAttention:
    """ops/pallas_attn: VMEM-resident window attention == unfold oracle."""

    def test_kernel_matches_unfold(self):
        from havc_tpu.ops.pallas_attn import (
            local_window_attention, local_window_attention_reference)

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((2, 6, 9, 16)).astype(np.float32) * 0.3)
        k = jnp.asarray(rng.standard_normal((2, 6, 9, 16)).astype(np.float32) * 0.3)
        v = jnp.asarray(rng.standard_normal((2, 6, 9, 32)).astype(np.float32) * 0.3)
        rel = jnp.asarray(rng.standard_normal((2, 6, 9, 225)).astype(np.float32) * 0.1)
        ref = np.asarray(local_window_attention_reference(q, k, v, rel))
        got = np.asarray(local_window_attention(q, k, v, rel, interpret=True))
        assert np.abs(ref - got).max() < 1e-4

    def test_module_pallas_path_matches_unfold(self):
        """LocalAttention(use_pallas=True, interpret via CPU) == the unfold
        path with the same params."""
        import jax
        from havc_tpu.models.colormnet import LocalAttention
        from havc_tpu.ops import pallas_attn

        if jax.default_backend() != "tpu":
            # route the pallas branch through the interpreter on CPU
            orig = pallas_attn.local_window_attention

            def interp(*a, **kw):
                kw["interpret"] = True
                return orig(*a, **kw)

            pallas_attn.local_window_attention = interp
        try:
            rng = np.random.default_rng(1)
            q = jnp.asarray(rng.standard_normal((1, 6, 9, 16)).astype(np.float32) * 0.3)
            k = jnp.asarray(rng.standard_normal((1, 6, 9, 16)).astype(np.float32) * 0.3)
            v = jnp.asarray(rng.standard_normal((1, 6, 9, 32)).astype(np.float32) * 0.3)
            m_ref = LocalAttention(d_qk=16, d_vu=32, use_pallas=False)
            params = m_ref.init(jax.random.PRNGKey(0), q, k, v)
            ref = np.asarray(m_ref.apply(params, q, k, v))
            m_pal = LocalAttention(d_qk=16, d_vu=32, use_pallas=True)
            got = np.asarray(m_pal.apply(params, q, k, v))
            assert np.abs(ref - got).max() < 1e-4
        finally:
            if jax.default_backend() != "tpu":
                pallas_attn.local_window_attention = orig
