"""DeepRemaster NetworkC conversion parity vs the reference torch module
(remaster/model/remasternet.py:103-187)."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from _ref_loader import load_ref_module, state_dict_numpy
from havc_tpu.models import remaster as rm
from havc_tpu.models import convert


@pytest.fixture(scope="module")
def ref_net():
    return load_ref_module("vsdeoldify.remaster.model.remasternet")


def _assert_close(ref, got, tol=1e-3, name=""):
    ref, got = np.asarray(ref), np.asarray(got)
    assert ref.shape == got.shape, f"{name}: {ref.shape} vs {got.shape}"
    scale = max(np.abs(ref).max(), 1e-3)
    err = np.abs(ref - got).max() / scale
    assert err < tol, f"{name}: rel err {err:.2e}"


def test_networkc_parity(ref_net):
    torch.manual_seed(0)
    tm = ref_net.NetworkC().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.add_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.mul_(torch.rand_like(m.running_var) * 0.5 + 0.75)
            # zero-init gammas make the attention blocks no-ops; give them
            # real values so the attention path is exercised
            if isinstance(m, ref_net.SourceReferenceAttention):
                m.gamma.add_(0.5)

    sd = state_dict_numpy(tm)
    params = convert.convert_params(sd, convert.remaster_key_map())

    # full coverage: every checkpoint tensor consumed
    consumed = set()
    for prefix, (path, kind) in convert.remaster_key_map().items():
        for suffix in convert._KIND_RULES[kind]:
            consumed.add(f"{prefix}.{suffix}")
    leftovers = [k for k in sd if k not in consumed
                 and not k.endswith("num_batches_tracked")]
    assert leftovers == [], leftovers[:10]

    rng = np.random.default_rng(0)
    T, R, H, W = 2, 2, 32, 32
    luma = rng.random((1, T, H, W, 1), dtype=np.float32)
    refs = rng.random((1, R, H, W, 3), dtype=np.float32)

    with torch.no_grad():
        x_t = torch.from_numpy(np.transpose(luma, (0, 4, 1, 2, 3)).copy())
        # the torch driver passes refs as [B, T, C, H, W]; forward
        # transposes to [B, C, T, H, W] (remasternet.py:168)
        r_t = torch.from_numpy(np.transpose(refs, (0, 1, 4, 2, 3)).copy())
        ref_out = tm(x_t, r_t).numpy()  # (1, 2, T, H, W)

    model = rm.NetworkC()
    with jax.default_matmul_precision("highest"):
        got = model.apply(params, jnp.asarray(luma), jnp.asarray(refs))
    ref_nhwc = np.transpose(ref_out, (0, 2, 3, 4, 1))
    _assert_close(ref_nhwc, got, tol=2e-3, name="ab01")


def test_networkc_gamma_in_map(ref_net):
    """SourceReferenceAttention gammas must be converted (they gate the
    whole attention contribution)."""
    km = convert.remaster_key_map()
    for name in ("stattn1", "stattn2", "selfattn1", "selfattn2"):
        assert any(
            k.startswith(name) and v[1] == "gamma_bare"
            for k, v in km.items()
        ) or any(
            k == name and v[1] == "gamma_bare" for k, v in km.items()
        ), f"{name}.gamma missing from remaster_key_map"
