"""Golden gate for the DeepRemaster DRIVER flow: ``remaster_propagate``
against a transcription of the reference RemasterColorizer
(remaster_render.py:232-330 process_frames + the sliding ref buffer),
with the reference torch NetworkC and seeded weights.

Driver conventions pinned: frame input = cv2 RGB2GRAY / 255 (NOT LAB L),
references = plain RGB [0,1] tensors, windows of ``length`` frames,
output joined as LAB (gray*100, clip(ab01*255-128, -100, 100)) through
skimage-style lab2rgb (remaster_utils.convertLAB2RGB).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cv2

torch = pytest.importorskip("torch")

from _ref_loader import load_ref_module, state_dict_numpy
from havc_tpu import metrics
from havc_tpu.models import convert
from havc_tpu.models import remaster as rm

H, W = 64, 96
T = 8
S = 4  # ref buffer slots
LENGTH = 2


@pytest.fixture(scope="module")
def torch_net():
    mod = load_ref_module("vsdeoldify.remaster.model.remasternet")
    torch.manual_seed(0)
    net = mod.NetworkC().eval()
    return net


@pytest.fixture(scope="module")
def flax_engine(torch_net):
    from havc_tpu.exemplar import RemasterEngine

    sd = state_dict_numpy(torch_net)
    params = convert.convert_params(sd, convert.remaster_key_map())
    eng = RemasterEngine.__new__(RemasterEngine)
    eng.size = H
    eng.model = rm.NetworkC()
    eng.dtype = jnp.float32
    eng.params = params
    return eng


def _reference_driver(net, frames, refs_list, win_starts):
    """process_frames transcription: per window, L=GRAY/255 stack, refs
    tensor (1, S, 3, H, W), NetworkC forward, LAB join."""
    outs = []
    with torch.no_grad():
        for wi, st in enumerate(range(0, T, LENGTH)):
            chunk = frames[st : st + LENGTH]
            t_in = []
            for f in chunk:
                g = cv2.cvtColor(
                    (f * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY
                ).astype(np.float32) / 255.0
                t_in.append(torch.from_numpy(g)[None])
            t_input = torch.stack(t_in, dim=1)[None]  # (1,1,T,H,W)
            ws = win_starts[wi]
            refs = torch.from_numpy(
                np.stack(refs_list[ws : ws + S]).transpose(0, 3, 1, 2)
            )[None]  # (1,S,3,H,W)
            ab = net(t_input, refs)  # (1,2,T,H,W)
            for i in range(len(chunk)):
                out_l = t_input[0, :, i].numpy().transpose(1, 2, 0)
                out_c = ab[0, :, i].numpy().transpose(1, 2, 0)
                lab = np.concatenate(
                    [out_l * 100.0,
                     np.clip(out_c * 255.0 - 128.0, -100, 100)], axis=-1
                )
                rgb = cv2.cvtColor(lab.astype(np.float32), cv2.COLOR_LAB2RGB)
                outs.append(np.clip(rgb, 0, 1))
    return np.stack(outs)


@pytest.mark.slow
def test_remaster_driver_golden(torch_net, flax_engine):
    from scipy.ndimage import uniform_filter

    from havc_tpu.exemplar import remaster_propagate

    def smooth(shape, seed):
        r = np.random.default_rng(seed)
        return uniform_filter(
            r.standard_normal(shape).astype(np.float32), size=(0, 7, 7, 0)
        )

    frames = np.clip(smooth((T, H, W, 3), 1) * 2 + 0.5, 0, 1)
    frames = frames.mean(axis=-1, keepdims=True).repeat(3, -1)
    refs = np.clip(smooth((6, H, W, 3), 2) * 2 + 0.5, 0, 1)
    ref_pos = np.array([0, 1, 3, 4, 6, 7])

    # reference window starts per forward (ref_buffer_adjust semantics,
    # remaster_render.py:203-231): advance while the current frame passes
    # the past/future split index
    half_idx = max(round(S * 0.5) - 1, 0)
    win_starts = []
    ws = 0
    for st in range(0, T, LENGTH):
        while (ws + S < len(refs)) and (st > ref_pos[ws + half_idx]):
            ws += 1
        win_starts.append(ws)

    ref_out = _reference_driver(torch_net, frames, list(refs), win_starts)
    with jax.default_matmul_precision("highest"):
        got = remaster_propagate(
            flax_engine, frames, refs, length=LENGTH,
            ref_positions=ref_pos, ref_buffer_size=S,
        )
    de = metrics.dE2000(
        (ref_out * 255).astype(np.uint8), (got * 255).astype(np.uint8)
    )
    mean_de = float(np.mean(de))
    assert mean_de <= 1.0, f"mean dE2000 {mean_de:.3f} > 1.0"
    # the sliding window actually moved during the clip
    assert win_starts[-1] > 0
