"""A/B scene-list parity for the edge-based detector on real footage.

The reference edge detector's math (vsscdetect_edge.py:140-262
vs_edge_based_scenedetect + SceneDetectEdges defaults) is transcribed
host-side in numpy/cv2 — VS plugin semantics preserved: GRAY8 BT.709
limited range, unnormalized saturating Kirsch convolution
(std.Convolution divisor 1 because the coefficients sum to zero), sqrt
gamma boost + Gaussian-sigma gradient magnitude for the TCanny role,
MaskedMerge'd offset-frame diff, the multi-threshold decision ladder —
and run against ``scene_detect_edges`` on the reference's own
``samples/sample_bw.mp4``.  The scene LISTS must agree (F1 over cut
positions with +-1 frame tolerance).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import cv2

from havc_tpu.scene.edges import scene_detect_edges

SAMPLE = "/root/reference/samples/sample_bw.mp4"
N_FRAMES = 240
THRESHOLD = 0.035  # HAVC_SceneDetectEdges defaults (__init__.py:3227)
OFFSET = 2
MIN_INT = 20
MULT_THT = 15
THT_WHITE, THT_BLACK = 0.70, 0.10

_KIRSCH_W = [
    [5, 5, 5, -3, 0, -3, -3, -3, -3],
    [5, 5, -3, 5, 0, -3, -3, -3, -3],
    [5, -3, -3, 5, 0, -3, 5, -3, -3],
    [-3, -3, -3, 5, 0, -3, 5, 5, -3],
    [-3, -3, -3, -3, 0, -3, 5, 5, 5],
    [-3, -3, -3, -3, 0, 5, -3, 5, 5],
    [-3, -3, 5, -3, 0, 5, -3, -3, 5],
    [-3, 5, 5, -3, 0, 5, -3, -3, -3],
]


@pytest.fixture(scope="module")
def frames():
    cap = cv2.VideoCapture(SAMPLE)
    assert cap.isOpened(), f"missing sample {SAMPLE}"
    out = []
    for _ in range(N_FRAMES):
        ok, bgr = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        rgb = cv2.resize(rgb, (460, 336), interpolation=cv2.INTER_AREA)
        out.append((rgb / 255.0).astype(np.float32))
    cap.release()
    assert len(out) >= 200
    return np.stack(out)


def _reference_scene_list(frames_f):
    """Host transcription of the reference detector."""
    T, h, w = frames_f.shape[:3]
    # GRAY8 BT.709 limited
    y = (0.2126 * frames_f[..., 0] + 0.7152 * frames_f[..., 1]
         + 0.0722 * frames_f[..., 2])
    gray = y * (219.0 / 255.0) + 16.0 / 255.0

    # edge mask per frame (draft retinex mask)
    masks = np.empty_like(gray)
    for n in range(T):
        g = gray[n]
        kir = np.zeros_like(g)
        for wk in _KIRSCH_W:
            k = np.array(wk, np.float32).reshape(3, 3)
            r = cv2.filter2D(g, -1, k, borderType=cv2.BORDER_REPLICATE)
            kir = np.maximum(kir, np.abs(r))
        kir = np.clip(kir, 0, 1)
        enhanced = np.sqrt(np.clip(g, 0, 1))
        blurred = cv2.GaussianBlur(enhanced, (0, 0), 1.2,
                                   borderType=cv2.BORDER_REPLICATE)
        gx = cv2.Sobel(blurred, cv2.CV_32F, 1, 0, ksize=3,
                       borderType=cv2.BORDER_REPLICATE)
        gy = cv2.Sobel(blurred, cv2.CV_32F, 0, 1, ksize=3,
                       borderType=cv2.BORDER_REPLICATE)
        tc = np.clip(np.hypot(gx, gy), 0, 1)
        masks[n] = np.clip(kir + tc, 0, 1)

    nxt = gray[np.clip(np.arange(T) + OFFSET, 0, T - 1)]
    diff = np.abs(gray - nxt)
    edge_diff = 10.0 * (diff * masks).mean(axis=(1, 2))
    ssim_diff = 4.0 * diff.mean(axis=(1, 2))
    f_luma = gray.mean(axis=(1, 2))
    prev_diff = np.abs(
        gray - gray[np.clip(np.arange(T) - 1, 0, T - 1)]
    ).mean(axis=(1, 2))
    prev_diff[0] = 0.0

    ssim_thr = round(1.75 * THRESHOLD, 5)
    min_dist_small = max(int(MULT_THT * 0.5), 3)
    last_sc = -MIN_INT
    last_status = ""
    cuts = [0]
    for n in range(1, T):
        in_luma = THT_BLACK <= f_luma[n] <= THT_WHITE
        above_tht = edge_diff[n] > THRESHOLD and ssim_diff[n] > ssim_thr
        above_dist_max = (n - last_sc) >= MIN_INT
        above_dist_min = (n - last_sc) >= min_dist_small
        m1 = prev_diff[n] > 0.10
        m2 = edge_diff[n] > THRESHOLD * MULT_THT
        if not in_luma:
            continue
        if m1:
            if ("tht_max" not in last_status) or above_dist_min:
                cuts.append(n)
                last_sc = n
                last_status = "tht_max+edge_max" if m2 else "tht_max"
        elif m2:
            if ("edge_max" not in last_status) or above_dist_min:
                cuts.append(n)
                last_sc = n
                last_status = "edge_max"
        elif above_dist_max and above_tht:
            cuts.append(n)
            last_sc = n
            last_status = "accepted"
    return cuts


def _f1(ref_cuts, got_cuts, tol=1):
    ref = list(ref_cuts)
    got = list(got_cuts)
    tp = 0
    used = set()
    for c in got:
        for r in ref:
            if r not in used and abs(c - r) <= tol:
                tp += 1
                used.add(r)
                break
    prec = tp / max(len(got), 1)
    rec = tp / max(len(ref), 1)
    return 2 * prec * rec / max(prec + rec, 1e-9)


@pytest.mark.slow
def test_edge_detector_scene_list_matches_reference(frames):
    ref_cuts = _reference_scene_list(frames)
    flags = scene_detect_edges(
        frames, threshold=THRESHOLD, sc_diff_offset=OFFSET,
        sc_min_int=MIN_INT, sc_mult_tht=MULT_THT,
        tht_white=THT_WHITE, tht_black=THT_BLACK,
    )
    got_cuts = list(np.nonzero(flags.sc_prev)[0])
    # a real clip must yield real cuts on both sides
    assert len(ref_cuts) >= 3, ref_cuts
    f1 = _f1(ref_cuts, got_cuts)
    assert f1 >= 0.85, (
        f"scene lists diverge: F1={f1:.2f} ref={ref_cuts} got={got_cuts}"
    )
