"""Scene-change detection.

TPU-native rebuild of the reference's detector stack (reference:
vsdeoldify/vsslib/vsscdect.py:44-495): GRAY8 downscale -> ``misc.SCDetect``
(luma-diff) or the custom adaptive-ratio detector, with luma gates,
frequency forcing, minimum scene length, and an optional second-pass
SSIM + histogram-Hellinger filter.

Split for TPU:

* **Device phase** (:func:`frame_stats`): one jitted batch computes per-frame
  downscaled gray frames, mean luma, mean-abs-diff vs the ``offset``-th
  previous frame (the PlaneStatsDiff analog), and 256-bin histograms.  All
  MXU/VPU work, no sequential state.
* **Host phase** (:class:`SceneDetector`): the sequential accept/reject
  state machine (adaptive ratio vs last accepted frame, luma gates,
  frequency override, SSIM/hist confirmation against the *last accepted*
  reference — inherently data-dependent, cheap at the working resolution).

Outputs a :class:`SceneFlags` (plain numpy arrays) that plays the role of
the reference's ``_SceneChangePrev/_SceneChangeNext/sc_luma/sc_ratio``
frame props.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.colorspace import luma
from ..ops.resize import resize

__all__ = ["SceneFlags", "SceneDetector", "StreamSceneDetector",
           "scene_detect", "frame_stats"]

# Reference constants (vsslib/constants.py).
DEF_THRESHOLD = 0.10
DEF_THT_WHITE = 0.70
DEF_THT_BLACK = 0.10
DEF_THT_BLACK_MIN = 0.19
DEF_THT_WHITE_MIN = 0.70
DEF_THT_BLACK_FREQ = 0.14
DEF_ADAPTIVE_RATIO_LO = 1.02
DEF_ADAPTIVE_RATIO_MED = 1.12
DEF_ADAPTIVE_RATIO_RF = 2.0
DEF_ADAPTIVE_RATIO_VHI = 15.0
DEF_SSIM_SCORE_EQUAL = 0.69
DEF_HIST_SCORE_EQUAL = 0.70
DEF_HIST_SCORE_HIGH = 0.95
DEF_SC_MIN_DISTANCE = 15
DEF_MAX_RESIZE_W = 512
DEF_MAX_RESIZE_H = 480


@dataclass
class SceneFlags:
    """Per-frame scene metadata (the frame-prop bus of the reference)."""

    sc_prev: np.ndarray  # 1 where a new scene starts ("_SceneChangePrev")
    sc_next: np.ndarray  # "_SceneChangeNext" (ref-frame-ext marker)
    luma: np.ndarray  # mean luma per frame ("sc_luma")
    ratio: np.ndarray  # adaptive ratio per frame ("sc_ratio")
    threshold: float = DEF_THRESHOLD  # "sc_threshold"
    frequency: int = 0  # "sc_frequency"

    def __len__(self):
        return len(self.sc_prev)

    @classmethod
    def every(cls, n: int, freq: int = 1, threshold: float = 0.0):
        """Frequency-only flags (SceneDetect with threshold=0)."""
        sc = np.zeros(n, dtype=np.int8)
        if freq >= 1:
            sc[::freq] = 1
        if n:
            sc[0] = 1
        return cls(
            sc_prev=sc,
            sc_next=np.zeros(n, dtype=np.int8),
            luma=np.full(n, 0.5, dtype=np.float32),
            ratio=np.zeros(n, dtype=np.float32),
            threshold=threshold,
            frequency=freq,
        )

    @classmethod
    def from_frame_list(cls, n: int, frames, ref_frame_ext: bool = True):
        """Flags from an explicit reference-frame list
        (vsscdect.SceneDetectFromDir)."""
        sc = np.zeros(n, dtype=np.int8)
        nxt = np.zeros(n, dtype=np.int8)
        for i in frames:
            if 0 <= i < n:
                sc[i] = 1
                if ref_frame_ext:
                    nxt[i] = 1
        return cls(sc, nxt, np.full(n, 0.5, np.float32), np.zeros(n, np.float32))


def _work_size(h: int, w: int) -> tuple:
    """Downscale target <= (480, 512) with even dims
    (vsresize.resize_min_HW defaults)."""
    scale = min(DEF_MAX_RESIZE_H / h, DEF_MAX_RESIZE_W / w, 1.0)
    nh, nw = int(h * scale) & ~1, int(w * scale) & ~1
    return max(nh, 2), max(nw, 2)


@jax.jit
def _stats_kernel(gray_small: jnp.ndarray, offset: jnp.ndarray):
    """luma means, abs-diff vs offset-lagged frame, histograms."""
    T = gray_small.shape[0]
    lumas = jnp.mean(gray_small, axis=(-2, -1))
    idx = jnp.clip(jnp.arange(T) - offset, 0, T - 1)
    prev = gray_small[idx]
    diffs = jnp.mean(jnp.abs(gray_small - prev), axis=(-2, -1))
    bins = jnp.clip((gray_small * 255.0).astype(jnp.int32), 0, 255)
    onehot = jax.nn.one_hot(bins.reshape(T, -1), 256, dtype=jnp.float32)
    hists = onehot.sum(axis=1)
    hists = hists / jnp.maximum(
        jnp.linalg.norm(hists, axis=-1, keepdims=True), 1e-6
    )  # cv2.normalize default NORM_L2
    return lumas, diffs, hists


def _normalize_luma(gray: jnp.ndarray, tht_black: float = 0.19,
                    tht_white: float = 0.70) -> jnp.ndarray:
    """Per-frame min-max luma stretch, gated to mid-luma frames
    (sc_normalize -> vsscdect.sc_clip_normalize:90 + vsutils
    frame_normalize:304; gate constants DEF_THT_BLACK/WHITE_MIN,
    constants.py:43-44)."""
    mean = gray.mean(axis=(-2, -1), keepdims=True)
    lo = gray.min(axis=(-2, -1), keepdims=True)
    hi = gray.max(axis=(-2, -1), keepdims=True)
    stretched = (gray - lo) / jnp.maximum(hi - lo, 1e-6)
    gate = (mean > tht_black) & (mean < tht_white)
    return jnp.where(gate, stretched, gray)


def _gray_maps(frames, normalize: bool = False) -> jnp.ndarray:
    """RGB frames -> downscaled (optionally normalized) gray maps, the
    shared device front of :func:`frame_stats` and the streaming
    detector."""
    x = jnp.asarray(frames)
    gray = luma(x)
    h, w = gray.shape[-2], gray.shape[-1]
    nh, nw = _work_size(h, w)
    gray_small = resize(gray[..., None], nh, nw, "bicubic")[..., 0]
    if normalize:
        gray_small = _normalize_luma(gray_small)
    return gray_small


def frame_stats(frames: np.ndarray, offset: int = 1, normalize: bool = False,
                need_maps: bool = True):
    """Device phase: returns (gray_small[T,h,w], luma[T], diff[T], hist[T,256]).

    ``frames``: (T, H, W, 3) RGB [0,1] (numpy or jnp — device arrays are
    reduced on the accelerator; only the outputs transfer to host).
    ``need_maps=False`` skips the gray-map/histogram transfers (they are
    only consumed by the SSIM/Hellinger second pass) and returns ``None``
    in their slots — per-frame scalars are the whole download then.
    """
    gray_small = _gray_maps(frames, normalize)
    lumas, diffs, hists = _stats_kernel(gray_small, jnp.asarray(offset))
    if not need_maps:
        return None, np.asarray(lumas), np.asarray(diffs), None
    return (
        np.asarray(gray_small),
        np.asarray(lumas),
        np.asarray(diffs),
        np.asarray(hists),
    )


def _ssim_uniform(a: np.ndarray, b: np.ndarray, win: int = 7) -> float:
    """Mean SSIM with a uniform window (skimage structural_similarity
    defaults: win_size=7, uniform weights, K1=.01 K2=.03, data_range=1)."""
    from scipy.ndimage import uniform_filter

    a = a.astype(np.float64)
    b = b.astype(np.float64)
    K1, K2, L = 0.01, 0.03, 1.0
    C1, C2 = (K1 * L) ** 2, (K2 * L) ** 2
    mu_a = uniform_filter(a, win)
    mu_b = uniform_filter(b, win)
    mu_aa = uniform_filter(a * a, win)
    mu_bb = uniform_filter(b * b, win)
    mu_ab = uniform_filter(a * b, win)
    n = win**2
    cov_norm = n / (n - 1)
    va = cov_norm * (mu_aa - mu_a * mu_a)
    vb = cov_norm * (mu_bb - mu_b * mu_b)
    vab = cov_norm * (mu_ab - mu_a * mu_b)
    ssim_map = ((2 * mu_a * mu_b + C1) * (2 * vab + C2)) / (
        (mu_a**2 + mu_b**2 + C1) * (va + vb + C2)
    )
    pad = (win - 1) // 2
    return float(ssim_map[pad:-pad, pad:-pad].mean())


def _hellinger(h1: np.ndarray, h2: np.ndarray) -> float:
    """cv2.HISTCMP_HELLINGER on L2-normalized histograms."""
    h1 = h1.astype(np.float64)
    h2 = h2.astype(np.float64)
    m1, m2 = h1.mean(), h2.mean()
    n = len(h1)
    denom = np.sqrt(m1 * m2) * n
    if denom <= 0:
        return 1.0
    bc = np.sum(np.sqrt(np.maximum(h1 * h2, 0.0))) / denom
    return float(np.sqrt(max(1.0 - bc, 0.0)))


@dataclass
class SceneDetector:
    """Host state machine mirroring vsscdect.SceneDetection."""

    threshold: float = DEF_THRESHOLD
    frequency: int = 0
    sc_tht_filter: float = 0.0
    min_length: int = 1
    tht_white: float = DEF_THT_WHITE
    tht_black: float = DEF_THT_BLACK
    tht_offset: int = 1
    normalize: bool = False
    adaptive_ratio: float = field(default=0.0)
    debug: bool = False

    def __post_init__(self):
        if self.adaptive_ratio == 0.0:
            self.adaptive_ratio = (
                DEF_ADAPTIVE_RATIO_MED if self.frequency > 0 else DEF_ADAPTIVE_RATIO_LO
            )
        # per-frame decision records (reference sc_debug prints,
        # vsscdect.py:406-479): dicts with frame/prev/ssim/hist/luma/reason
        self.debug_records: list = []

    def _record(self, state, n, prev, ssim, hist, luma, reason):
        if self.debug:
            self.debug_records.append({
                "state": state, "frame": int(n),
                "prev": -1 if prev is None else int(prev),
                "ssim": ssim, "hist": hist,
                "luma": round(float(luma), 4), "reason": int(reason),
            })

    # -- first pass: adaptive-ratio custom detector (vsscdect.py:281-342) --
    def _custom_pass(self, lumas, diffs, min_length, n0: int = 0,
                     state: Optional[tuple] = None) -> tuple:
        """``n0``/``state`` make the sequential loop RESUMABLE for the
        streaming detector: ``state`` is the ``(prev_diff, last_ref,
        ref_luma)`` carry at global frame ``n0`` (frame indices in the
        carry are global).  Returns ``(sc, ratios, state)``."""
        T = len(lumas)
        sc = np.zeros(T, dtype=np.int8)
        ratios = np.zeros(T, dtype=np.float32)
        prev_diff, last_ref, ref_luma = state or (0.0, None, 0.0)
        for i in range(T):
            n = n0 + i
            f_luma = round(float(lumas[i]), 4)
            f_bright = DEF_THT_BLACK_MIN <= f_luma <= DEF_THT_WHITE_MIN
            n_diff = round(max(float(diffs[i]), 0.0001), 5)
            if n == 0 or last_ref is None:
                is_sc = True
                prev_diff = n_diff
                ref_luma = f_luma
                last_ref = n
                ratio = 0.0
            elif n - last_ref < min_length:
                ratio = round(n_diff / prev_diff, 4)
                is_sc = False
            else:
                ratio = round(n_diff / prev_diff, 4)
                is_sc = ratio > self.adaptive_ratio and n_diff > self.threshold
                prev_diff = n_diff
                if self.frequency > 1:
                    is_sc = is_sc or (n % self.frequency == 0)
                is_sc = is_sc or (ratio > DEF_ADAPTIVE_RATIO_RF and f_bright)
                is_sc = is_sc or ratio > DEF_ADAPTIVE_RATIO_VHI
                is_sc = is_sc or (ref_luma < DEF_THT_BLACK_MIN and f_bright)
                is_sc = is_sc and self.tht_black < f_luma < self.tht_white
            ratios[i] = ratio
            if is_sc:
                last_ref = n
                ref_luma = f_luma
                sc[i] = 1
        return sc, ratios, (prev_diff, last_ref, ref_luma)

    # -- first pass: plain threshold detector + black/white filter
    #    (misc.SCDetect analog + vsscdect.filter_black_white) --
    def _simple_pass(self, lumas, diffs, n0: int = 0) -> tuple:
        """Stateless given the global offset ``n0`` (streaming chunks)."""
        T = len(lumas)
        sc = np.zeros(T, dtype=np.int8)
        ratios = np.zeros(T, dtype=np.float32)
        for i in range(T):
            n = n0 + i
            f_luma = round(float(lumas[i]), 4)
            is_sc = n == 0 or float(diffs[i]) > self.threshold
            if self.frequency > 1:
                is_sc = is_sc or (n % self.frequency == 0)
            if n == 0:
                sc[i] = 1
            elif is_sc and self.tht_black < f_luma < self.tht_white:
                sc[i] = 1
        return sc, ratios

    # -- second pass: SSIM + histogram confirmation (vsscdect.py:352-495) --
    def _filter_pass(self, sc, lumas, ratios, grays, hists, min_length,
                     n0: int = 0, state: Optional[tuple] = None):
        """``n0``/``state`` make the confirmation loop RESUMABLE: the
        state is ``(last_index, prev_y, prev_hist, prev_luma)`` — the
        last ACCEPTED reference's global index, gray map, histogram and
        luma.  Returns ``(out, state)``."""
        T = len(sc)
        out = np.zeros(T, dtype=np.int8)
        last_index, prev_y, prev_hist, prev_luma = (
            state or (None, None, None, 0.0))
        tht_ssim = self.sc_tht_filter
        for i in range(T):
            n = n0 + i
            luma_n = float(lumas[i])
            is_sc = sc[i] == 1 or n == 0
            if is_sc and last_index is None:
                out[i] = 1
                self._record("New", n, last_index, -1, -1, luma_n, 1)
                last_index = n
                prev_y = grays[i]
                prev_hist = hists[i]
                prev_luma = luma_n
                continue
            if not is_sc:
                continue
            sc_reason = 0
            if n > 0 and (n - last_index) < min_length:
                if min_length > 1 and n > 1 and prev_luma >= DEF_THT_BLACK_MIN > luma_n:
                    self._record("Skip", n, last_index, -1, -1, luma_n, -1)
                    continue
                sc_reason = 4
            ssim_score = hist_score = 1
            if tht_ssim == 1:
                scene_change = self.tht_black < luma_n < self.tht_white
                sc_reason = (sc_reason + 1) if scene_change else 0
            else:
                ssim_score = round(_ssim_uniform(grays[i], prev_y), 4)
                hist_score = round(1.0 - _hellinger(prev_hist, hists[i]), 4)
                if ssim_score < tht_ssim and hist_score < DEF_HIST_SCORE_HIGH:
                    scene_change = self.tht_black < luma_n < self.tht_white
                    if scene_change and sc_reason == 0 and self.frequency > 1:
                        scene_change = not (
                            luma_n < DEF_THT_BLACK_FREQ
                            and ratios[i] < DEF_ADAPTIVE_RATIO_RF
                        )
                    sc_reason = (sc_reason + 1) if scene_change else 0
                elif (
                    ssim_score >= DEF_SSIM_SCORE_EQUAL
                    and prev_luma < DEF_THT_BLACK_MIN <= luma_n
                ):
                    scene_change = self.tht_black < luma_n < self.tht_white
                    sc_reason = (sc_reason + 2) if scene_change else 0
                elif (
                    ssim_score >= DEF_SSIM_SCORE_EQUAL
                    and hist_score < DEF_HIST_SCORE_EQUAL
                ):
                    scene_change = DEF_THT_BLACK_MIN < luma_n < DEF_THT_WHITE_MIN
                    sc_reason = (sc_reason + 3) if scene_change else 0
                else:
                    scene_change = False
                    sc_reason = 0
            if scene_change:
                out[i] = 1
                self._record("New", n, last_index, ssim_score, hist_score,
                             luma_n, sc_reason)
                last_index = n
                prev_y = grays[i]
                prev_hist = hists[i]
                prev_luma = luma_n
            else:
                self._record("Skip", n, last_index, ssim_score, hist_score,
                             luma_n, sc_reason)
        return out, (last_index, prev_y, prev_hist, prev_luma)

    def detect(self, frames: np.ndarray) -> SceneFlags:
        T = len(frames)
        if self.threshold == 0 and self.frequency == 0:
            return SceneFlags.every(T, freq=0, threshold=0.0)
        if self.frequency == 1 or (self.threshold == 0 and self.frequency > 1):
            return SceneFlags.every(T, freq=max(self.frequency, 1))

        t_offset = min(max(self.tht_offset, 1), 25)
        m_length = min(max(self.min_length, 1), 25)
        need_maps = 0.0 < self.sc_tht_filter < 1.0 or m_length > 1
        grays, lumas, diffs, hists = frame_stats(
            frames, t_offset, normalize=self.normalize, need_maps=need_maps)

        use_custom = (
            self.sc_tht_filter > 0.0 or self.threshold < 0.10 or t_offset > 1
        )
        if use_custom:
            if 0.0 < self.sc_tht_filter < 1.0 or m_length > 1:
                sc, ratios, _ = self._custom_pass(lumas, diffs, m_length)
            else:
                sc, ratios, _ = self._custom_pass(lumas, diffs,
                                                  DEF_SC_MIN_DISTANCE)
        else:
            sc, ratios = self._simple_pass(lumas, diffs)

        if 0.0 < self.sc_tht_filter < 1.0 or m_length > 1:
            sc, _ = self._filter_pass(sc, lumas, ratios, grays, hists,
                                      m_length)

        return SceneFlags(
            sc_prev=sc,
            sc_next=np.zeros(T, dtype=np.int8),
            luma=lumas.astype(np.float32),
            ratio=ratios,
            threshold=self.threshold,
            frequency=self.frequency,
        )


def scene_detect(
    frames: np.ndarray,
    threshold: float = DEF_THRESHOLD,
    frequency: int = 0,
    sc_tht_filter: float = 0.0,
    min_length: int = 1,
    tht_white: float = DEF_THT_WHITE,
    tht_black: float = DEF_THT_BLACK,
    tht_offset: int = 1,
    normalize: bool = False,
    debug: bool = False,
) -> SceneFlags:
    """Functional front-end mirroring vsscdect.SceneDetect's signature.
    ``debug=True`` logs each New/Skip decision with SSIM/hist/luma/reason
    like the reference's sc_debug prints (vsscdect.py:406-479)."""
    det = SceneDetector(
        threshold=threshold,
        frequency=frequency,
        sc_tht_filter=sc_tht_filter,
        min_length=min_length,
        tht_white=tht_white,
        tht_black=tht_black,
        tht_offset=tht_offset,
        normalize=normalize,
        debug=debug,
    )
    flags = det.detect(frames)
    if debug:
        from ..utils.log import HAVC_LogMessage, MessageType

        for r in det.debug_records:
            HAVC_LogMessage(
                MessageType.WARNING,
                f"SC=[{r['state']}], Frame_n= ", r["frame"],
                ", PrvFrame= ", r["prev"], ", SSIM= ", r["ssim"],
                ", Hist= ", r["hist"], ", Luma= ", r["luma"],
                ", ScReason= ", r["reason"],
            )
    return flags


class StreamSceneDetector:
    """RESUMABLE SceneDetector: feed frames chunk by chunk and get the
    exact flags ``SceneDetector.detect`` would produce on the
    concatenation — the full vsscdect semantics (adaptive ratio, luma
    gates, frequency forcing, SSIM/Hellinger confirmation) for
    feature-length streams in O(chunk) memory.

    Carries across chunks: the ``tht_offset`` lag window of gray maps
    (device-resident), the adaptive-ratio state ``(prev_diff, last_ref,
    ref_luma)``, and the confirmation state (last ACCEPTED reference's
    gray map / histogram / luma).  The device stats phase runs once per
    chunk."""

    def __init__(self, threshold: float = DEF_THRESHOLD, frequency: int = 0,
                 sc_tht_filter: float = 0.0, min_length: int = 1,
                 tht_white: float = DEF_THT_WHITE,
                 tht_black: float = DEF_THT_BLACK, tht_offset: int = 1,
                 normalize: bool = False, debug: bool = False):
        self.det = SceneDetector(
            threshold=threshold, frequency=frequency,
            sc_tht_filter=sc_tht_filter, min_length=min_length,
            tht_white=tht_white, tht_black=tht_black,
            tht_offset=tht_offset, normalize=normalize, debug=debug,
        )
        # same clamps as SceneDetector.detect
        self.t_offset = min(max(tht_offset, 1), 25)
        self.m_length = min(max(min_length, 1), 25)
        self.need_maps = 0.0 < sc_tht_filter < 1.0 or self.m_length > 1
        self.use_custom = (
            sc_tht_filter > 0.0 or threshold < 0.10 or self.t_offset > 1
        )
        self.n0 = 0  # global index of the next fed frame
        self._tail = None  # last min(n0, t_offset) gray maps (device)
        self._custom_state = None
        self._filter_state = None

    def feed(self, frames) -> np.ndarray:
        """Detect over the next chunk; returns (t,) int8 flags."""
        det = self.det
        T = len(frames)
        n0 = self.n0
        self.n0 += T
        # trivial modes (SceneDetector.detect head), at global indices
        if det.threshold == 0 and det.frequency == 0:
            sc = np.zeros(T, dtype=np.int8)
            if n0 == 0 and T:
                sc[0] = 1
            return sc
        if det.frequency == 1 or (det.threshold == 0 and det.frequency > 1):
            freq = max(det.frequency, 1)
            sc = ((np.arange(n0, n0 + T) % freq) == 0).astype(np.int8)
            if n0 == 0 and T:
                sc[0] = 1
            return sc

        gray_small = _gray_maps(frames, det.normalize)
        k = 0
        if self._tail is not None:
            # prepend the lag window so diffs[i] compares against the
            # right GLOBAL frame; clip-to-0 at the true clip start is
            # reproduced because the tail is only min(n0, offset) deep
            k = int(self._tail.shape[0])
            gray_small = jnp.concatenate([self._tail, gray_small], axis=0)
        lumas_d, diffs_d, hists_d = _stats_kernel(
            gray_small, jnp.asarray(self.t_offset))
        lumas = np.asarray(lumas_d)[k:]
        diffs = np.asarray(diffs_d)[k:]
        keep = min(self.t_offset, int(gray_small.shape[0]))
        self._tail = gray_small[-keep:]

        if self.use_custom:
            ml = self.m_length if self.need_maps else DEF_SC_MIN_DISTANCE
            sc, ratios, self._custom_state = det._custom_pass(
                lumas, diffs, ml, n0=n0, state=self._custom_state)
        else:
            sc, ratios = det._simple_pass(lumas, diffs, n0=n0)
        if self.need_maps:
            grays = np.asarray(gray_small)[k:]
            hists = np.asarray(hists_d)[k:]
            sc, self._filter_state = det._filter_pass(
                sc, lumas, ratios, grays, hists, self.m_length,
                n0=n0, state=self._filter_state)
        return sc
