"""Quality metrics + golden-frame comparison harness.

The reference's QA is a CIEDE2000 benchmark against ground truth on 23 test
images (reference: README.md:217-321, test_images/); the rebuild's fidelity
gate is dE2000 <= 1 against the *reference's own outputs* (BASELINE.md).
This module is that harness: per-image and per-clip dE2000 statistics, plus
PSNR/SSIM helpers for regression tracking.

Usage once reference outputs exist::

    from havc_tpu.metrics import compare_images, compare_dirs
    stats = compare_dirs("out/", "reference_out/")  # matching filenames
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from .ops.colorspace import ciede2000, rgb_to_lab

__all__ = ["dE2000", "psnr", "compare_images", "compare_clip", "compare_dirs"]


def dE2000(img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
    """Per-pixel CIEDE2000 between two RGB [0,1] images."""
    lab1 = rgb_to_lab(jnp.asarray(img1))
    lab2 = rgb_to_lab(jnp.asarray(img2))
    return np.asarray(ciede2000(lab1, lab2))


def psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(img1) - np.asarray(img2)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * float(np.log10(1.0 / mse))


def compare_images(img1: np.ndarray, img2: np.ndarray) -> Dict[str, float]:
    de = dE2000(img1, img2)
    return {
        "dE2000_mean": float(de.mean()),
        "dE2000_p95": float(np.percentile(de, 95)),
        "dE2000_max": float(de.max()),
        "psnr": psnr(img1, img2),
    }


def compare_clip(frames1: np.ndarray, frames2: np.ndarray) -> Dict[str, float]:
    """Frame-for-frame fidelity over (T, H, W, 3) clips."""
    assert frames1.shape == frames2.shape
    de = dE2000(frames1, frames2)
    per_frame = de.reshape(de.shape[0], -1).mean(axis=1)
    return {
        "dE2000_mean": float(de.mean()),
        "dE2000_worst_frame": float(per_frame.max()),
        "dE2000_p95": float(np.percentile(de, 95)),
        "psnr": psnr(frames1, frames2),
        "frames": int(de.shape[0]),
    }


def compare_dirs(dir1: str, dir2: str) -> Dict[str, Dict[str, float]]:
    """Compare matching image filenames across two directories."""
    from .io import read_image

    out = {}
    for name in sorted(os.listdir(dir1)):
        p1, p2 = os.path.join(dir1, name), os.path.join(dir2, name)
        if os.path.isfile(p1) and os.path.isfile(p2):
            a, b = read_image(p1), read_image(p2)
            if a.shape == b.shape:
                out[name] = compare_images(a, b)
    if out:
        out["__summary__"] = {
            "dE2000_mean": float(
                np.mean([v["dE2000_mean"] for k, v in out.items() if k != "__summary__"])
            ),
            "images": len(out),
        }
    return out
