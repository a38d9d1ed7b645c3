"""Shared benchmark-image lists for the golden fidelity gates.

The reference's published QA methodology covers 23 B&W test photos
(reference README.md:243-268, test_images/Image_01..23_test.jpg) plus the
set-#2 variants (README.md:294-319, test_images_ex/Image_NN_test_ex.jpg).
Round-4 verdict: the gates sampled 8 of 23 — the full set closes the
sampling argument, so every golden gate now iterates ALL_IMAGES.
"""
import os

_DIR = "/root/reference/test_images"
_DIR_EX = "/root/reference/test_images_ex"

ALL_IMAGES = [
    os.path.join(_DIR, f"Image_{i:02d}_test.jpg") for i in range(1, 24)
]
ALL_IMAGES_EX = [
    os.path.join(_DIR_EX, f"Image_{i:02d}_test_ex.jpg") for i in range(1, 24)
]
